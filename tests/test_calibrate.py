"""Calibration: alpha/beta estimation sanity and statistical behavior."""
import numpy as np
import pytest

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, channel_llrs, get_code
from qldpc_tpu.ops import calibrate


@pytest.fixture(scope="module")
def setup72():
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.01)
    H = M["HdecZ"]
    llrs = channel_llrs(M["channel_probsZ"])
    return H, llrs


def test_alvarado_alpha_in_physical_range(setup72):
    H, llrs = setup72
    alpha, r2 = calibrate.estimate_alpha_alvarado(H, 0.01, trials=400,
                                                  llrs=llrs)
    # normalized min-sum alphas are attenuation factors; the fit should land
    # in (0, 1.5) with a meaningful linear quality
    assert 0.05 < alpha < 1.5
    assert r2 > 0.5


def test_autoregressive_sequence(setup72):
    H, llrs = setup72
    seq, r2s = calibrate.estimate_alpha_alvarado_autoregressive(
        H, 0.01, maxIter=3, trials=200, llrs=llrs)
    assert seq.shape == (3,) and r2s.shape == (3,)
    assert np.all(seq > 0) and np.all(seq < 2.0)


def test_alpha_gate_fallback_rules():
    """The fit gate substitutes the dynamical value for untrustworthy fits:
    low R^2, out-of-range alpha, or NaN (failed fit)."""
    from qldpc_tpu.ops.calibrate import _dynamical_alpha, _gate_alpha
    good, fb = _gate_alpha(0.8, 0.95, 3, 0.85, (0.05, 1.5))
    assert good == 0.8 and not fb
    for bad in [(0.8, 0.5), (3.0, 0.99), (-0.2, 0.99), (np.nan, np.nan),
                (0.8, np.nan)]:
        a, fb = _gate_alpha(bad[0], bad[1], 3, 0.85, (0.05, 1.5))
        assert fb and a == _dynamical_alpha(3) == 1.0 - 2.0 ** -4


def test_autoregressive_gate_engages_on_noisy_fit(setup72):
    """With starvation-level trials the sequence must stay inside the gate
    range by construction (fallbacks engage rather than shipping junk)."""
    import jax
    H, llrs = setup72
    seq, r2s = calibrate.estimate_alpha_alvarado_autoregressive(
        H, 0.01, maxIter=4, trials=8, llrs=llrs, key=jax.random.key(3))
    assert np.all(seq >= 0.05) and np.all(seq <= 1.5)


def test_scopt_beta_negative(setup72):
    """Posterior LLRs are large-positive for non-errors and negative for
    errors, so log(f1/f0) decreases in x: beta < 0 as in the reference's
    convention (scopt.py:148-155 fits log(f1/f0) = beta * x)."""
    H, llrs = setup72
    beta, r2 = calibrate.estimate_scopt_beta(H, 0.01, trials=300,
                                             maxIter=8, llrs=llrs)
    assert beta < 0
    assert np.isfinite(r2)


def test_invalid_error_rate(setup72):
    H, llrs = setup72
    with pytest.raises(ValueError):
        calibrate.estimate_alpha_alvarado(H, 0.7, llrs=llrs)
    with pytest.raises(ValueError):
        calibrate.estimate_alpha_alvarado_autoregressive(H, 0.01, maxIter=0,
                                                         llrs=llrs)


def test_plot_output(tmp_path, setup72):
    H, llrs = setup72
    path = str(tmp_path / "fit.png")
    calibrate.estimate_alpha_alvarado(H, 0.01, trials=200, llrs=llrs,
                                      plot_path=path)
    import os
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_x_basis_estimation_not_degenerate():
    """X-basis decoding graphs contain degree-1 check rows whose messages
    carry the decoder's finite infinity (_BIG); the fit must drop them like
    the reference drops +-inf, or every alpha collapses to 0."""
    import jax
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.008)
    llrs_x = channel_llrs(M["channel_probsX"])
    av, r2 = calibrate.estimate_alpha_alvarado_autoregressive(
        M["HdecX"], 0.008, 3, trials=200, llrs=llrs_x,
        key=jax.random.key(12))
    assert np.all(av > 0.05), av
    assert np.all(av < 2.0), av
