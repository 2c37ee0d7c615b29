"""Linear-map trial path vs explicit gate-walk oracle.

The production path computes syndromes as one matmul against precomputed
per-location signatures; the oracle inserts actual Pauli ops and walks the
circuit. Exact agreement on identical random choices validates the
fault-decomposition tables, the signature matrices, and the sampler wiring.
"""
import numpy as np
import pytest

import jax

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.models.reference_sim import run_trial_oracle
from qldpc_tpu.ops import sampler


@pytest.fixture(scope="module")
def setup72():
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.01)
    maps_z = sampler.make_trial_maps(circ, M, "Z")
    maps_x = sampler.make_trial_maps(circ, M, "X")
    return code, circ, M, maps_z, maps_x


def test_trial_batch_matches_oracle(setup72):
    code, circ, M, maps_z, maps_x = setup72
    B = 64
    key = jax.random.key(1234)
    # sample on device, then replay the SAME choices through the oracle
    err, pauli, cat2 = jax.device_get(
        sampler.sample_gate_randoms(key, B, circ.num_error_locs, 0.02))
    bits_z = jax.device_get(sampler.fault_bits(
        jax.numpy.asarray(err), jax.numpy.asarray(pauli),
        jax.numpy.asarray(cat2), maps_z, "Z"))
    aug_z = jax.device_get(sampler.augmented_bits(
        jax.numpy.asarray(bits_z), maps_z))
    bits_x = jax.device_get(sampler.fault_bits(
        jax.numpy.asarray(err), jax.numpy.asarray(pauli),
        jax.numpy.asarray(cat2), maps_x, "X"))
    aug_x = jax.device_get(sampler.augmented_bits(
        jax.numpy.asarray(bits_x), maps_x))

    n_err_shots = 0
    for b in range(B):
        sz, tz, sx, tx = run_trial_oracle(circ, code.Lx, code.Lz,
                                          err[b], pauli[b], cat2[b])
        n_err_shots += err[b].any()
        assert np.array_equal(aug_z[b, :maps_z.num_syn], sz), f"shot {b} syn_z"
        assert np.array_equal(aug_z[b, maps_z.num_syn:], tz), f"shot {b} log_z"
        assert np.array_equal(aug_x[b, :maps_x.num_syn], sx), f"shot {b} syn_x"
        assert np.array_equal(aug_x[b, maps_x.num_syn:], tx), f"shot {b} log_x"
    assert n_err_shots > B // 2  # the test actually exercised errors


def test_trial_batch_end_to_end_shapes(setup72):
    code, circ, M, maps_z, maps_x = setup72
    out = sampler.trial_batch(jax.random.key(0), 0.006, maps_z, maps_x,
                              circ.num_error_locs, batch=32)
    assert out["syndrome_z"].shape == (32, maps_z.num_syn)
    assert out["true_z"].shape == (32, code.k)
    assert out["syndrome_x"].shape == (32, maps_x.num_syn)
    # syndromes are 0/1
    assert set(np.unique(jax.device_get(out["syndrome_z"]))) <= {0, 1}


def test_error_rate_marginals(setup72):
    """Statistical check: per-location fault rates match the channel model
    (p for meas/prep, 2p/3 for idle Z-component, 8p/15 per CNOT leg)."""
    code, circ, M, maps_z, maps_x = setup72
    B, p = 20000, 0.05
    err, pauli, cat2 = sampler.sample_gate_randoms(
        jax.random.key(7), B, circ.num_error_locs, p)
    bits = jax.device_get(sampler.fault_bits(err, pauli, cat2, maps_z, "Z"))
    rates = bits.mean(axis=1)  # bits are (L, B) location-major
    sel = jax.device_get(maps_z.sel)
    for sel_code, expect in ((sampler.SEL_CONST, p),
                             (sampler.SEL_IDLE, 2 * p / 3),
                             (sampler.SEL_CTRL, 8 * p / 15),
                             (sampler.SEL_TGT, 8 * p / 15)):
        got = rates[sel == sel_code].mean()
        assert abs(got - expect) < 0.15 * expect, (sel_code, got, expect)
