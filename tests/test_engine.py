"""End-to-end engine: LER statistical goldens + sharding + stopping rule."""
import numpy as np
import pytest

import jax

from qldpc_tpu import get_code
from qldpc_tpu.parallel.engine import run_simulation


@pytest.fixture(scope="module")
def code72():
    return get_code("[[72, 12, 6]]")


def bb_kwargs(code):
    """Polynomial metadata kwargs, as the reference driver passes them
    (main.py:67: **bb_params) — without them the circuit builder falls back
    to raw-row neighbor derivation with a different CNOT schedule."""
    return dict(ell=code.ell, m=code.m, a_x_powers=code.a_x_powers,
                a_y_powers=code.a_y_powers, b_y_powers=code.b_y_powers,
                b_x_powers=code.b_x_powers)


def test_ler_matches_reference_high_p(code72):
    """[[72,12,6]] at p=0.006 dynamical/maxIter=20: the reference's own
    pure-python path measures 0.595 at 200 errors (VALIDATION.md row 1 ran
    at these exact settings; the 200-error archive at unknown config reads
    0.568). Assert within 3.5 binomial sigma of 0.595 — a real statistical
    golden, not a fixed band."""
    c = code72
    res = run_simulation(c.Hx, c.Hz, c.Lx, c.Lz, 0.006, num_cycles=6,
                         maxIter=20, osd_order=2, alpha_mode="dynamical",
                         target_logical_errors=100, max_trials=400,
                         base_seed=7, batch_size=64, verbose=False, **bb_kwargs(c))
    n = res["num_trials"]
    assert n >= 100
    p_ref = 0.595
    sigma = np.sqrt(p_ref * (1 - p_ref) / n)
    assert abs(res["logical_error_rate"] - p_ref) <= 3.5 * sigma, (res, sigma)
    # multi-device CPU mesh engaged (conftest forces 8 virtual devices)
    assert res["num_devices"] == 8


def test_sequential_stopping_rule(code72):
    """Stopping truncates at the exact trial where the target is reached."""
    c = code72
    res = run_simulation(c.Hx, c.Hz, c.Lx, c.Lz, 0.006, num_cycles=6,
                         maxIter=10, osd_order=0, alpha_mode="dynamical",
                         target_logical_errors=5, max_trials=2000,
                         base_seed=3, batch_size=32, verbose=False, **bb_kwargs(c))
    assert res["logical_errors"] == 5
    # the last counted trial must be the crossing error itself
    assert res["num_trials"] <= 2000


def test_reproducible_given_seed(code72):
    c = code72
    kw = dict(num_cycles=6, maxIter=10, osd_order=0, alpha_mode="dynamical",
              max_trials=64, base_seed=11, batch_size=8, verbose=False)
    r1 = run_simulation(c.Hx, c.Hz, c.Lx, c.Lz, 0.006, **kw)
    r2 = run_simulation(c.Hx, c.Hz, c.Lx, c.Lz, 0.006, **kw)
    assert r1["logical_errors"] == r2["logical_errors"]
    assert r1["num_trials"] == r2["num_trials"]


def test_tanh_bp_variant_selectable(code72):
    """bp_variant='tanh' routes decoding through the true-BP tanh decoder
    (reference performBeliefPropagationFast) end to end."""
    c = code72
    res = run_simulation(c.Hx, c.Hz, c.Lx, c.Lz, 0.006, num_cycles=3,
                         maxIter=15, osd_order=0, alpha_mode="dynamical",
                         max_trials=64, base_seed=5, batch_size=8,
                         verbose=False, bp_variant="tanh", **bb_kwargs(c))
    assert res["num_trials"] == 64
    assert 0.0 <= res["logical_error_rate"] <= 1.0


def test_reference_format_precomputed_matrices(code72):
    """A reference-style matrix dict (no sampler metadata) is accepted and
    back-filled; a mismatched one is rejected."""
    from qldpc_tpu import SyndromeCircuit, build_decoding_matrices
    c = code72
    circ = SyndromeCircuit(c, num_cycles=3)
    M = build_decoding_matrices(circ, c.Lx, c.Lz, 0.008)
    ref_style = {k: M[k] for k in
                 ["HdecZ", "HdecX", "channel_probsZ", "channel_probsX",
                  "HZ_full", "HX_full", "first_logical_rowZ",
                  "first_logical_rowX", "num_cycles", "k"]}
    res = run_simulation(c.Hx, c.Hz, c.Lx, c.Lz, 0.008, num_cycles=3,
                         maxIter=8, osd_order=0, alpha_mode="dynamical",
                         precomputed_matrices=ref_style, max_trials=16,
                         base_seed=0, batch_size=2, verbose=False,
                         **bb_kwargs(c))
    assert res["num_trials"] == 16

    bad = dict(ref_style)
    bad["HdecZ"] = np.zeros_like(np.asarray(M["HdecZ"]))
    with pytest.raises(ValueError, match="disagrees"):
        run_simulation(c.Hx, c.Hz, c.Lx, c.Lz, 0.008, num_cycles=3,
                       maxIter=8, precomputed_matrices=bad, max_trials=8,
                       batch_size=2, verbose=False, **bb_kwargs(c))


def test_multi_code_single_launch():
    """Two codes decoded in ONE jitted launch (multi-code batching)."""
    import jax
    from qldpc_tpu import SyndromeCircuit, build_decoding_matrices
    from qldpc_tpu.ops.bp import alpha_schedule
    from qldpc_tpu.parallel.engine import (_make_basis, make_key,
                                           make_multi_code_round_fn)
    specs, decs = [], []
    for name in ("[[72, 12, 6]]", "[[90, 8, 10]]"):
        code = get_code(name)
        circ = SyndromeCircuit(code, num_cycles=2)
        M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.01)
        seq = alpha_schedule("dynamical", 4)
        dz = _make_basis(circ, M, "Z", seq, osd_order=0)
        dx = _make_basis(circ, M, "X", seq, osd_order=0)
        specs.append(dict(dec_z=dz, dec_x=dx, n_locs=circ.num_error_locs,
                          error_rate=0.01, batch=8, maxIter=4, osd_order=0))
        decs.append((dz, dx))
    fn = jax.jit(make_multi_code_round_fn(specs))
    outs = jax.device_get(fn(make_key(0), decs))
    assert len(outs) == 2
    for out in outs:
        assert out["any_err"].shape == (8,)
    # scan fusion composes with the multi-code (list-of-dicts) output and
    # fused round i reproduces an individual launch with the folded key
    from qldpc_tpu.parallel.engine import make_scanned_round_fn
    fused = jax.jit(make_scanned_round_fn(make_multi_code_round_fn(specs), 3))
    key = make_key(0)
    fouts = jax.device_get(fused(key, decs))
    assert len(fouts) == 2
    one = jax.device_get(fn(jax.random.fold_in(key, 1), decs))
    for o1, fout in zip(one, fouts):
        assert fout["any_err"].shape == (24,)
        np.testing.assert_array_equal(fout["any_err"][8:16], o1["any_err"])
    # the pooled (cross-round OSD compaction) multi-code schedule is
    # bit-identical to the scanned one
    from qldpc_tpu.parallel.engine import make_multi_code_pooled_round_fn
    pooled = jax.jit(make_multi_code_pooled_round_fn(specs, 3))
    pouts = jax.device_get(pooled(key, decs))
    for fout, pout in zip(fouts, pouts):
        assert set(fout) == set(pout)
        for k in fout:
            np.testing.assert_array_equal(fout[k], pout[k], err_msg=k)


def test_round_program_shared_across_p():
    """The decode round's HLO must be identical across error rates: p
    enters as a traced scalar, so a p-sweep reuses ONE compiled program
    (every p-dependent table travels inside the decoder-bundle arguments).
    A p baked into the program as a constant would silently restore the
    multi-minute per-point remote compile."""
    import hashlib

    import jax
    import jax.numpy as jnp

    from qldpc_tpu import SyndromeCircuit, build_decoding_matrices
    from qldpc_tpu.ops.bp import alpha_schedule
    from qldpc_tpu.parallel.engine import _make_basis, make_key, make_round_fn

    from qldpc_tpu.parallel.engine import make_pooled_round_fn

    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=2)
    hlos, hlos_pooled = [], []
    for p in (0.01, 0.004):
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        seq = alpha_schedule("dynamical", 4)
        dz = _make_basis(circ, M, "Z", seq, osd_order=1)
        dx = _make_basis(circ, M, "X", seq, osd_order=1)
        for fns, fn in (
                (hlos, make_round_fn(dz, dx, circ.num_error_locs, p, 8, 4,
                                     1)),
                (hlos_pooled, make_pooled_round_fn(
                    dz, dx, circ.num_error_locs, p, 8, 4, 1, 2))):
            low = jax.jit(fn).lower(make_key(0), dz, dx, jnp.float32(p))
            fns.append(hashlib.sha256(
                str(low.compiler_ir("stablehlo")).encode()).hexdigest())
    assert hlos[0] == hlos[1]
    # the pooled (production rpd>1) round must share the property
    assert hlos_pooled[0] == hlos_pooled[1]


def test_pooled_round_fn_bit_identical():
    """Cross-round OSD compaction (make_pooled_round_fn) must produce
    BIT-IDENTICAL per-shot flags to the per-round scanned schedule: OSD
    results are grouping-independent (validity exit and cond gating change
    cost only), so pooling the fused rounds' failed shots into one sorted
    chunk sequence is a pure cost optimization. Any flag diff here means a
    real decode-semantics change leaked into the pooled path."""
    import jax

    from qldpc_tpu import SyndromeCircuit, build_decoding_matrices
    from qldpc_tpu.ops.bp import alpha_schedule
    from qldpc_tpu.parallel.engine import (_make_basis, make_key,
                                           make_pooled_round_fn,
                                           make_round_fn,
                                           make_scanned_round_fn)

    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    p = 0.01  # high p so a healthy fraction of shots fail BP -> OSD runs
    M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
    seq = alpha_schedule("dynamical", 4)
    dz = _make_basis(circ, M, "Z", seq, osd_order=1)
    dx = _make_basis(circ, M, "X", seq, osd_order=1)
    batch, rpd = 96, 3  # batch > 64 so the chunked (non-trivial) path runs
    scanned = jax.jit(make_scanned_round_fn(
        make_round_fn(dz, dx, circ.num_error_locs, p, batch, 4, 1), rpd))
    pooled = jax.jit(make_pooled_round_fn(
        dz, dx, circ.num_error_locs, p, batch, 4, 1, rpd))
    key = make_key(7)
    a = jax.device_get(scanned(key, dz, dx))
    b = jax.device_get(pooled(key, dz, dx))
    assert set(a) == set(b)
    assert any(a["z_err"]) or any(a["x_err"])  # the comparison is non-vacuous
    assert not all(a["z_conv"] & a["x_conv"])  # OSD actually exercised
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_run_multi_code_simulation():
    """BASELINE config 3 as an API: several codes per jitted launch with
    per-code exact sequential stopping."""
    from qldpc_tpu.parallel.engine import run_multi_code_simulation
    res = run_multi_code_simulation(
        ["[[72, 12, 6]]", "[[90, 8, 10]]"], 0.01, num_cycles=2,
        maxIter=5, osd_order=0, target_logical_errors=6, max_trials=400,
        batch_size=16, base_seed=9, verbose=False)
    assert set(res) == {"[[72, 12, 6]]", "[[90, 8, 10]]"}
    for name, r in res.items():
        assert r["logical_errors"] == 6 or r["num_trials"] == 400, (name, r)
        assert 0.0 <= r["logical_error_rate"] <= 1.0
    # reproducible given the seed
    res2 = run_multi_code_simulation(
        ["[[72, 12, 6]]", "[[90, 8, 10]]"], 0.01, num_cycles=2,
        maxIter=5, osd_order=0, target_logical_errors=6, max_trials=400,
        batch_size=16, base_seed=9, verbose=False)
    for name in res:
        assert res[name]["num_trials"] == res2[name]["num_trials"]
        assert res[name]["logical_errors"] == res2[name]["logical_errors"]
