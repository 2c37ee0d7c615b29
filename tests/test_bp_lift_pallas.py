"""VMEM-resident Pallas lifted-BP kernel vs the XLA lifted decoders.

Interpret mode on CPU checks the kernel algebra: bfloat16 must be BIT-exact
against ops/bp_lift.py; float32 agrees to FMA-contraction rounding
(decisions, convergence flags, and iteration counts exact — XLA fuses
multiply-adds inside the jitted lift that interpret-mode Pallas evaluates
as separate ops).

Posterior caveat: the kernel freezes converged shots' HARD decisions as
packed bits (one int32 slab) instead of freezing the full posterior block,
so converged shots' ``values`` are their final (post-convergence)
posteriors — compared only on unconverged shots here. ``hard`` (frozen),
``converged`` and ``iterations`` must match everywhere.
"""
import numpy as np

import jax.numpy as jnp

from qldpc_tpu import (SyndromeCircuit, build_decoding_matrices,
                       channel_llrs, get_code)
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.ops.bp_lift import (LiftedGraph, decode_batch_lift,
                                   decode_batch_lift_layered)
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas


def _setup(p=0.003, cycles=3, B=32, seed=1):
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=cycles)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
    out = {}
    rng = np.random.default_rng(seed)
    for basis in ("Z", "X"):
        H = (np.asarray(M[f"Hdec{basis}"]) != 0).astype(np.uint8)
        prior = channel_llrs(M[f"channel_probs{basis}"])
        lg = LiftedGraph.try_from_dense(H, code.ell, code.m, prior)
        assert lg is not None
        errs = (rng.random((B, H.shape[1]))
                < M[f"channel_probs{basis}"]).astype(np.int8)
        syn = jnp.asarray((errs @ H.T) % 2).astype(jnp.int8)
        out[basis] = (lg, syn, jnp.asarray(prior, jnp.float32))
    return out


def _check(a, b, basis, dt, exact_vals):
    for k in ("hard", "converged", "iterations"):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), (
            basis, dt, k)
    conv = np.asarray(a["converged"])
    va = np.asarray(a["values"])[~conv]
    vb = np.asarray(b["values"])[~conv]
    if exact_vals:
        assert np.array_equal(va, vb), (basis, dt, "not bit-exact")
    else:
        rel = np.abs(va - vb) / np.maximum(np.abs(va), 1e-9)
        assert rel.size == 0 or rel.max() < 1e-2, (basis, rel.max())


def test_kernel_matches_xla_lift():
    data = _setup()
    seq = jnp.asarray(alpha_schedule("dynamical", 12))
    for basis, (lg, syn, prior) in data.items():
        for dt in (jnp.bfloat16, jnp.float32):
            a = decode_batch_lift(lg, syn, prior, seq, 12, msg_dtype=dt)
            b = decode_batch_lift_pallas(lg, syn, prior, seq, 12,
                                         msg_dtype=dt, block_b=16,
                                         interpret=True)
            _check(a, b, basis, dt, exact_vals=(dt == jnp.bfloat16))


def test_kernel_layered_matches_xla_layered():
    data = _setup(p=0.004, cycles=4, B=32)
    seq = jnp.asarray(alpha_schedule("dynamical", 10))
    for basis, (lg, syn, prior) in data.items():
        a = decode_batch_lift_layered(lg, syn, prior, seq, 10,
                                      msg_dtype=jnp.float32)
        b = decode_batch_lift_pallas(lg, syn, prior, seq, 10,
                                     msg_dtype=jnp.float32, block_b=16,
                                     schedule="layered", interpret=True)
        _check(a, b, basis, jnp.float32, exact_vals=False)
        # at least some shots must converge for the comparison to bite
        assert np.asarray(a["converged"]).any()


def test_kernel_alpha_modes_and_blocks():
    data = _setup(B=24)
    lg, syn, prior = data["Z"]
    for mode, alpha in (("alvarado", 0.8),
                        ("alvarado-autoregressive", [0.5, 0.7, 0.9])):
        seq = jnp.asarray(alpha_schedule(mode, 8, alpha))
        a = decode_batch_lift(lg, syn, prior, seq, 8, msg_dtype=jnp.bfloat16)
        # block_b smaller than B: per-block early exit must not change
        # per-shot results
        b = decode_batch_lift_pallas(lg, syn, prior, seq, 8,
                                     msg_dtype=jnp.bfloat16, block_b=8,
                                     interpret=True)
        _check(a, b, mode, jnp.bfloat16, exact_vals=True)


def test_viable_block_b_gate():
    """Graphs whose resident state exceeds the VMEM budget must be
    rejected (the engine then takes the XLA lift path). Since the round-4
    packed-mask/merged-posterior diet, [[288]]-shaped graphs FIT (~100MB);
    a hypothetical double-depth graph still does not."""
    from types import SimpleNamespace
    from qldpc_tpu.ops.bp_lift_pallas import viable_block_b
    small = SimpleNamespace(ell=12, mm=6, T=14, NB=10, eb_pb=[None] * 35)
    assert viable_block_b(small) == 128          # [[144]]-shaped: fits
    big = SimpleNamespace(ell=12, mm=12, T=20, NB=10, eb_pb=[None] * 35)
    assert viable_block_b(big) == 128            # [[288]]-shaped: fits now
    assert viable_block_b(big, B=1024) == 128
    assert viable_block_b(big, B=64) == 64
    huge = SimpleNamespace(ell=12, mm=12, T=40, NB=10, eb_pb=[None] * 35)
    assert viable_block_b(huge) is None          # double-depth: too big
    assert viable_block_b(huge, B=64) is None    # padded to 128 lanes anyway
    assert viable_block_b(small, B=64) == 64     # small graph: any batch
    # the layered schedule budgets against its measured register-spill
    # margin: [[144]]-scale passes, [[288]]-scale falls back (hardware
    # OOM'd by 4.1MB with 32.5MB of spills)
    assert viable_block_b(small, schedule="layered") == 128
    assert viable_block_b(big, schedule="layered") is None


def test_kernel_chunked_blocks_match_grid():
    """The unrolled per-128-block path (big graphs whose multi-step grid
    would overflow VMEM) must decode identically to the grid path."""
    import qldpc_tpu.ops.bp_lift_pallas as op
    data = _setup(B=32)
    lg, syn, prior = data["Z"]
    seq = jnp.asarray(alpha_schedule("dynamical", 8))
    want = decode_batch_lift_pallas(lg, syn, prior, seq, 8,
                                    msg_dtype=jnp.float32, block_b=16,
                                    interpret=True)
    orig = op._BUDGET_BYTES
    op._BUDGET_BYTES = 1  # force the chunked branch for this tiny graph
    try:
        decode_batch_lift_pallas.clear_cache()
        got = decode_batch_lift_pallas(lg, syn, prior, seq, 8,
                                       msg_dtype=jnp.float32, block_b=16,
                                       interpret=True)
    finally:
        op._BUDGET_BYTES = orig
        decode_batch_lift_pallas.clear_cache()
    _check(want, got, "chunked", jnp.float32, exact_vals=True)
