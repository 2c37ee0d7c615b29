"""VMEM-resident Pallas lifted-BP kernel vs the XLA lifted decoder.

Interpret mode on CPU checks the kernel algebra: bfloat16 (the production
message dtype on TPU) must be BIT-exact against ops/bp_lift.py; float32
agrees to FMA-contraction rounding (decisions, convergence flags, and
iteration counts exact — XLA fuses multiply-adds inside the jitted lift
that interpret-mode Pallas evaluates as separate ops)."""
import numpy as np

import jax.numpy as jnp

from qldpc_tpu import (SyndromeCircuit, build_decoding_matrices,
                       channel_llrs, get_code)
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.ops.bp_lift import LiftedGraph, decode_batch_lift
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


def test_kernel_matches_xla_lift():
    data = _setup()
    seq = jnp.asarray(alpha_schedule("dynamical", 12))
    for basis, (lg, syn, prior) in data.items():
        for dt in (jnp.bfloat16, jnp.float32):
            a = decode_batch_lift(lg, syn, prior, seq, 12, msg_dtype=dt)
            b = decode_batch_lift_pallas(lg, syn, prior, seq, 12,
                                         msg_dtype=dt, block_b=16,
                                         interpret=True)
            for k in ("hard", "converged", "iterations"):
                assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), (
                    basis, dt, k)
            va, vb = np.asarray(a["values"]), np.asarray(b["values"])
            if dt == jnp.bfloat16:
                assert np.array_equal(va, vb), (basis, "bf16 not bit-exact")
            else:
                rel = np.abs(va - vb) / np.maximum(np.abs(va), 1e-9)
                assert rel.max() < 1e-2, (basis, rel.max())


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
        for k in ("hard", "converged", "iterations", "values"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), (
                mode, k)


def test_viable_block_b_gate():
    """The only Mosaic-legal general batch block is 128; graphs whose
    resident state exceeds the budget must be rejected (the engine then
    takes the XLA lift path — the [[288]] case)."""
    from types import SimpleNamespace
    from qldpc_tpu.ops.bp_lift_pallas import viable_block_b
    small = SimpleNamespace(ell=12, mm=6, T=14, NB=10, eb_pb=[None] * 35)
    assert viable_block_b(small) == 128          # [[144]]-shaped: fits
    big = SimpleNamespace(ell=12, mm=12, T=20, NB=10, eb_pb=[None] * 35)
    assert viable_block_b(big) is None           # [[288]]-shaped: too big
    # sub-128 batches pay for the padded 128-lane tile: a too-big graph is
    # rejected at ANY batch (measured VMEM OOM at B=64 on v5e —
    # scripts/bp288_chunked_ab.py)
    assert viable_block_b(big, B=64) is None
    assert viable_block_b(small, B=64) == 64     # small graph: any batch
