"""Lifted (circulant) BP layout vs the generic padded-CSR decoder.

The lift reorders each column's f32 message summation (base-slot order vs
row-ascending), so posteriors agree to rounding rather than bit-for-bit;
decisions, convergence flags, and iteration counts must agree exactly on
these instances (borderline-tie flips would show up as decision mismatches
and are asserted away).
"""
import numpy as np

import jax.numpy as jnp

from qldpc_tpu import (SyndromeCircuit, build_decoding_matrices,
                       channel_llrs, get_code)
from qldpc_tpu.ops.bp import TannerGraph, alpha_schedule, decode_batch
from qldpc_tpu.ops.bp_lift import LiftedGraph, decode_batch_lift


def test_lift_detection_and_equivalence():
    code = get_code("[[72, 12, 6]]")
    cycles = 4
    circ = SyndromeCircuit(code, num_cycles=cycles)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.005)
    for basis in ("Z", "X"):
        H = (M[f"Hdec{basis}"] != 0).astype(np.uint8)
        prior = channel_llrs(M[f"channel_probs{basis}"])
        g = LiftedGraph.try_from_dense(H, code.ell, code.m, prior)
        assert g is not None, "BB circuit graphs must be exact lifts"
        assert g.T == cycles + 2
        assert g.NB * code.ell * code.m * g.T >= H.shape[1] - int(
            np.asarray(g.residual).sum())

        graph = TannerGraph.from_dense(H)
        rng = np.random.default_rng(7)
        B = 32
        errs = (rng.random((B, H.shape[1]))
                < M[f"channel_probs{basis}"]).astype(np.int8)
        syn = (errs @ H.T) % 2
        seq = jnp.asarray(alpha_schedule("dynamical", 12))
        pr = jnp.asarray(prior, jnp.float32)
        a = decode_batch(graph, jnp.asarray(syn), pr, seq, 12)
        b = decode_batch_lift(g, jnp.asarray(syn), pr, seq, 12)
        for k in ("hard", "converged", "iterations"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k
        va, vb = np.asarray(a["values"]), np.asarray(b["values"])
        # saturated posteriors (degree-1 rows feed +/-1e30 magnitudes in
        # both layouts) compare relatively; the rest absolutely
        sat = np.abs(va) > 1e6
        assert np.allclose(va[~sat], vb[~sat], atol=2e-2)
        assert np.allclose(va[sat], vb[sat], rtol=1e-5)


def test_lift_damping_and_alpha_modes():
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.004)
    H = (M["HdecZ"] != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"])
    g = LiftedGraph.try_from_dense(H, code.ell, code.m, prior)
    assert g is not None
    graph = TannerGraph.from_dense(H)
    rng = np.random.default_rng(3)
    B = 16
    errs = (rng.random((B, H.shape[1]))
            < M["channel_probsZ"]).astype(np.int8)
    syn = jnp.asarray((errs @ H.T) % 2)
    pr = jnp.asarray(prior, jnp.float32)
    for mode, alpha in (("alvarado", 0.8),
                        ("alvarado-autoregressive", [0.5, 0.7, 0.9])):
        seq = jnp.asarray(alpha_schedule(mode, 10, alpha))
        a = decode_batch(graph, syn, pr, seq, 10, damping=0.7)
        b = decode_batch_lift(g, syn, pr, seq, 10, damping=0.7)
        for k in ("hard", "converged", "iterations"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), (
                mode, k)


def test_lift_rejects_unstructured():
    rng = np.random.default_rng(0)
    H = (rng.random((36, 80)) < 0.15).astype(np.uint8)
    prior = np.ones(80, np.float32)
    g = LiftedGraph.try_from_dense(H, 3, 2, prior)
    if g is not None:  # if accepted it must still decode identically
        graph = TannerGraph.from_dense(H)
        syn = (rng.integers(0, 2, (4, 36))).astype(np.int8)
        seq = jnp.asarray(alpha_schedule("dynamical", 5))
        a = decode_batch(graph, jnp.asarray(syn), jnp.asarray(prior), seq, 5)
        b = decode_batch_lift(g, jnp.asarray(syn), jnp.asarray(prior),
                              seq, 5)
        assert np.array_equal(np.asarray(a["hard"]), np.asarray(b["hard"]))
