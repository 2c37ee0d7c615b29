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


def _layered_oracle(H, syn, prior, alphas, maxIter, n2, clip=20.0):
    """Independent dense float64 implementation of the time-layered
    (even/odd check slice) min-sum schedule; see decode_batch_lift_layered.
    """
    BIG = 1e30
    m, n = H.shape
    B = syn.shape[0]
    Hb = H.astype(bool)
    tpar = (np.arange(m) // n2) % 2
    prior = prior.astype(np.float64)
    V = np.tile(prior, (B, 1))
    R = np.zeros((B, m, n))
    done = np.zeros(B, bool)
    vals = V.copy()
    iters = np.full(B, maxIter - 1)
    sgn_syn = 1.0 - 2.0 * syn
    for it in range(maxIter):
        a = float(alphas[it])
        for L in (0, 1):
            sel = tpar == L
            Q = np.where(Hb[None], np.clip(V[:, None, :] - R, -clip, clip),
                         BIG)
            absQ = np.abs(Q)
            m1 = absQ.min(2)
            ism = absQ == m1[:, :, None]
            nmin = ism.sum(2)
            m2 = np.where(ism, BIG, absQ).min(2)
            m2 = np.where(nmin > 1, m1, m2)
            neg = (Q < 0) & Hb[None]
            negt = neg.sum(2) & 1
            sgn = np.where(negt == 1, -1.0, 1.0) * sgn_syn
            mag = np.where(ism, m2[:, :, None], m1[:, :, None])
            sq = np.where(neg, -1.0, 1.0)
            Rl = np.where(Hb[None], a * sgn[:, :, None] * sq * mag, 0.0)
            R = np.where(sel[None, :, None], Rl, R)
            V = prior[None] + R.sum(1)
        hard = (V < 0).astype(int)
        ok = (((hard @ H.T) % 2) == syn).all(1)
        vals = np.where(done[:, None], vals, V)
        iters = np.where(ok & ~done, it, iters)
        done |= ok
        if done.all():
            break
    vals = np.where(done[:, None], vals, V)
    return vals, done, iters


def test_layered_matches_scalar_oracle():
    from qldpc_tpu.ops.bp_lift import decode_batch_lift_layered
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.005)
    for basis in ("Z", "X"):
        H = (M[f"Hdec{basis}"] != 0).astype(np.uint8)
        prior = channel_llrs(M[f"channel_probs{basis}"])
        g = LiftedGraph.try_from_dense(H, code.ell, code.m, prior)
        assert g is not None
        rng = np.random.default_rng(13)
        B = 16
        errs = (rng.random((B, H.shape[1]))
                < M[f"channel_probs{basis}"]).astype(np.int8)
        syn = (errs @ H.T) % 2
        mi = 8
        seq = alpha_schedule("dynamical", mi)
        out = decode_batch_lift_layered(
            g, jnp.asarray(syn), jnp.asarray(prior, jnp.float32),
            jnp.asarray(seq), mi)
        vals_o, done_o, iters_o = _layered_oracle(
            H, syn, prior, seq, mi, code.ell * code.m)
        assert np.array_equal(np.asarray(out["converged"]), done_o)
        assert np.array_equal(np.asarray(out["iterations"]), iters_o)
        va = np.asarray(out["values"], np.float64)
        sat = np.abs(vals_o) > 1e6
        assert np.allclose(va[~sat], vals_o[~sat], atol=2e-2)
        assert np.allclose(va[sat], vals_o[sat], rtol=1e-5)
        assert np.array_equal(np.asarray(out["hard"]), (va < 0))


def test_layered_converges_no_worse_than_flooding():
    from qldpc_tpu.ops.bp_lift import decode_batch_lift_layered
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=6)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.004)
    H = (M["HdecZ"] != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"])
    g = LiftedGraph.try_from_dense(H, code.ell, code.m, prior)
    rng = np.random.default_rng(5)
    B = 128
    errs = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = jnp.asarray((errs @ H.T) % 2)
    pr = jnp.asarray(prior, jnp.float32)
    seq = jnp.asarray(alpha_schedule("dynamical", 20))
    f = decode_batch_lift(g, syn, pr, seq, 20)
    l = decode_batch_lift_layered(g, syn, pr, seq, 20)
    # converged shots must satisfy their syndrome exactly
    hard = np.asarray(l["hard"])
    conv = np.asarray(l["converged"])
    assert ((hard @ H.T) % 2 == np.asarray(syn))[conv].all()
    # the serial schedule should not lose to flooding on aggregate
    assert conv.sum() >= np.asarray(f["converged"]).sum()
