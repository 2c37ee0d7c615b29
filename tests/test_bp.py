"""Batched min-sum BP vs a scalar NumPy oracle implementation.

The oracle mirrors the normalized-min-sum specification the reference
implements (two-pass sign/min1/min2 with first-argmin semantics, damping,
double clipping, per-iteration hard decision + syndrome check, early exit)
but is written independently, row-by-row in NumPy float64.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, channel_llrs, get_code
from qldpc_tpu.ops.bp import (TannerGraph, alpha_schedule, decode_batch,
                              decode_batch_tanh)


def minsum_oracle(H, syndrome, prior, alpha_seq, maxIter, damping=1.0,
                  clip=20.0):
    """Scalar normalized min-sum, float64. Returns (hard, converged, values,
    iterations)."""
    H = np.asarray(H) != 0
    m, n = H.shape
    rows = [np.nonzero(H[i])[0] for i in range(m)]
    sgn_syn = 1.0 - 2.0 * syndrome
    Q = {(i, j): prior[j] for i in range(m) for j in rows[i]}
    Qold = dict(Q)
    values = prior.astype(float).copy()
    hard = np.zeros(n, dtype=np.int8)
    for it in range(maxIter):
        alpha = alpha_seq[it]
        R = {}
        Rsum = np.zeros(n)
        for i in range(m):
            if len(rows[i]) == 0:
                continue
            sgn = sgn_syn[i]
            m1, m2, i1 = np.inf, np.inf, -1
            for j in rows[i]:
                v = Q[(i, j)]
                sgn *= 1.0 if v >= 0 else -1.0
                a = abs(v)
                if a < m1:
                    m2, m1, i1 = m1, a, j
                elif a < m2:
                    m2 = a
            for j in rows[i]:
                v = Q[(i, j)]
                sj = 1.0 if v >= 0 else -1.0
                mag = m2 if j == i1 else m1
                R[(i, j)] = alpha * sgn * sj * mag
                Rsum[j] += R[(i, j)]
        values = Rsum + prior
        for i in range(m):
            for j in rows[i]:
                q = np.clip(values[j] - R[(i, j)], -clip, clip)
                q = np.clip(damping * q + (1 - damping) * Qold[(i, j)],
                            -clip, clip)
                Q[(i, j)] = Qold[(i, j)] = q
        hard = (values < 0).astype(np.int8)
        if np.array_equal((H @ hard) % 2, syndrome):
            return hard, True, values, it
    return hard, False, values, maxIter - 1


def tanh_bp_oracle(H, syndrome, prior, maxIter, clip_val=0.9999999):
    """Scalar tanh-based true BP, float64 — the specification the reference's
    performBeliefPropagationFast + bp_core implements (dense.py:75-96,
    kernels.py:171-193): excluded-self product via row_prod / t_j division,
    near-zero tanh factors floored at +-1e-15 (sign: t >= 0 -> +), product
    clipped to +-clip_val before 2*arctanh, no damping/clipping of Q."""
    H = np.asarray(H) != 0
    m, n = H.shape
    rows = [np.nonzero(H[i])[0] for i in range(m)]
    sgn_syn = 1.0 - 2.0 * syndrome
    Q = {(i, j): float(prior[j]) for i in range(m) for j in rows[i]}
    values = prior.astype(float).copy()
    hard = np.zeros(n, dtype=np.int8)
    for it in range(maxIter):
        R = {}
        Rsum = np.zeros(n)
        for i in range(m):
            prod = 1.0
            t = {}
            for j in rows[i]:
                tv = np.tanh(Q[(i, j)] * 0.5)
                if abs(tv) < 1e-15:
                    tv = 1e-15 if tv >= 0 else -1e-15
                t[j] = tv
                prod *= tv
            for j in rows[i]:
                pc = np.clip(prod / t[j] * sgn_syn[i], -clip_val, clip_val)
                R[(i, j)] = 2.0 * np.arctanh(pc)
                Rsum[j] += R[(i, j)]
        values = Rsum + prior
        for i in range(m):
            for j in rows[i]:
                Q[(i, j)] = values[j] - R[(i, j)]
        hard = (values < 0).astype(np.int8)
        if np.array_equal((H @ hard) % 2, syndrome):
            return hard, True, values, it
    return hard, False, values, maxIter - 1


def random_ldpc(rng, m, n, wc=3):
    H = np.zeros((m, n), dtype=np.uint8)
    for j in range(n):
        H[rng.choice(m, size=wc, replace=False), j] = 1
    return H


@pytest.mark.parametrize("mode,alpha", [
    ("dynamical", 1.0), ("alvarado", 0.8),
    ("alvarado-autoregressive", [0.5, 0.7, 0.8, 0.9]),
])
def test_matches_oracle_random_code(mode, alpha):
    rng = np.random.default_rng(3)
    m, n, maxIter = 30, 60, 12
    H = random_ldpc(rng, m, n)
    prior = np.clip(rng.normal(3.0, 1.5, n), -20, 20)
    seq = alpha_schedule(mode, maxIter, alpha)
    graph = TannerGraph.from_dense(H)
    B = 24
    errors = (rng.random((B, n)) < 0.06).astype(np.int8)
    syn = (errors @ H.T) % 2
    out = decode_batch(graph, jnp.asarray(syn), jnp.asarray(prior,
                       dtype=jnp.float32), jnp.asarray(seq), maxIter)
    hard = np.asarray(out["hard"])
    conv = np.asarray(out["converged"])
    vals = np.asarray(out["values"])
    iters = np.asarray(out["iterations"])
    for b in range(B):
        oh, oc, ov, oi = minsum_oracle(H, syn[b], prior, seq, maxIter)
        assert conv[b] == oc, b
        assert iters[b] == oi, b
        assert np.allclose(vals[b], ov, atol=2e-4), b
        assert np.array_equal(hard[b], oh), b


def test_damping_matches_oracle():
    rng = np.random.default_rng(11)
    m, n, maxIter = 24, 48, 10
    H = random_ldpc(rng, m, n)
    prior = np.clip(rng.normal(2.5, 1.0, n), -20, 20)
    seq = alpha_schedule("dynamical", maxIter)
    graph = TannerGraph.from_dense(H)
    errors = (rng.random((8, n)) < 0.08).astype(np.int8)
    syn = (errors @ H.T) % 2
    out = decode_batch(graph, jnp.asarray(syn),
                       jnp.asarray(prior, dtype=jnp.float32),
                       jnp.asarray(seq), maxIter, damping=0.7)
    for b in range(8):
        oh, oc, ov, oi = minsum_oracle(H, syn[b], prior, seq, maxIter,
                                       damping=0.7)
        assert np.asarray(out["converged"])[b] == oc
        assert np.allclose(np.asarray(out["values"])[b], ov, atol=2e-4)
        assert np.array_equal(np.asarray(out["hard"])[b], oh)


def test_tanh_bp_matches_oracle():
    """decode_batch_tanh vs the scalar float64 tanh-BP oracle: identical
    convergence/iteration/hard decisions, posteriors to f32 tolerance."""
    rng = np.random.default_rng(17)
    m, n, maxIter = 30, 60, 15
    H = random_ldpc(rng, m, n)
    prior = np.clip(rng.normal(3.0, 1.5, n), -20, 20)
    graph = TannerGraph.from_dense(H)
    B = 24
    errors = (rng.random((B, n)) < 0.06).astype(np.int8)
    syn = (errors @ H.T) % 2
    out = decode_batch_tanh(graph, jnp.asarray(syn),
                            jnp.asarray(prior, dtype=jnp.float32), maxIter)
    for b in range(B):
        oh, oc, ov, oi = tanh_bp_oracle(H, syn[b], prior, maxIter)
        assert np.asarray(out["converged"])[b] == oc, b
        assert np.asarray(out["iterations"])[b] == oi, b
        # tanh/arctanh chains lose more bits than min-sum; posterior scale
        # is O(10), so 3e-3 is ~f32 resolution through the chain
        assert np.allclose(np.asarray(out["values"])[b], ov,
                           atol=3e-3, rtol=1e-4), b
        assert np.array_equal(np.asarray(out["hard"])[b], oh), b


def test_tanh_bp_on_real_decoding_matrix():
    """On the [[72]] decoding graph the tanh variant must converge to
    syndrome-exact candidates for most shots (capability parity with the
    reference's unused performBeliefPropagationFast path)."""
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.003)
    H = (M["HdecZ"] != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"])
    graph = TannerGraph.from_dense(H)
    rng = np.random.default_rng(2)
    B = 32
    errors = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = (errors @ H.T) % 2
    out = decode_batch_tanh(graph, jnp.asarray(syn),
                            jnp.asarray(prior, dtype=jnp.float32), 30)
    hard = np.asarray(out["hard"])
    conv = np.asarray(out["converged"])
    assert conv.mean() > 0.6
    for b in np.nonzero(conv)[0]:
        assert np.array_equal((hard[b] @ H.T) % 2, syn[b])


def test_real_decoding_matrix_convergence():
    """On the [[72]] decoding graph at moderate p, BP converges for most
    shots and every converged candidate reproduces its syndrome exactly."""
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.003)
    H = (M["HdecZ"] != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"])
    graph = TannerGraph.from_dense(H)
    rng = np.random.default_rng(0)
    B = 64
    errors = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = (errors @ H.T) % 2
    out = decode_batch(graph, jnp.asarray(syn),
                       jnp.asarray(prior, dtype=jnp.float32),
                       jnp.asarray(alpha_schedule("dynamical", 20)), 20)
    hard = np.asarray(out["hard"])
    conv = np.asarray(out["converged"])
    assert conv.mean() > 0.7
    for b in np.nonzero(conv)[0]:
        assert np.array_equal((hard[b] @ H.T) % 2, syn[b])


def test_bf16_messages_statistically_equivalent():
    """bf16 edge messages (the TPU production dtype) must track f32: similar
    convergence rate, and every converged candidate still reproduces its
    syndrome exactly (the invariant is checked inside the decoder, so a
    converged flag certifies it; here we re-verify externally)."""
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.003)
    H = (M["HdecZ"] != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"])
    graph = TannerGraph.from_dense(H)
    rng = np.random.default_rng(5)
    B = 128
    errors = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = (errors @ H.T) % 2
    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        outs[dt] = decode_batch(
            graph, jnp.asarray(syn), jnp.asarray(prior, dtype=jnp.float32),
            jnp.asarray(alpha_schedule("dynamical", 20)), 20, msg_dtype=dt)
    conv32 = np.asarray(outs[jnp.float32]["converged"])
    conv16 = np.asarray(outs[jnp.bfloat16]["converged"])
    assert conv16.mean() > 0.7
    # near-identical per-shot convergence behaviour
    assert (conv32 == conv16).mean() > 0.95
    hard16 = np.asarray(outs[jnp.bfloat16]["hard"])
    for b in np.nonzero(conv16)[0]:
        assert np.array_equal((hard16[b] @ H.T) % 2, syn[b])
    # posteriors agree to bf16 resolution on agreeing shots
    both = conv32 & conv16
    v32 = np.asarray(outs[jnp.float32]["values"])[both]
    v16 = np.asarray(outs[jnp.bfloat16]["values"])[both]
    assert np.mean(np.sign(v32) == np.sign(v16)) > 0.99
