"""BP iteration-cost breakdown on real hardware.

Variants: full decoder; no syndrome check; no convergence freezing; plain
fori loop; gather-free col-sum via one-hot bf16 matmul. Identifies which
parts of the iteration dominate so optimization goes where the time is.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, channel_llrs, get_code
from qldpc_tpu.ops.bp import (TannerGraph, _check_update, _variable_update,
                              _syndrome_of, alpha_schedule, decode_batch, _BIG)
from qldpc_tpu.utils.caching import compute_cache_key, load_matrices


def timed(name, fn, *args, reps=5):
    # device_get, not block_until_ready: see profile_round.py note.
    # Reduce outputs to scalars ON DEVICE: transferring a (m, dr, B) array
    # over the remote tunnel costs >1s and would swamp the kernel timing.
    small = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.float32).sum(), fn(*a)))
    jax.device_get(small(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(small(*args))
    print(f"{name:38s} {(time.time()-t0)/reps*1e3:8.2f} ms")
    return out


def main():
    name, p, B, maxIter = "[[144, 12, 12]]", 0.004, 512, 20
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
    H = (M["HdecZ"] != 0).astype(np.uint8)
    graph = TannerGraph.from_dense(H)
    prior = jnp.asarray(channel_llrs(M["channel_probsZ"]), jnp.float32)
    seq = jnp.asarray(alpha_schedule("dynamical", maxIter))
    rng = np.random.default_rng(0)
    errors = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = jnp.asarray((errors @ H.T) % 2).astype(jnp.int8)

    timed("full decode_batch", jax.jit(
        lambda s: decode_batch(graph, s, prior, seq, maxIter)), syn)

    def fixed_loop(check_syndrome, use_while):
        def run(syndrome):
            Bl = syndrome.shape[0]
            syn_t = syndrome.T.astype(jnp.int32)
            sgn = (1.0 - 2.0 * syn_t).astype(jnp.float32)
            mask3 = graph.row_mask[:, :, None]
            pp = jnp.concatenate([prior, jnp.zeros((1,), jnp.float32)])
            Q0 = jnp.take(pp, graph.row_cols.reshape(-1), axis=0)
            Q0 = jnp.broadcast_to(Q0.reshape(graph.m, graph.dr, 1),
                                  (graph.m, graph.dr, Bl))
            Q0 = jnp.where(mask3, Q0, _BIG)

            def body(it, Q):
                R = _check_update(Q, sgn, seq[it])
                values, Qn, _ = _variable_update(R, prior, graph, mask3)
                Qn = jnp.clip(Qn, -20.0, 20.0)
                Qn = jnp.where(mask3, Qn, _BIG)
                if check_syndrome:
                    hard = (values < 0.0).astype(jnp.int32)
                    ok = jnp.all(_syndrome_of(hard, graph) == syn_t, axis=0)
                    Qn = Qn + 0.0 * ok.astype(jnp.float32)[None, None, :]
                return Qn

            if use_while:
                Q = jax.lax.while_loop(
                    lambda c: c[0] < maxIter,
                    lambda c: (c[0] + 1, body(c[0], c[1])),
                    (jnp.int32(0), Q0))[1]
            else:
                Q = jax.lax.fori_loop(0, maxIter, body, Q0)
            return Q
        return run

    timed("fori, no syndrome check, no freeze",
          jax.jit(fixed_loop(False, False)), syn)
    timed("fori, with syndrome check",
          jax.jit(fixed_loop(True, False)), syn)
    timed("while, with syndrome check",
          jax.jit(fixed_loop(True, True)), syn)

    # gather-free variable update: one-hot bf16 matmul for the column sum
    onehot = np.zeros((graph.n, graph.m * graph.dr), np.float32)
    rc = np.asarray(graph.row_cols).reshape(-1)
    mk = np.asarray(graph.row_mask).reshape(-1)
    onehot[rc[mk], np.nonzero(mk)[0]] = 1.0
    onehot = jnp.asarray(onehot, dtype=jnp.bfloat16)

    def matmul_loop(syndrome):
        Bl = syndrome.shape[0]
        syn_t = syndrome.T.astype(jnp.int32)
        sgn = (1.0 - 2.0 * syn_t).astype(jnp.float32)
        mask3 = graph.row_mask[:, :, None]
        pp = jnp.concatenate([prior, jnp.zeros((1,), jnp.float32)])
        Q0 = jnp.take(pp, graph.row_cols.reshape(-1), axis=0)
        Q0 = jnp.broadcast_to(Q0.reshape(graph.m, graph.dr, 1),
                              (graph.m, graph.dr, Bl))
        Q0 = jnp.where(mask3, Q0, _BIG)

        def body(it, Q):
            R = _check_update(Q, sgn, seq[it])
            Rm = jnp.where(mask3, R, 0.0).reshape(graph.m * graph.dr, Bl)
            R_sum = jnp.dot(onehot, Rm.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            values = prior[:, None] + R_sum
            vp = jnp.concatenate([values, jnp.zeros((1, Bl))], 0)
            vr = jnp.take(vp, graph.row_cols.reshape(-1), axis=0)
            Qn = vr.reshape(graph.m, graph.dr, Bl) - R
            Qn = jnp.clip(Qn, -20.0, 20.0)
            return jnp.where(mask3, Qn, _BIG)

        return jax.lax.fori_loop(0, maxIter, body, Q0)

    timed("fori, col-sum as one-hot matmul", jax.jit(matmul_loop), syn)





def gather_only():
    """Standalone cost of the two per-iteration gathers."""
    name, p, B = "[[144, 12, 12]]", 0.004, 512
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    M = load_matrices("matrix_cache", compute_cache_key(
        code.Hx, code.Hz, code.Lx, code.Lz, code.distance, p))
    H = (M["HdecZ"] != 0).astype(np.uint8)
    graph = TannerGraph.from_dense(H)
    E = graph.m * graph.dr
    R_flat = jnp.ones((E + 1, B), jnp.float32)
    vals = jnp.ones((graph.n + 1, B), jnp.float32)
    ce = graph.col_edges.reshape(-1)
    rc = graph.row_cols.reshape(-1)
    timed("gather R->cols (n*dc rows)",
          jax.jit(lambda r: jnp.take(r, ce, axis=0)), R_flat)
    timed("gather vals->rows (m*dr rows)",
          jax.jit(lambda v: jnp.take(v, rc, axis=0)), vals)
    Q = jnp.ones((graph.m, graph.dr, B), jnp.float32)
    sgn = jnp.ones((graph.m, B), jnp.float32)
    from qldpc_tpu.ops.bp import _check_update
    timed("check update alone",
          jax.jit(lambda q: _check_update(q, sgn, jnp.float32(0.8))), Q)





def isolate_parts():
    name, p, B, maxIter = "[[144, 12, 12]]", 0.004, 512, 20
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    M = load_matrices("matrix_cache", compute_cache_key(
        code.Hx, code.Hz, code.Lx, code.Lz, code.distance, p))
    H = (M["HdecZ"] != 0).astype(np.uint8)
    graph = TannerGraph.from_dense(H)
    prior = jnp.asarray(channel_llrs(M["channel_probsZ"]), jnp.float32)
    seq = jnp.asarray(alpha_schedule("dynamical", maxIter))
    rng = np.random.default_rng(0)
    errors = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = jnp.asarray((errors @ H.T) % 2).astype(jnp.int8)

    def make(loop_kind):
        def run(syndrome):
            Bl = syndrome.shape[0]
            syn_t = syndrome.T.astype(jnp.int32)
            sgn = (1.0 - 2.0 * syn_t).astype(jnp.float32)
            mask3 = graph.row_mask[:, :, None]
            pp = jnp.concatenate([prior, jnp.zeros((1,), jnp.float32)])
            Q0 = jnp.take(pp, graph.row_cols.reshape(-1), axis=0)
            Q0 = jnp.broadcast_to(Q0.reshape(graph.m, graph.dr, 1),
                                  (graph.m, graph.dr, Bl))
            Q0 = jnp.where(mask3, Q0, _BIG)

            def body(it, Q):
                if loop_kind == "full":
                    R = _check_update(Q, sgn, seq[it])
                else:
                    R = Q * seq[it]          # trivial stand-in, same shapes
                if loop_kind == "check_only":
                    return jnp.where(mask3, R, _BIG)
                values, Qn, _ = _variable_update(R, prior, graph, mask3)
                Qn = jnp.clip(Qn, -20.0, 20.0)
                return jnp.where(mask3, Qn, _BIG)

            return jax.lax.fori_loop(0, maxIter, body, Q0)
        return run

    timed("loop: full (check + var updates)", jax.jit(make("full")), syn)
    timed("loop: trivial R + var update    ", jax.jit(make("gather")), syn)
    timed("loop: check update only         ", jax.jit(make("check_only")), syn)


if __name__ == "__main__":
    isolate_parts()
