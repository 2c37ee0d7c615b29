"""Cumulative-prefix decomposition of osd_batch on real hardware.

Times jitted prefixes of the exact osd_batch pipeline (each stage includes
all previous ones) so successive differences give per-stage costs within a
single run — immune to the chip's run-to-run throughput drift and to the
fixed per-dispatch floor, which cancel in the diffs.

Usage: python scripts/osd_breakdown.py [code] [p] [batch]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops import sampler
from qldpc_tpu.ops.bp import alpha_schedule, decode_batch
from qldpc_tpu.ops.osd import _gather_pack, _pack_columns, osd_batch
from qldpc_tpu.ops.osd_pallas import eliminate_blocks, pick_block_shots
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=8):
    small = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.float32).sum(), fn(*a)))
    jax.device_get(small(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        jax.device_get(small(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "[[144, 12, 12]]"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    maxIter, osd_order = 20, 2
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dz = _make_basis(circ, M, "Z", seq, osd_order=osd_order)
    m, n = dz.H.shape
    K = dz.K
    M_pad = -(-m // 128) * 128
    print(f"{name} p={p} B={B} m={m} n={n} K={K} rank={dz.rank}")

    key = make_key(0)
    out = jax.jit(lambda k: sampler.trial_batch(
        k, p, dz.maps, dz.maps, circ.num_error_locs, batch=B))(key)
    syn = out["syndrome_z"]
    bp = jax.jit(lambda s: decode_batch(dz.graph, s, dz.prior, dz.alpha_seq,
                                        maxIter, msg_dtype=jnp.bfloat16))(syn)
    vals, hard = bp["values"], bp["hard"]

    H, HT, rank, basis_cols = dz.H, dz.HT_bf16, dz.rank, dz.basis_cols
    R = int(basis_cols.shape[0])
    Rp = -(-R // 32) * 32
    KT = K + R
    W_full = -(-KT // 32)
    S = pick_block_shots(M_pad, K // 32)
    while B % S:
        S //= 2
    S_r = min(B, pick_block_shots(M_pad, -(-W_full // 8) * 8))
    print(f"S={S} S_r={S_r} KT={KT}")

    # --- the exact osd_batch pipeline, as resumable stage functions ---
    def st_residual(syn, vals, hard):
        hard_syn = (jnp.dot(hard.astype(jnp.bfloat16), HT,
                            preferred_element_type=jnp.float32)
                    .astype(jnp.int32) & 1)
        return syn.astype(jnp.int32) ^ hard_syn

    def st_sort(syn, vals, hard):
        residual = st_residual(syn, vals, hard)
        colsK = jnp.argsort(jnp.abs(vals), axis=1)[:, :K]
        return residual, colsK

    def st_pack(syn, vals, hard):
        residual, colsK = st_sort(syn, vals, hard)
        packed = _gather_pack(H, colsK, K)
        return residual, colsK, packed

    def st_layout(syn, vals, hard):
        residual, colsK, packed = st_pack(syn, vals, hard)
        HpT = jnp.pad(jnp.transpose(packed, (0, 2, 1)),
                      ((0, 0), (0, 0), (0, M_pad - m)))
        s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))
        return colsK, HpT, s_pad

    def st_elim(syn, vals, hard):
        colsK, HpT, s_pad = st_layout(syn, vals, hard)
        return colsK, HpT, s_pad, eliminate_blocks(
            HpT, s_pad, K, m, block_shots=S, rank=rank)

    def st_full(syn, vals, hard):  # full osd_batch, logical-only output
        return osd_batch(H, HT, syn, vals, hard, K=K, order=osd_order,
                         num_test=dz.num_test, use_pallas=True, rank=rank,
                         basis_cols=basis_cols,
                         logical_pack=dz.logical_pack,
                         return_solution=False)

    def st_full_sol(syn, vals, hard):  # with the (B, n) solution scatter
        return osd_batch(H, HT, syn, vals, hard, K=K, order=osd_order,
                         num_test=dz.num_test, use_pallas=True, rank=rank,
                         basis_cols=basis_cols)

    stages = [("residual matmul", st_residual),
              ("+ argsort/colsK", st_sort),
              ("+ gather+pack", st_pack),
              ("+ transpose/pad layout", st_layout),
              ("+ eliminate prefix", st_elim),
              ("full osd_batch (logical only)", st_full),
              ("full osd_batch (+solution scatter)", st_full_sol)]
    prev = 0.0
    for label, fn in stages:
        dt = timed(label, fn, syn, vals, hard)
        print(f"{'':52s} {'delta':>6s} {max(0, (dt - prev)) * 1e3:8.2f} ms",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
