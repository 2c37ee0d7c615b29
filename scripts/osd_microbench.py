"""OSD stage-cost breakdown on real hardware.

Times the OSD sub-stages separately on real failed-BP posteriors: the
reliability argsort, the per-shot column gather + bit-pack, the VMEM
elimination kernel (with and without the validity early exit), and the full
osd_batch — so optimization goes where the time is.

Usage: python scripts/osd_microbench.py [code] [p] [batch]
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
from qldpc_tpu.ops.osd import _gather_pack, osd_batch
import numpy as _np


def _gather_pack_T(HTu8, colsK, Kp, chunk=512):
    """NEGATIVE EXPERIMENT (moved out of the package): transposed-layout
    gather+pack — ~2x slower than _gather_pack + transpose on v5e."""
    import jax.numpy as jnp
    B, K = colsK.shape
    m = HTu8.shape[1]
    out = []
    for c0 in range(0, Kp, chunk):
        c1 = min(c0 + chunk, Kp)
        if c0 >= K:
            out.append(jnp.zeros((B, (c1 - c0) // 32, m), jnp.uint32))
            continue
        idx = colsK[:, c0:min(c1, K)]
        G = jnp.take(HTu8, idx, axis=0)
        if c1 > K:
            G = jnp.pad(G, ((0, 0), (0, c1 - K), (0, 0)))
    
        c = G.shape[1]
        w8 = jnp.asarray(1 << _np.arange(8, dtype=_np.uint32), jnp.uint8)
        P8 = jnp.sum(G.reshape(B, c // 8, 8, m) * w8[None, None, :, None],
                     axis=2, dtype=jnp.uint8)
        w32 = jnp.asarray([1, 1 << 8, 1 << 16, 1 << 24], jnp.uint32)
        P32 = jnp.sum(P8.reshape(B, c // 32, 4, m).astype(jnp.uint32)
                      * w32[None, None, :, None], axis=2)
        out.append(P32)
    return jnp.concatenate(out, axis=1)

from qldpc_tpu.ops.osd_pallas import eliminate_blocks, pick_block_shots
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=5):
    small = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.float32).sum(), fn(*a)))
    out = jax.device_get(small(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(small(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.2f} ms")
    return out, dt


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
    print(f"{name} p={p} B={B} m={m} n={n} K={K} rank={dz.rank} "
          f"basis={int(dz.basis_cols.shape[0])}")

    key = make_key(0)
    out = jax.jit(lambda k: sampler.trial_batch(
        k, p, dz.maps, dz.maps, circ.num_error_locs, batch=B))(key)
    syn = out["syndrome_z"]
    bp = jax.jit(lambda s: decode_batch(dz.graph, s, dz.prior, dz.alpha_seq,
                                        maxIter, msg_dtype=jnp.bfloat16))(syn)
    vals, hard = bp["values"], bp["hard"]
    print(f"BP convergence: {float(bp['converged'].mean()):.2%}")

    hard_syn = (jnp.dot(hard.astype(jnp.bfloat16), dz.HT_bf16,
                        preferred_element_type=jnp.float32)
                .astype(jnp.int32) & 1)
    residual = jax.jit(lambda s, h: s.astype(jnp.int32) ^ h)(syn, hard_syn)

    timed("argsort |llr| (B, n)",
          jax.jit(lambda v: jnp.argsort(jnp.abs(v), axis=1)), vals)
    colsK = jax.jit(lambda v: jnp.argsort(jnp.abs(v), axis=1)[:, :K])(vals)
    timed("gather+pack K cols (col-gather)",
          jax.jit(lambda c: _gather_pack(dz.H, c, K)), colsK)
    timed("gather+pack K cols (row-gather T)",
          jax.jit(lambda c: _gather_pack_T(
              dz.H.T.astype(jnp.uint8), c, K)), colsK)

    packed = _gather_pack(dz.H, colsK, K)
    R = int(dz.basis_cols.shape[0])
    Rp = -(-R // 32) * 32
    Hb = jnp.pad(jnp.take(dz.H.astype(jnp.uint8), dz.basis_cols, axis=1),
                 ((0, 0), (0, Rp - R)))
    from qldpc_tpu.ops.osd import _pack_columns
    basis_words = jnp.broadcast_to(_pack_columns(Hb)[None], (B, m, Rp // 32))
    packed_full = jnp.concatenate([packed, basis_words], axis=-1)
    KT = K + R

    for label, pk, kk in (("prefix-only", packed, K),
                          ("prefix+basis", packed_full, KT)):
        HpT = jnp.pad(jnp.transpose(pk, (0, 2, 1)),
                      ((0, 0), (0, 0), (0, M_pad - m)))
        s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))
        S = pick_block_shots(M_pad, HpT.shape[1])
        while B % S:
            S //= 2
        for ev in (False, True):
            tag = "valid-exit" if ev else "full-scan "
            timed(f"eliminate {label} W={HpT.shape[1]:3d} {tag}",
                  jax.jit(lambda h, s, kk=kk, S=S, ev=ev: eliminate_blocks(
                      h, s, kk, m, block_shots=S, rank=dz.rank,
                      exit_on_valid=ev)[1]), HpT, s_pad)

    timed("osd_batch (order=2, pallas)",
          jax.jit(lambda s, v, h: osd_batch(
              dz.H, dz.HT_bf16, s, v, h, K=K, order=osd_order,
              num_test=dz.num_test, use_pallas=True, rank=dz.rank,
              basis_cols=dz.basis_cols)["solution"]), syn, vals, hard)


if __name__ == "__main__":
    main()
