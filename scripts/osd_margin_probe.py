"""Measure where OSD-0 validity is reached in the reliability column order.

OSD-0 needs the residual syndrome (after BP hard decisions) inside the span
of the pivot columns — NOT full rank (the reliability-ordered prefix of a
BB decoding matrix is extremely redundant: its rank grows so slowly that
the rank-930 point of [[144,12,12]] sits beyond column 2000 for essentially
every shot). Once a shot's residual enters the span, s_red freezes and all
later pivots carry correction bit 0, so "all shots valid" is the correct
early-exit condition for the elimination scan.

This probe reports, on real failed-BP shots, the fraction valid within the
first K columns for a K grid — which sets the prefix budget and the
expected depth of a validity-based early exit.

Usage: python scripts/osd_margin_probe.py [code] [p] [batch] [rounds]
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
from qldpc_tpu.ops.osd import _gather_pack
from qldpc_tpu.ops.osd_pallas import eliminate_blocks, pick_block_shots
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)

K_GRID = (256, 512, 768, 1024, 1280, 1536, 2048)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "[[144, 12, 12]]"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    maxIter = 20
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dz = _make_basis(circ, M, "Z", seq, osd_order=2)
    m, n = dz.H.shape
    M_pad = -(-m // 128) * 128
    print(f"{name} p={p} B={B} m={m} n={n} rank={dz.rank}")

    @jax.jit
    def probe(key):
        out = sampler.trial_batch(key, p, dz.maps, dz.maps,
                                  circ.num_error_locs, batch=B)
        syn = out["syndrome_z"]
        bp = decode_batch(dz.graph, syn, dz.prior, dz.alpha_seq, maxIter,
                          msg_dtype=jnp.bfloat16)
        hard_syn = (jnp.dot(bp["hard"].astype(jnp.bfloat16), dz.HT_bf16,
                            preferred_element_type=jnp.float32)
                    .astype(jnp.int32) & 1)
        residual = syn.astype(jnp.int32) ^ hard_syn
        order_idx = jnp.argsort(jnp.abs(bp["values"]), axis=1)
        valids = {}
        for K in K_GRID:
            Kc = min(n, K)
            colsK = order_idx[:, :Kc]
            packed = _gather_pack(dz.H, colsK, Kc)
            HpT = jnp.pad(jnp.transpose(packed, (0, 2, 1)),
                          ((0, 0), (0, 0), (0, M_pad - m)))
            s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))
            S = pick_block_shots(M_pad, HpT.shape[1])
            while B % S:
                S //= 2
            _, s_out, _, used, _ = eliminate_blocks(HpT, s_pad, Kc, m,
                                                 block_shots=S, rank=dz.rank)
            unsat = jnp.sum(jnp.where(~used[:, :m], s_out[:, :m], 0), axis=1)
            valids[K] = unsat == 0
        return valids, bp["converged"]

    key = make_key(0)
    acc = {K: 0 for K in K_GRID}
    unconv = 0
    for r in range(rounds):
        t0 = time.time()
        valids, conv = jax.device_get(probe(jax.random.fold_in(key, r)))
        sel = ~conv
        unconv += int(sel.sum())
        for K in K_GRID:
            acc[K] += int(valids[K][sel].sum())
        print(f"round {r}: {sel.sum()} unconverged, {time.time()-t0:.1f}s")
    print(f"\n{unconv} failed-BP shots")
    for K in K_GRID:
        frac = acc[K] / max(unconv, 1)
        p32 = 1.0 - frac ** 32   # a 32-shot block must scan past K
        p64 = 1.0 - frac ** 64   # a 64-chunk would need a basis rerun
        print(f"K={K:5d}: valid={frac:8.4%}  P(32-block scans past)={p32:7.2%}"
              f"  P(64-chunk not all valid)={p64:7.2%}")


if __name__ == "__main__":
    main()
