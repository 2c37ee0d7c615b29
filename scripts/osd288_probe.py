"""[[288]] OSD elimination probe: exit depths, width scaling, staged scan.

The [[288,12,18]] round is OSD-dominated (scripts/profile_round.py r4:
OSD 491ms vs BP 46ms at B=256 mi20). This probe measures, on real failed
shots at p=0.005:
  1. the validity-exit column-depth distribution (how deep the scan really
     goes — [[144]]'s is tiny, mean ~78; [[288]] was never measured),
  2. elimination time vs packed word width (full K=3072 vs truncated
     prefixes) — the [[144]] "width-independent step" folklore may break at
     M=2944, W=96 where one tail pass is ~9MB,
  3. prefix coverage: what fraction of shots a K1-column stage-1 scan
     covers (candidate two-stage design: narrow scan + cond-gated full
     rerun for the rare uncovered shots),
  4. flooding vs layered BP posteriors: better ordering => earlier exit.

Usage: python scripts/osd288_probe.py [batch] [maxIter]
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
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.ops.bp_lift import decode_batch_lift, decode_batch_lift_layered
from qldpc_tpu.ops.osd import _gather_pack
from qldpc_tpu.ops.osd_pallas import eliminate_blocks, pick_block_shots
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=3):
    out = jax.device_get(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mi = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    p = 0.005
    code = get_code("[[288, 12, 18]]")
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", mi)
    dz = _make_basis(circ, M, "Z", seq)
    m, n = dz.H.shape
    K = dz.K
    Kp = -(-K // 32) * 32
    M_pad = -(-m // 128) * 128
    W = Kp // 32
    S = pick_block_shots(M_pad, W)
    while B % S:
        S //= 2
    print(f"[[288]] p={p} B={B} mi={mi} m={m} K={K} W={W} M_pad={M_pad} "
          f"S={S} rank={dz.rank}")

    key = make_key(0)
    samp = jax.jit(lambda k, mz: sampler.trial_batch(
        k, p, mz, mz, circ.num_error_locs, batch=B))
    syn = samp(key, dz.maps)["syndrome_z"]

    bp_flood = jax.jit(lambda s, d: decode_batch_lift(
        d.lifted, s, d.prior, d.alpha_seq, mi, msg_dtype=jnp.bfloat16))
    bp_layer = jax.jit(lambda s, d: decode_batch_lift_layered(
        d.lifted, s, d.prior, d.alpha_seq, mi, msg_dtype=jnp.float32))

    @jax.jit
    def prep(s, vals, hard, d):
        """Residual + reliability order + gather/pack (osd_batch internals)."""
        hard_syn = (jnp.dot(hard.astype(jnp.bfloat16), d.HT_bf16,
                            preferred_element_type=jnp.float32)
                    .astype(jnp.int32) & 1)
        residual = s.astype(jnp.int32) ^ hard_syn
        order_idx = jnp.argsort(jnp.abs(vals), axis=1)
        colsK = order_idx[:, :K]
        packed = _gather_pack(d.H, colsK, Kp, words_major=True)
        HpT = jnp.pad(packed, ((0, 0), (0, 0), (0, M_pad - m)))
        s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))
        return HpT, s_pad

    def elim_stats(HpT, s_pad, Kx, Sx):
        hp, s_red, prow, used, cf = eliminate_blocks(
            HpT[:, :(-(-Kx // 32)), :], s_pad, Kx, m, block_shots=Sx,
            rank=dz.rank)
        unsat = jnp.sum(jnp.where(~used[:, :m], s_red[:, :m], 0), axis=1)
        depth = jnp.max(jnp.where(used, cf, -1), axis=1)  # deepest pivot col
        return unsat, depth

    for label, bp_fn in (("flooding-bf16", bp_flood),
                         ("layered-f32", bp_layer)):
        r = bp_fn(syn, dz)
        conv = float(jnp.sum(r["converged"])) / B
        print(f"--- {label} mi={mi}: converged {conv:.1%}")
        HpT, s_pad = jax.jit(prep)(syn, r["values"], r["hard"], dz)
        HpT.block_until_ready()
        _, t_prep = timed("  prep: residual+sort+gather/pack",
                          lambda a, b, c, d: jnp.sum(prep(a, b, c, d)[0]),
                          syn, r["values"], r["hard"], dz)
        (unsat, depth), _ = timed(
            f"  eliminate full K={K} S={S}",
            jax.jit(lambda h, s: elim_stats(h, s, K, S)), HpT, s_pad)
        d = np.asarray(depth)
        print(f"    exit depth: mean={d.mean():.0f} p50={np.percentile(d, 50):.0f} "
              f"p90={np.percentile(d, 90):.0f} max={d.max()} "
              f"uncovered={(np.asarray(unsat) != 0).sum()}/{B}")
        for K1 in (768, 1536):
            (u1, d1), _ = timed(
                f"  eliminate prefix K1={K1} S={S}",
                jax.jit(lambda h, s, k=K1: elim_stats(h, s, k, S)),
                HpT, s_pad)
            print(f"    K1={K1}: uncovered {(np.asarray(u1) != 0).sum()}/{B}")
        # wider blocks at narrow width (fewer blocks, each more shots)
        if B % 32 == 0:
            (u2, d2), _ = timed(
                f"  eliminate prefix K1=768 S=32",
                jax.jit(lambda h, s: elim_stats(h, s, 768, 32)), HpT, s_pad)
            print(f"    K1=768 S=32: uncovered {(np.asarray(u2) != 0).sum()}/{B}")


if __name__ == "__main__":
    main()
