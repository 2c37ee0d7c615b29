"""Same-session incremental breakdown of the FULL decode round.

The tunneled chip's throughput drifts a lot between runs (CLAUDE.md), so
every variant here is timed in ONE session, pipelined exactly like
bench.py (2 in flight), and differences between adjacent variants give
per-stage costs that are actually comparable.

Variants (cumulative): null -> sample -> +BP (both bases) -> +residual
sort -> +OSD chunks -> full round (incl. logical readout).

Usage: python scripts/round_breakdown.py [code] [p] [batch] [inflight]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from collections import deque

import jax
import jax.numpy as jnp

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas
from qldpc_tpu.ops.osd import osd_batch
from qldpc_tpu.ops.sampler import (augmented_bits, fault_bits,
                                   sample_gate_randoms)
from qldpc_tpu.parallel.engine import _make_basis, make_key, make_round_fn
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed_pipelined(name, fn, key, inflight_n=2, reps=30):
    jax.device_get(fn(key))  # compile + warm
    inflight = deque()
    t0 = time.time()
    for i in range(reps):
        while len(inflight) < inflight_n:
            inflight.append(fn(jax.random.fold_in(key, i)))
        jax.device_get(inflight.popleft())
    while inflight:
        jax.device_get(inflight.popleft())
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "[[144, 12, 12]]"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    nfl = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    maxIter = int(os.environ.get("RB_MAXITER", "20"))
    osd_order = 2
    code = get_code(name)
    cycles = code.distance
    circ = SyndromeCircuit(code, num_cycles=cycles)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, cycles, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dec_z = _make_basis(circ, M, "Z", seq, osd_order=osd_order)
    dec_x = _make_basis(circ, M, "X", seq, osd_order=osd_order)
    n_locs = circ.num_error_locs
    print(f"{name} p={p} B={B} inflight={nfl}", flush=True)
    key = make_key(0)

    def stage_fn(level):
        """level: 0 null, 1 sample, 2 +BP, 3 +sort, 4 +OSD, 5 full round"""
        decs = {"z": dec_z, "x": dec_x}

        def run(k):
            if level == 0:
                return jax.random.bits(k, (8,), jnp.uint32).sum()
            err, pauli, cat2 = sample_gate_randoms(k, B, n_locs, p)
            acc = []
            for nm, dec in decs.items():
                bits = fault_bits(err, pauli, cat2, dec.maps, nm.upper())
                aug = augmented_bits(bits, dec.maps)
                syndrome = aug[:, :dec.maps.num_syn]
                true_log = aug[:, dec.maps.num_syn:]
                if level == 1:
                    acc.append(syndrome.sum() + true_log.sum())
                    continue
                bp = decode_batch_lift_pallas(dec.lifted, syndrome,
                                              dec.prior, dec.alpha_seq,
                                              maxIter,
                                              msg_dtype=jnp.float32)
                conv = bp["converged"]
                if level == 2:
                    acc.append(conv.sum() + bp["hard"].sum()
                               + bp["values"].sum())
                    continue
                res_wt = jnp.sum(
                    syndrome.astype(jnp.int32)
                    ^ (jnp.dot(bp["hard"].astype(jnp.bfloat16), dec.HT_bf16,
                               preferred_element_type=jnp.float32)
                       .astype(jnp.int32) & 1), axis=1)
                m_checks = syndrome.shape[1]
                order = jnp.argsort(jnp.where(conv, m_checks + 1, res_wt))
                syn_s = jnp.take(syndrome, order, axis=0)
                vals_s = jnp.take(bp["values"], order, axis=0)
                hard_s = jnp.take(bp["hard"], order, axis=0)
                conv_s = jnp.take(conv, order, axis=0)
                if level == 3:
                    acc.append(syn_s.sum() + vals_s.sum() + hard_s.sum()
                               + conv_s.sum())
                    continue
                chunk = B if B <= 64 else max(64, B // 8)
                deltas = []
                for c0 in range(0, B, chunk):
                    c1 = min(c0 + chunk, B)
                    args = (syn_s[c0:c1], vals_s[c0:c1], hard_s[c0:c1])

                    def run_osd(a):
                        s, v, h = a
                        out = osd_batch(dec.H, dec.HT_bf16, s, v, h,
                                        K=dec.K, order=osd_order,
                                        num_test=dec.num_test,
                                        use_pallas=True, rank=dec.rank,
                                        basis_cols=dec.basis_cols,
                                        logical_pack=dec.logical_pack,
                                        return_solution=False)
                        return (out["logical_delta_packed"],
                                out["rank_deficient"])

                    delta, _ = jax.lax.cond(
                        jnp.any(~conv_s[c0:c1]), run_osd,
                        lambda a: (jnp.zeros(a[2].shape[0], jnp.int32),
                                   jnp.zeros(a[2].shape[0], bool)), args)
                    deltas.append(delta)
                acc.append(jnp.concatenate(deltas).sum() + conv.sum())
            return sum(acc)
        return run

    full = make_round_fn(dec_z, dec_x, n_locs, p, B, maxIter, osd_order)
    full_reduced = jax.jit(
        lambda k: {n: v.sum() for n, v in full(k).items()})

    times = {}
    times[0] = timed_pipelined("null dispatch", jax.jit(stage_fn(0)), key,
                               nfl)
    times[1] = timed_pipelined("sample+syndrome both bases",
                               jax.jit(stage_fn(1)), key, nfl)
    times[2] = timed_pipelined("+ BP both bases", jax.jit(stage_fn(2)),
                               key, nfl)
    times[3] = timed_pipelined("+ residual sort", jax.jit(stage_fn(3)),
                               key, nfl)
    times[4] = timed_pipelined("+ OSD chunks", jax.jit(stage_fn(4)), key,
                               nfl)
    times[5] = timed_pipelined("FULL round (engine round_fn)",
                               full_reduced, key, nfl)
    print(f"\ndeltas: sample {1e3*(times[1]-times[0]):.1f} | "
          f"BP {1e3*(times[2]-times[1]):.1f} | "
          f"sort {1e3*(times[3]-times[2]):.1f} | "
          f"OSD {1e3*(times[4]-times[3]):.1f} | "
          f"readout {1e3*(times[5]-times[4]):.1f} ms")
    print(f"round throughput: {B/times[5]:,.0f} shots/s")


if __name__ == "__main__":
    main()
