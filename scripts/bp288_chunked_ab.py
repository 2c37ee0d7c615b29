"""NEGATIVE RESULT (kept as the evidence record): [[288,12,18]] BP cannot
ride the VMEM Pallas kernel at ANY batch on v5e.

The idea under test was running whole-batch 64-shot kernel calls under
lax.map when no Mosaic-legal batch block exists at the full batch. The
compiler's verdict (2026-08-21): VMEM OOM — "Used 178.91M of 128.00M" —
because the batch rides the minor (lane) axis and Mosaic pads it to a full
128-lane tile, so a 64-shot call allocates the 128-shot state plus
double-buffered windows. Sub-128 chunks therefore NEVER cost less than a
128 block, and [[288]]'s 128-shot state exceeds the chip's entire VMEM.
viable_block_b now budgets small batches at the padded width and the
engine keeps the XLA lift path for such graphs.

Usage: python scripts/bp288_chunked_ab.py [B] [maxIter]
(will fail to compile the chunked variant on [[288]] — that is the point;
on graphs with a legal block it cross-checks hardware equivalence and
timing of chunked-vs-XLA.)
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
from qldpc_tpu.ops.bp_lift import decode_batch_lift
from qldpc_tpu.ops.bp_lift_pallas import (decode_batch_lift_pallas,
                                          viable_block_b)
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=6):
    out = jax.device_get(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    maxIter = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    name, p = "[[288, 12, 18]]", 0.005
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        print("building matrices (slow for [[288]]) ...", flush=True)
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dz = _make_basis(circ, M, "Z", seq, osd_order=2)
    print(f"B={B} full-block viable: {viable_block_b(dz.lifted, B=B)}",
          flush=True)

    key = make_key(0)
    # large arrays travel as jit ARGUMENTS, never closure constants — the
    # [[288]] signature matrix baked into the HLO exceeds the remote
    # compile service's request limit (HTTP 413; same rule as
    # engine.make_round_fn's docstring)
    samp = jax.jit(lambda k, mz: sampler.trial_batch(
        k, p, mz, mz, circ.num_error_locs, batch=B))
    syn = samp(key, dz.maps)["syndrome_z"]

    def xla_path(s, g, prior, seq):
        return decode_batch_lift(g, s, prior, seq, maxIter,
                                 msg_dtype=jnp.bfloat16)

    c = 64  # the chunk size whose padded state OOMed (see docstring)

    def chunked_vmem(s, g, prior, seq):
        bp = jax.lax.map(
            lambda sc: decode_batch_lift_pallas(
                g, sc, prior, seq, maxIter, msg_dtype=jnp.float32),
            s.reshape(B // c, c, s.shape[1]))
        return jax.tree.map(lambda v: v.reshape((B,) + v.shape[2:]), bp)

    def xla_f32(s, g, prior, seq):  # exactness control: kernel dtype
        return decode_batch_lift(g, s, prior, seq, maxIter,
                                 msg_dtype=jnp.float32)

    args = (syn, dz.lifted, dz.prior, dz.alpha_seq)
    out_pl, dt_pl = timed(f"chunked VMEM kernel (c={c}, f32)",
                          jax.jit(chunked_vmem), *args)
    out_x32, _ = timed("XLA lift (f32, exactness control)",
                       jax.jit(xla_f32), *args)
    out_xla, dt_x = timed("XLA lift (bf16, engine fallback)",
                          jax.jit(xla_path), *args)

    same_conv = np.array_equal(out_pl["converged"], out_x32["converged"])
    same_hard = np.array_equal(out_pl["hard"], out_x32["hard"])
    print(f"hardware equivalence vs XLA f32: conv={same_conv} "
          f"hard={same_hard}")
    print(f"conv rate: vmem {np.mean(out_pl['converged']):.3f}  "
          f"xla-bf16 {np.mean(out_xla['converged']):.3f}")
    print(f"speedup vs engine fallback: {dt_x / dt_pl:.2f}x")
    if not (same_conv and same_hard):
        raise SystemExit("HARDWARE MISMATCH — do not enable this path")


if __name__ == "__main__":
    main()
