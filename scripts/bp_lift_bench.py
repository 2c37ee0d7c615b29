"""Lifted-layout BP vs generic padded-CSR BP on real hardware.

Usage: python scripts/bp_lift_bench.py [code] [p] [batch] [maxIter]
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

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, channel_llrs, get_code
from qldpc_tpu.ops.bp import TannerGraph, alpha_schedule, decode_batch
from qldpc_tpu.ops.bp_lift import LiftedGraph, decode_batch_lift
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas
from qldpc_tpu.utils.caching import compute_cache_key, load_matrices


def timed(name, fn, *args, reps=5):
    small = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.float32).sum(), fn(*a)))
    out = jax.device_get(small(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(small(*args))
    print(f"{name:44s} {(time.time()-t0)/reps*1e3:8.2f} ms")
    return out


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "[[144, 12, 12]]"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    maxIter = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = (load_matrices("/root/reference/matrix_cache", key_c)
         or load_matrices("matrix_cache", key_c))
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
    H = (np.asarray(M["HdecZ"]) != 0).astype(np.uint8)
    prior = jnp.asarray(channel_llrs(M["channel_probsZ"]), jnp.float32)
    lg = LiftedGraph.try_from_dense(H, code.ell, code.m, np.asarray(prior))
    print(f"{name} p={p} B={B} iters={maxIter} H={H.shape} "
          f"lift={'None' if lg is None else f'NB={lg.NB} EB={len(lg.eb_pb)}'}")
    graph = TannerGraph.from_dense(H)
    seq = jnp.asarray(alpha_schedule("dynamical", maxIter))
    rng = np.random.default_rng(0)
    errors = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = jnp.asarray((errors @ H.T) % 2).astype(jnp.int8)

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        timed(f"generic decode_batch {tag}",
              lambda s, d=dt: decode_batch(graph, s, prior, seq, maxIter,
                                           msg_dtype=d), syn)
        if lg is not None:
            timed(f"lifted  decode_batch {tag}",
                  lambda s, d=dt: decode_batch_lift(lg, s, prior, seq,
                                                    maxIter, msg_dtype=d),
                  syn)
            timed(f"pallas  decode_batch {tag}",
                  lambda s, d=dt: decode_batch_lift_pallas(
                      lg, s, prior, seq, maxIter, msg_dtype=d), syn)


if __name__ == "__main__":
    main()
