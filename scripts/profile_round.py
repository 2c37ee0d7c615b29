"""Per-stage timing of the decode round on real hardware.

Usage: python scripts/profile_round.py [code] [p] [batch] [maxIter]
Times sampling+syndrome, BP alone, and the full round (BP + chunked OSD +
logical readout) separately to show where a round's time goes.
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

from functools import partial

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops import sampler
from qldpc_tpu.ops.bp import alpha_schedule, decode_batch
from qldpc_tpu.ops.bp_lift import decode_batch_lift, decode_batch_lift_layered
from qldpc_tpu.ops.bp_lift_pallas import (decode_batch_lift_pallas,
                                          viable_block_b)
from qldpc_tpu.ops.osd import osd_batch
from qldpc_tpu.parallel.engine import _make_basis, make_round_fn
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=5):
    # device_get, not block_until_ready: the remote backend's block has
    # been observed returning early, which silently inflates throughput.
    # Large outputs skew remote-tunnel timing, so fn should reduce
    # big arrays to scalars on device before returning.
    out = jax.device_get(fn(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "[[144, 12, 12]]"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    maxIter = int(sys.argv[4]) if len(sys.argv) > 4 else 20
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
    dz = _make_basis(circ, M, "Z", seq, osd_order=osd_order)
    dx = _make_basis(circ, M, "X", seq, osd_order=osd_order)
    print(f"{name} p={p} B={B} n={dz.graph.n} m={dz.graph.m} "
          f"dr={dz.graph.dr} K={dz.K}")
    from qldpc_tpu.parallel.engine import make_key
    key = make_key(0)

    use_pallas = jax.default_backend() != "cpu"
    # decoder bundles travel as jit ARGUMENTS (baked closure constants
    # exceed the remote-compile request limit for [[288]], HTTP 413)
    samp = jax.jit(lambda k, mz, mx: sampler.trial_batch(
        k, p, mz, mx, circ.num_error_locs, batch=B))
    out, _ = timed("sample + syndrome (both bases)",
                   lambda k, mz, mx: {n: v.sum() for n, v in
                                      samp(k, mz, mx).items()},
                   key, dz.maps, dx.maps)
    syn_z = samp(key, dz.maps, dx.maps)["syndrome_z"]

    def bp_small(s, d, dt):  # reduce outputs on device: honest remote timing
        r = decode_batch(d.graph, s, d.prior, d.alpha_seq, maxIter,
                         msg_dtype=dt)
        return (r["converged"].sum(), r["hard"].sum(), r["values"].sum(),
                r["iterations"].max())
    bp_out, _ = timed("BP Z-basis f32",
                      jax.jit(partial(bp_small, dt=jnp.float32)), syn_z, dz)
    conv = float(bp_out[0]) / B
    print(f"{'':34s} (BP Z convergence {conv:.2%})")
    bp_out, _ = timed("BP Z-basis bf16",
                      jax.jit(partial(bp_small, dt=jnp.bfloat16)), syn_z, dz)
    print(f"{'':34s} (BP Z bf16 convergence {float(bp_out[0]) / B:.2%})")

    if dz.lifted is not None:
        def bp_lift_small(s, d, dt):
            r = decode_batch_lift(d.lifted, s, d.prior, d.alpha_seq,
                                  maxIter, msg_dtype=dt)
            return (r["converged"].sum(), r["hard"].sum(),
                    r["values"].sum(), r["iterations"].max())
        timed("BP Z lifted bf16",
              jax.jit(partial(bp_lift_small, dt=jnp.bfloat16)), syn_z, dz)

        def bp_layer_small(s, d, dt):
            r = decode_batch_lift_layered(d.lifted, s, d.prior, d.alpha_seq,
                                          maxIter, msg_dtype=dt)
            return (r["converged"].sum(), r["hard"].sum(),
                    r["values"].sum(), r["iterations"].max())
        bp_out, _ = timed("BP Z layered f32 (XLA)",
                          jax.jit(partial(bp_layer_small, dt=jnp.float32)),
                          syn_z, dz)
        print(f"{'':34s} (layered convergence "
              f"{float(bp_out[0]) / B:.2%})")
        if use_pallas and viable_block_b(dz.lifted, B=B) is not None:
            def bp_pallas_small(s, d, dt):
                r = decode_batch_lift_pallas(d.lifted, s, d.prior,
                                             d.alpha_seq, maxIter,
                                             msg_dtype=dt)
                return (r["converged"].sum(), r["hard"].sum(),
                        r["values"].sum(), r["iterations"].max())
            bp_out, _ = timed("BP Z pallas f32 (engine path)",
                              jax.jit(partial(bp_pallas_small,
                                              dt=jnp.float32)), syn_z, dz)
            print(f"{'':34s} (pallas convergence "
                  f"{float(bp_out[0]) / B:.2%})")

    def osd_small(s, v, h, d):
        r = osd_batch(d.H, d.HT_bf16, s, v, h, K=d.K, order=osd_order,
                      num_test=d.num_test, use_pallas=use_pallas,
                      rank=d.rank)
        return (r["solution"].sum(), r["valid"].sum(),
                r["rank_deficient"].sum())
    bp_full = jax.jit(lambda s, d: decode_batch(
        d.graph, s, d.prior, d.alpha_seq, maxIter, msg_dtype=jnp.bfloat16))
    r = bp_full(syn_z, dz)
    # keep inputs resident on device: host->device transfer of the 18MB
    # posterior array would otherwise dominate the remote-tunnel timing
    vals, hard = r["values"], r["hard"]
    out, _ = timed("OSD Z-basis (full batch)", jax.jit(osd_small),
                   syn_z, vals, hard, dz)
    print(f"{'':34s} (OSD valid {float(out[1]) / B:.2%}, "
          f"rank_deficient {int(out[2])})")

    full = jax.jit(make_round_fn(dz, dx, circ.num_error_locs, p, B,
                                 maxIter, osd_order))
    _, dt = timed("FULL round (both bases + OSD)", full, key, dz, dx)
    print(f"round throughput: {B / dt:,.0f} shots/s")


if __name__ == "__main__":
    main()
