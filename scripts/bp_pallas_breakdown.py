"""Decompose the Pallas lifted-BP stage cost on hardware.

Times (each incl. the fixed dispatch floor; a null dispatch is printed to
subtract): syndrome prep alone, the pallas kernel at maxIter in {1, 20}
with outputs reduced on device, and the full wrapper (adds the posterior
gather + masks + transposes). Usage: python scripts/bp_pallas_breakdown.py
[code] [p] [batch]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops import sampler
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=10):
    out = jax.device_get(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "[[144, 12, 12]]"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    maxIter = 20
    code = get_code(name)
    cycles = code.distance
    circ = SyndromeCircuit(code, num_cycles=cycles)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, cycles, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dz = _make_basis(circ, M, "Z", seq, osd_order=2)
    dx = _make_basis(circ, M, "X", seq, osd_order=2)
    g = dz.lifted
    print(f"{name} B={B} ell={g.ell} mm={g.mm} T={g.T} NB={g.NB} "
          f"EB={len(g.eb_pb)}")
    key = make_key(0)
    samp = jax.jit(lambda k: sampler.trial_batch(
        k, p, dz.maps, dx.maps, circ.num_error_locs, batch=B))
    syn = jax.device_get(samp(key)["syndrome_z"])
    syn = jnp.asarray(syn)

    timed("null dispatch (floor)", jax.jit(lambda s: s.sum()), syn)

    def prep(s):
        sg = s.T.reshape(g.T, g.ell, g.mm, B).transpose(1, 2, 0, 3)
        return sg.astype(jnp.int32).sum()
    timed("syndrome prep alone", jax.jit(prep), syn)

    def full(s, mi):
        r = decode_batch_lift_pallas(g, s, dz.prior, seq, mi,
                                     msg_dtype=jnp.float32)
        return (r["converged"].sum(), r["hard"].sum(), r["values"].sum(),
                r["iterations"].max())
    _, t1 = timed("full wrapper maxIter=1",
                  jax.jit(lambda s: full(s, 1)), syn)
    _, t20 = timed("full wrapper maxIter=20",
                   jax.jit(lambda s: full(s, 20)), syn)
    print(f"  -> per-iteration cost {1e3 * (t20 - t1) / 19:.3f} ms")

    # kernel with the posterior gather replaced by an on-device sum of the
    # raw grid output: isolates the wrapper postprocessing
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from qldpc_tpu.ops.bp_lift_pallas import _bp_kernel

    def kernel_only(s, mi):
        dt = jnp.float32
        ell, mm, T, NB, EB = g.ell, g.mm, g.T, g.NB, len(g.eb_pb)
        Bb = 128
        syn_grid = s.T.reshape(T, ell, mm, B).transpose(1, 2, 0, 3)
        syn_grid = syn_grid.astype(jnp.int32)
        prior_in = g.prior_grid[..., None]
        cmask_in = g.cmask[..., None].astype(jnp.float32)
        alpha_in = seq.astype(jnp.float32)
        meta = (g.eb_pb, g.eb_cx, g.eb_cy, g.eb_o, NB)
        kernel = functools.partial(_bp_kernel, meta, mi, 20.0, dt)
        vals, done, iters = pl.pallas_call(
            kernel,
            grid=(B // Bb,),
            in_specs=[
                pl.BlockSpec((ell, mm, T, Bb), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, ell, mm, T, 1), lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((EB, ell, mm, T, 1), lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((NB, ell, mm, T, Bb), lambda i: (0, 0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NB, ell, mm, T, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((EB, ell, mm, T, Bb), dt),
                pltpu.VMEM((NB, ell, mm, T, Bb), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 << 20),
        )(syn_grid, prior_in, cmask_in, alpha_in)
        return vals.sum(), done.sum(), iters.max()

    _, k1 = timed("kernel-only maxIter=1",
                  jax.jit(lambda s: kernel_only(s, 1)), syn)
    _, k20 = timed("kernel-only maxIter=20",
                   jax.jit(lambda s: kernel_only(s, 20)), syn)
    print(f"  -> kernel per-iteration {1e3 * (k20 - k1) / 19:.3f} ms")
    print(f"  -> wrapper postprocess (full20 - kernel20) "
          f"{1e3 * (t20 - k20):.2f} ms")


if __name__ == "__main__":
    main()
