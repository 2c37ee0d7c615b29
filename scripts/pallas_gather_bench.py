"""Feasibility/throughput probe for Mosaic `tpu.dynamic_gather` (sublane axis).

The fused-BP-kernel design keeps edge messages VMEM-resident across all
iterations; its viability hinges on how fast an in-kernel dynamic gather
along the sublane axis runs (jnp.take_along_axis(x, idx, axis=0), which
Mosaic lowers to tpu.dynamic_gather — jax/_src/pallas/mosaic/lowering.py
_gather_lowering_rule requires idx.shape == x.shape == out.shape).

Measures: in-kernel gather GB/s vs rows, vs the XLA jnp.take equivalent.
Run on the real chip: `python scripts/pallas_gather_bench.py`.
"""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, reps=20):
    out = jax.device_get(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args))
    return (time.time() - t0) / reps, out


def gather_kernel(iters: int, x_ref, idx_ref, out_ref):
    def body(_, acc):
        y = jnp.take_along_axis(acc, idx_ref[:], axis=0)
        return y + 1.0
    y = jax.lax.fori_loop(0, iters, body, x_ref[:])
    out_ref[:] = jnp.sum(y, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("iters",))
def pallas_gather(x, idx, iters):
    return pl.pallas_call(
        partial(gather_kernel, iters),
        out_shape=jax.ShapeDtypeStruct((1, x.shape[1]), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


@partial(jax.jit, static_argnames=("iters",))
def xla_gather(x, idx_vec, iters):
    def body(_, acc):
        return jnp.take(acc, idx_vec, axis=0) + 1.0
    y = jax.lax.fori_loop(0, iters, body, x)
    return jnp.sum(y, axis=0, keepdims=True)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    ITERS = 30
    for dtype in (jnp.float32, jnp.bfloat16):
        for rows, lanes in ((1024, 128), (8192, 128), (32768, 128),
                            (8192, 512), (35280, 128)):
            x = jnp.asarray(rng.standard_normal((rows, lanes)), dtype)
            idx_vec = rng.integers(0, rows, size=rows).astype(np.int32)
            idx = jnp.asarray(np.broadcast_to(idx_vec[:, None], (rows, lanes)))
            bytes_per = rows * lanes * x.dtype.itemsize
            try:
                dt, _ = timed(pallas_gather, x, idx, ITERS)
                gbs = bytes_per * ITERS / dt / 1e9
                print(f"pallas {np.dtype(dtype).name:9s} ({rows:6d},{lanes:4d}) "
                      f"{dt*1e3:8.3f} ms  {gbs:8.1f} GB/s-equiv")
            except Exception as e:  # noqa: BLE001
                print(f"pallas {np.dtype(dtype).name:9s} ({rows:6d},{lanes:4d}) "
                      f"FAILED: {type(e).__name__}: {str(e)[:200]}")
            dt, _ = timed(xla_gather, x, jnp.asarray(idx_vec), ITERS)
            gbs = bytes_per * ITERS / dt / 1e9
            print(f"xla    {np.dtype(dtype).name:9s} ({rows:6d},{lanes:4d}) "
                  f"{dt*1e3:8.3f} ms  {gbs:8.1f} GB/s-equiv")


if __name__ == "__main__":
    main()
