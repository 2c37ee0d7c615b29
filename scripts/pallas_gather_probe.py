"""Map which tpu.dynamic_gather forms the Mosaic backend accepts.

Tries sublane-axis (take_along_axis axis=0) and lane-axis (axis=1) gathers
at a ladder of shapes, plus int32, and prints compile ok/fail per case.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial


def probe(name, shape, dtype, axis):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype) if np.dtype(dtype).kind == 'f' \
        else jnp.asarray(rng.integers(0, 100, shape), dtype)
    idx = jnp.asarray(rng.integers(0, shape[axis], shape).astype(np.int32))

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(x, idx)
        ref = jnp.take_along_axis(x, idx, axis=axis)
        ok = bool(jnp.all(out == ref))
        print(f"{name:40s} OK  match={ok}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{name:40s} FAIL {type(e).__name__}: {msg}")


def main():
    print("backend:", jax.default_backend())
    for axis in (0, 1):
        for shape in ((8, 128), (16, 128), (64, 128), (256, 128),
                      (1024, 128), (8, 256), (64, 256)):
            for dtype in (jnp.float32, jnp.int32):
                probe(f"axis={axis} {shape} {np.dtype(dtype).name}",
                      shape, dtype, axis)


if __name__ == "__main__":
    main()
