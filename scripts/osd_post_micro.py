"""Micro-timings of osd_batch's post-elimination ops (synthetic inputs of
the production shapes) — identifies which of the small ops actually cost
milliseconds on v5e. Diffs against a no-op dispatch cancel the fixed floor.

Usage: python scripts/osd_post_micro.py [B] [m] [n] [K] [R]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
m = int(sys.argv[2]) if len(sys.argv) > 2 else 1008
n = int(sys.argv[3]) if len(sys.argv) > 3 else 8785
K = int(sys.argv[4]) if len(sys.argv) > 4 else 1280
R = int(sys.argv[5]) if len(sys.argv) > 5 else 930
M = -(-m // 128) * 128
KT = K + R

rng = np.random.default_rng(0)
s_red = jnp.asarray(rng.integers(0, 2, (B, M)), jnp.int32)
prow = jnp.asarray(rng.integers(-1, M, (B, KT)), jnp.int32)
colofrow = jnp.asarray(rng.integers(-1, KT, (B, M)), jnp.int32)
used = jnp.asarray(rng.random((B, M)) < 0.9)
colsE = jnp.asarray(rng.integers(0, n, (B, KT)), jnp.int32)
lp = jnp.asarray(rng.integers(0, 1 << 12, (n,)), jnp.int32)
e_perm = jnp.asarray(rng.integers(0, 2, (B, KT)), jnp.int32)


def timed(name, fn, *args, reps=10):
    small = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.float32).sum(), fn(*a)))
    jax.device_get(small(*args))
    t0 = time.time()
    for _ in range(reps):
        jax.device_get(small(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


timed("noop floor", lambda s: s[:4, :4], s_red)
timed("e0 take_along (B,KT)<-(B,M) lanes",
      lambda s, p: jnp.take_along_axis(s, jnp.maximum(p, 0), axis=1),
      s_red, prow)
timed("prow inversion scatter (B,M)->(B,KT+1)",
      lambda c, u: jnp.full((B, KT + 1), -1, jnp.int32).at[
          jnp.arange(B)[:, None],
          jnp.where(u, c, KT)].set(
          jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M))),
      colofrow, used)
timed("logical gather (n,)->(B,KT) + xor reduce",
      lambda e, c: jax.lax.reduce(
          jnp.where(e > 0, jnp.take(lp, c, axis=0), 0), jnp.int32(0),
          jax.lax.bitwise_xor, (1,)), e_perm, colsE)
timed("unsat row sums x2",
      lambda s, u: (jnp.sum(jnp.where(~u, s, 0), axis=1),
                    jnp.sum(jnp.where(u, s, 0), axis=1)), s_red, used)
timed("argsort full (B,n) f32",
      lambda v: jnp.argsort(jnp.abs(v), axis=1),
      jnp.asarray(rng.normal(size=(B, n)), jnp.float32))
timed("top-K neg via lax.top_k (B,K)",
      lambda v: jax.lax.top_k(-jnp.abs(v), K),
      jnp.asarray(rng.normal(size=(B, n)), jnp.float32))
