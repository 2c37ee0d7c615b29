"""Feasibility probe for a left-looking panel GF(2) eliminator.

(a) Per-column-step cost of eliminate_blocks as a function of word width W
    (fixed 256 steps, no early exit): if cost scales ~linearly with W, a
    panel kernel that touches only 8 words/step (4 panel + 4 transform)
    instead of the full 40 cuts the serial scan ~5x.
(b) Cost of the XLA-side panel-entry update (apply one recorded panel
    transform to a 4-word slab via two batched bf16 MXU matmuls + parity).

Usage: python scripts/osd_panel_probe.py [B] [M]
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

from qldpc_tpu.ops.osd_pallas import eliminate_blocks


def timed(name, fn, *args, reps=10):
    jax.device_get(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    m = M - 16
    rng = np.random.default_rng(0)
    base = None
    for W in (8, 16, 40):
        Hp = jnp.asarray(rng.integers(0, 2**32, (B, W, M), dtype=np.uint64)
                         .astype(np.uint32))
        s = jnp.asarray(rng.integers(0, 2, (B, M)).astype(np.int32))
        K = 256  # fixed step count; rank=m and no valid-exit => full scan

        def run(Hp, s, W=W):
            out = eliminate_blocks(Hp, s, K, m, block_shots=64, rank=m,
                                   exit_on_valid=False)
            return out[1].sum(), out[4].sum()
        _, dt = timed(f"eliminate W={W:2d} K=256 (256 steps, no exit)",
                      jax.jit(run), Hp, s)
        if base is None:
            base = dt
        else:
            print(f"    width scaling vs W=8: {dt / base:.2f}x")

    # (b) XLA panel-entry transform application: cur (B,4,M) words,
    # V (B,4,M) words (128 transform cols), colofrow (B,M) with ~128 pivots
    P = 128
    cur = jnp.asarray(rng.integers(0, 2**32, (B, 4, M), dtype=np.uint64)
                      .astype(np.uint32))
    Vw = jnp.asarray(rng.integers(0, 2**32, (B, 4, M), dtype=np.uint64)
                     .astype(np.uint32))
    cf = jnp.asarray(rng.integers(-1, 200, (B, M)).astype(np.int32))
    cols0 = jnp.arange(P, dtype=jnp.int32)

    def apply_transform(cur, Vw, cf):
        bits = jnp.arange(32, dtype=jnp.int32)
        # unpack cur words -> (B, M, 128) bf16
        cu = ((cur.astype(jnp.int32)[:, :, None, :]
               >> bits[None, None, :, None]) & 1)        # (B,4,32,M)
        cu = cu.reshape(B, P, M).transpose(0, 2, 1).astype(jnp.bfloat16)
        # pivot indicator G (B, P, M) from colofrow
        G = (cf[:, None, :] == cols0[None, :, None]).astype(jnp.bfloat16)
        piv = jnp.einsum("bpm,bmc->bpc", G, cu,
                         preferred_element_type=jnp.float32)  # (B,P,128)
        Vu = ((Vw.astype(jnp.int32)[:, :, None, :]
               >> bits[None, None, :, None]) & 1)
        Vu = Vu.reshape(B, P, M).transpose(0, 2, 1).astype(jnp.bfloat16)
        delta = jnp.einsum("bmp,bpc->bmc", Vu, piv.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        dbits = delta.astype(jnp.int32) & 1                   # (B,M,128)
        # pack back to 4 words
        dw = (dbits.reshape(B, M, 4, 32) << bits[None, None, None, :])
        dw = dw.sum(axis=3).transpose(0, 2, 1)                # (B,4,M)
        return cur ^ jax.lax.bitcast_convert_type(dw, jnp.uint32)

    def run_pair(cur, Vw, cf):
        return apply_transform(cur, Vw, cf).astype(jnp.uint32).sum()
    timed("XLA panel-entry transform (1 pair, B=512)",
          jax.jit(run_pair), cur, Vw, cf)

    def run_6pairs(cur, Vw, cf):
        out = cur
        for i in range(6):
            out = apply_transform(out, Vw, cf + i)
        return out.astype(jnp.uint32).sum()
    timed("XLA panel-entry transform (6 pairs = Q4 total)",
          jax.jit(run_6pairs), cur, Vw, cf)


if __name__ == "__main__":
    main()
