"""Hardware validation of the round-4 VMEM BP kernel (both schedules).

Mosaic has miscompiled composed-but-individually-correct kernels before
(bf16, see CLAUDE.md), so every kernel rebuild is checked ON CHIP against
the XLA lift decoders: hard/converged/iterations must match exactly,
posteriors of unconverged shots to FMA rounding (converged shots' values
are post-convergence by design — see ops/bp_lift_pallas.py docstring).

Usage: python scripts/bp_kernel_hwcheck.py [code] [p] [batch] [maxIter]
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
from qldpc_tpu.ops.bp_lift_pallas import (decode_batch_lift_pallas,
                                          viable_block_b)
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def compare(tag, a, b, B):
    ok = True
    for k in ("converged", "iterations", "hard"):
        if not np.array_equal(np.asarray(a[k]), np.asarray(b[k])):
            d = (np.asarray(a[k]) != np.asarray(b[k]))
            print(f"  {tag}: MISMATCH {k} ({d.sum()} elems)")
            ok = False
    conv = np.asarray(a["converged"])
    va = np.asarray(a["values"])[~conv]
    vb = np.asarray(b["values"])[~conv]
    if va.size:
        rel = np.abs(va - vb) / np.maximum(np.abs(va), 1e-9)
        if rel.max() >= 1e-2:
            print(f"  {tag}: MISMATCH unconverged values rel={rel.max():.3g}")
            ok = False
    print(f"  {tag}: {'OK' if ok else 'FAILED'} "
          f"(conv {conv.mean():.1%})")
    return ok


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "[[144, 12, 12]]"
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.004
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    mi = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", mi)
    dz = _make_basis(circ, M, "Z", seq)
    bb = viable_block_b(dz.lifted, B=B)
    print(f"{name} p={p} B={B} mi={mi} viable_block={bb}")
    assert bb is not None

    key = make_key(0)
    samp = jax.jit(lambda k, mz: sampler.trial_batch(
        k, p, mz, mz, circ.num_error_locs, batch=B))
    syn = samp(key, dz.maps)["syndrome_z"]

    all_ok = True
    for sched, xla_fn in (
            ("flooding", lambda s, d: decode_batch_lift(
                d.lifted, s, d.prior, d.alpha_seq, mi,
                msg_dtype=jnp.float32)),
            ("layered", lambda s, d: decode_batch_lift_layered(
                d.lifted, s, d.prior, d.alpha_seq, mi,
                msg_dtype=jnp.float32))):
        a = jax.jit(xla_fn)(syn, dz)
        pal = jax.jit(lambda s, d, sch=sched: decode_batch_lift_pallas(
            d.lifted, s, d.prior, d.alpha_seq, mi, msg_dtype=jnp.float32,
            schedule=sch))
        b = pal(syn, dz)
        all_ok &= compare(sched, jax.device_get(a), jax.device_get(b), B)
        # timing (device-reduced outputs; best of 3)
        small = jax.jit(lambda s, d, sch=sched: [
            v.sum() for v in decode_batch_lift_pallas(
                d.lifted, s, d.prior, d.alpha_seq, mi,
                msg_dtype=jnp.float32, schedule=sch).values()])
        jax.device_get(small(syn, dz))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.device_get(small(syn, dz))
            ts.append(time.time() - t0)
        print(f"  {sched}: kernel {min(ts) * 1e3:.2f} ms (B={B}, mi={mi})")
    print("ALL OK" if all_ok else "FAILURES PRESENT")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
