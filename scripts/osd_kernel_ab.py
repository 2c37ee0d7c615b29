"""A/B the eliminator kernel v1 (original) vs v2 (augmented syndrome +
unrolled steps) on REAL BP-failed shots: bit-exact output check on hardware
(Mosaic has miscompiled composed kernels that pass interpret mode before —
CLAUDE.md) + same-session timing.

Usage: python scripts/osd_kernel_ab.py [unroll ...]
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

import qldpc_tpu.ops.osd_pallas as osd_pallas
from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas
from qldpc_tpu.ops.osd import osd_batch
from qldpc_tpu.ops import sampler
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=10):
    out = jax.device_get(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    name = "[[144, 12, 12]]"
    p, B, maxIter = 0.004, 512, 20
    code = get_code(name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dz = _make_basis(circ, M, "Z", seq, osd_order=2)
    dx = _make_basis(circ, M, "X", seq, osd_order=2)
    key = make_key(0)
    samp = jax.jit(lambda k: sampler.trial_batch(
        k, p, dz.maps, dx.maps, circ.num_error_locs, batch=B))
    syn = samp(key)["syndrome_z"]
    bp = jax.jit(lambda s: decode_batch_lift_pallas(
        dz.lifted, s, dz.prior, dz.alpha_seq, maxIter,
        msg_dtype=jnp.float32))(syn)
    conv = np.asarray(bp["converged"])
    res_wt = np.asarray(jnp.sum(
        syn.astype(jnp.int32)
        ^ (jnp.dot(bp["hard"].astype(jnp.bfloat16), dz.HT_bf16,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
           & 1), axis=1))
    order = np.argsort(np.where(conv, 10000, res_wt))
    syn_s = jnp.asarray(np.asarray(syn)[order])
    vals_s = jnp.asarray(np.asarray(bp["values"])[order])
    hard_s = jnp.asarray(np.asarray(bp["hard"])[order])
    print(f"BP converged {conv.mean():.1%} -> OSD on full sorted batch",
          flush=True)

    def run_osd():
        return osd_batch(dz.H, dz.HT_bf16, syn_s, vals_s, hard_s, K=dz.K,
                         order=2, num_test=dz.num_test, use_pallas=True,
                         rank=dz.rank, basis_cols=dz.basis_cols,
                         logical_pack=dz.logical_pack,
                         return_solution=False)

    outs = {}
    # args: kernel versions to compare against v1; "2" may carry an unroll
    # as "2:u" (default 4); "3" is the dual-block interleave
    variants = [(1, None)]
    for a in sys.argv[1:] or ["3"]:
        if ":" in a:
            v, u = a.split(":")
            variants.append((int(v), int(u)))
        else:
            variants.append((int(a), None))
    for ver, unroll in variants:
        osd_pallas._KERNEL_VERSION = ver
        tag = f"v{ver}" + (f"-u{unroll}" if unroll else "")
        # change unroll by rebinding the kwarg through a wrapper
        if ver == 2 and unroll is not None:
            orig = osd_pallas._elim_kernel_v2

            def k2(*a, _orig=orig, _u=unroll, **kw):
                kw["unroll"] = _u
                return _orig(*a, **kw)

            osd_pallas._elim_kernel_v2 = k2
        try:
            jax.clear_caches()
            outs[tag], dt = timed(f"osd_batch Z-basis [{tag}]", run_osd,
                                  reps=8)
        finally:
            if ver == 2 and unroll is not None:
                osd_pallas._elim_kernel_v2 = orig

    ref = outs[f"v1"]
    for tag, got in outs.items():
        if tag == "v1":
            continue
        ok = all(np.array_equal(np.asarray(ref[k]), np.asarray(got[k]))
                 for k in ("logical_delta_packed", "valid", "rank_deficient"))
        print(f"{tag} output bit-exact vs v1: {ok}")
        if not ok:
            for k in ("logical_delta_packed", "valid", "rank_deficient"):
                d = int((np.asarray(ref[k]) != np.asarray(got[k])).sum())
                print(f"  {k}: {d} mismatches")


if __name__ == "__main__":
    main()
