"""Sweep the eliminator's shot-block size on REAL BP-failed shots.

Total elimination time = sum over blocks of (block's exit depth x step
latency): smaller blocks exit at their own sorted depth instead of the
chunk max, but pay more fixed per-step latency blocks. Same-session sweep
to find the sweet spot. Usage: python scripts/osd_blockshots_sweep.py
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
    jax.device_get(fn(*args))
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
    print(f"BP converged {conv.mean():.1%}; sweeping eliminator block size "
          f"on the sorted unconverged batch", flush=True)
    # sort unconverged-first by residual weight, engine-style
    res_wt = np.asarray(jnp.sum(
        syn.astype(jnp.int32)
        ^ (jnp.dot(bp["hard"].astype(jnp.bfloat16), dz.HT_bf16,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
           & 1), axis=1))
    order = np.argsort(np.where(conv, 10000, res_wt))
    syn_s = jnp.asarray(np.asarray(syn)[order])
    vals_s = jnp.asarray(np.asarray(bp["values"])[order])
    hard_s = jnp.asarray(np.asarray(bp["hard"])[order])

    orig_pick = osd_pallas.pick_block_shots
    for S in (64, 32, 16, 8):
        osd_pallas.pick_block_shots = (
            lambda m_pad, W, vmem_budget=0, S=S: S)

        def run(s, v, h, S=S):
            accs = []
            for c0 in range(0, B, 64):  # engine chunking: 8 chunks of 64
                out = osd_batch(dz.H, dz.HT_bf16, s[c0:c0+64], v[c0:c0+64],
                                h[c0:c0+64], K=dz.K, order=2,
                                num_test=dz.num_test, use_pallas=True,
                                rank=dz.rank, basis_cols=dz.basis_cols,
                                logical_pack=dz.logical_pack,
                                return_solution=False)
                accs.append(out["logical_delta_packed"].sum()
                            + out["valid"].sum())
            return sum(accs)
        timed(f"osd_batch 8x64 chunks, block_shots={S:2d}",
              jax.jit(run), syn_s, vals_s, hard_s)
    osd_pallas.pick_block_shots = orig_pick


if __name__ == "__main__":
    main()
