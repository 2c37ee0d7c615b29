"""[[288]] staged-OSD A/B: stage1_cols x BP maxIter, same session.

Times the full osd_batch (prep + staged/single elimination + readout) on
identical posteriors from the VMEM flooding kernel, for stage1_cols in
{0 (single-stage), 768, 1536} and BP maxIter in {50, 100, 200} — more BP
iterations are nearly free in the kernel and may order the OSD columns
better (earlier validity exits, fewer stage-1-uncovered shots).

Usage: python scripts/osd288_ab.py [batch]
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
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas
from qldpc_tpu.ops.osd import osd_batch
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=3):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.device_get(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts) * 1e3:9.2f} ms", flush=True)
    return out, min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    p = 0.005
    code = get_code("[[288, 12, 18]]")
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)

    key = make_key(0)
    for mi in (50, 100, 200):
        seq = alpha_schedule("dynamical", mi)
        dz = _make_basis(circ, M, "Z", seq)
        samp = jax.jit(lambda k, mz: sampler.trial_batch(
            k, p, mz, mz, circ.num_error_locs, batch=B))
        syn = samp(key, dz.maps)["syndrome_z"]
        bp = jax.jit(lambda s, d: decode_batch_lift_pallas(
            d.lifted, s, d.prior, d.alpha_seq, mi, msg_dtype=jnp.float32))
        r = bp(syn, dz)
        conv = float(jax.device_get(r["converged"].sum())) / B
        print(f"--- kernel BP mi={mi}: converged {conv:.1%}")
        vals, hard = r["values"], r["hard"]
        for s1 in (0, 768, 1536):
            def osd_small(s, v, h, d, s1=s1):
                rr = osd_batch(d.H, d.HT_bf16, s, v, h, K=d.K, order=0,
                               num_test=0, use_pallas=True, rank=d.rank,
                               basis_cols=d.basis_cols,
                               logical_pack=d.logical_pack,
                               return_solution=False, stage1_cols=s1)
                return (rr["logical_delta_packed"].sum(), rr["valid"].sum(),
                        rr["rank_deficient"].sum())
            out, _ = timed(f"  osd stage1={s1 or 'off'}",
                           jax.jit(osd_small), syn, vals, hard, dz)
            print(f"    valid {int(out[1])}/{B} rankdef {int(out[2])}")


if __name__ == "__main__":
    main()
