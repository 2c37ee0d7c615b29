"""[[144]] staged-OSD A/B: does a narrow stage-1 prefix pay at headline scale?

[[144]]'s elimination exit depths are shallow (mean ~78, max ~300 of
K ~ 1000 at mi50 — CLAUDE.md), so the auto rule keeps it single-stage
(staging was only shown to pay on [[288]] whose exit depths reach the
thousands). But the staged path ALSO gathers/packs only the stage-1 width
up front — if the pack/prep of the full K columns is a meaningful share of
osd_batch on [[144]], a stage-1 of ~384 (covering virtually all exits)
could cut it. Same-session timing of the full osd_batch on identical
kernel-BP posteriors, stage1 in {0, 256, 384, 512}.

Usage: python scripts/osd144_stage_ab.py [batch=1024] [maxIter=50]
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
from qldpc_tpu.ops.osd import osd_batch
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def timed(name, fn, *args, reps=4):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.device_get(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts) * 1e3:9.2f} ms", flush=True)
    return out, min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    mi = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    p = 0.004
    code = get_code("[[144, 12, 12]]")
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)

    key = make_key(0)
    seq = alpha_schedule("dynamical", mi)
    dz = _make_basis(circ, M, "Z", seq, osd_order=2)
    print(f"K={dz.K} rank={dz.rank} n={dz.H.shape[1]} m={dz.H.shape[0]}")
    samp = jax.jit(lambda k, mz: sampler.trial_batch(
        k, p, mz, mz, circ.num_error_locs, batch=B))
    syn = samp(key, dz.maps)["syndrome_z"]
    bp = jax.jit(lambda s, d: decode_batch_lift_pallas(
        d.lifted, s, d.prior, d.alpha_seq, mi, msg_dtype=jnp.float32))
    r = bp(syn, dz)
    conv = float(jax.device_get(r["converged"].sum())) / B
    print(f"kernel BP mi={mi}: converged {conv:.1%}")
    vals, hard = r["values"], r["hard"]
    for s1 in (0, 128, 192, 256, 320):
        if s1 >= dz.K:
            continue

        def osd_small(s, v, h, d, s1=s1):
            rr = osd_batch(d.H, d.HT_bf16, s, v, h, K=d.K, order=2,
                           num_test=d.num_test, use_pallas=True,
                           rank=d.rank, basis_cols=d.basis_cols,
                           logical_pack=d.logical_pack,
                           return_solution=False, stage1_cols=s1)
            return (rr["logical_delta_packed"].sum(), rr["valid"].sum(),
                    rr["rank_deficient"].sum())

        out, _ = timed(f"osd_batch stage1={s1 or 'off'}",
                       jax.jit(osd_small), syn, vals, hard, dz)
        print(f"  delta-sum {int(out[0])} valid {int(out[1])}/{B} "
              f"rankdef {int(out[2])}")


if __name__ == "__main__":
    main()
