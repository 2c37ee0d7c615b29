"""[[288]] staged-OSD tail block-width A/B (QLDPC_OSD_TAIL_MB 26 vs 78).

The staged eliminator's full-width tail chunks on [[288]] run S=8 shot
blocks under the default 26MB block budget. Per-column step cost is
measured nearly independent of S and W (scripts/osd_panel_probe.py), and
tail blocks are uniformly deep (stage-1-uncovered shots only), so a wider
block should serve ~2-4x the shots at ~the same per-column cost. This
times the full osd_batch on identical kernel-BP posteriors under both
budgets, same session, and asserts consumed outputs are identical
(grouping-independence, pinned by tests/test_osd.py).

Usage: python scripts/osd288_tailblock_ab.py [batch] [maxiter]
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mi = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    p = 0.005
    code = get_code("[[288, 12, 18]]")
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", mi)
    dz = _make_basis(circ, M, "Z", seq)
    key = make_key(0)
    samp = jax.jit(lambda k, mz: sampler.trial_batch(
        k, p, mz, mz, circ.num_error_locs, batch=B))
    syn = samp(key, dz.maps)["syndrome_z"]
    bp = jax.jit(lambda s, d: decode_batch_lift_pallas(
        d.lifted, s, d.prior, d.alpha_seq, mi, msg_dtype=jnp.float32))
    r = bp(syn, dz)
    conv = float(jax.device_get(r["converged"].sum())) / B
    print(f"kernel BP mi={mi}: converged {conv:.1%}", flush=True)
    vals, hard = r["values"], r["hard"]

    fns, outs = {}, {}
    for mb in (26, 78):
        os.environ["QLDPC_OSD_TAIL_MB"] = str(mb)

        def osd_small(s, v, h, d):
            rr = osd_batch(d.H, d.HT_bf16, s, v, h, K=d.K, order=0,
                           num_test=0, use_pallas=True, rank=d.rank,
                           basis_cols=d.basis_cols,
                           logical_pack=d.logical_pack,
                           return_solution=False)
            return (rr["logical_delta_packed"], rr["valid"],
                    rr["rank_deficient"])

        fn = jax.jit(osd_small)  # distinct fn object => traces under its mb
        outs[mb] = jax.device_get(fn(syn, vals, hard, dz))
        fns[mb] = fn

    assert all(np.array_equal(outs[26][i], outs[78][i]) for i in range(3)), \
        "tail block width changed a consumed output"
    print("outputs identical across tail budgets", flush=True)

    best = {mb: float("inf") for mb in fns}
    for _ in range(4):
        for mb, fn in fns.items():
            t0 = time.time()
            jax.block_until_ready(fn(syn, vals, hard, dz))
            best[mb] = min(best[mb], time.time() - t0)
    for mb in fns:
        print(f"tail budget {mb}MB: full osd_batch {best[mb]*1e3:8.2f} ms")
    print(f"speedup: {best[26] / best[78]:.2f}x")


if __name__ == "__main__":
    main()
