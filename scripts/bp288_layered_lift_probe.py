"""[[288]] layered-BP-via-XLA-lift cost probe (VERDICT r4 item 2b).

The layered KERNEL does not compile at [[288]] slab sizes, so the only
layered path there is the XLA lift (decode_batch_lift_layered). This
measures its per-sweep cost at a small batch (B=64, mi=20 — the program
is shape-linear in B and iteration-linear in mi, and the full-shape XLA
layered compile takes >30 min on the remote service) next to the VMEM
flooding kernel's per-iteration cost, and prints the arithmetic that
decides the A/B:

  layered pays  2 * maxIter_layered * sweep_ms      extra BP per round
  and saves     2 * osd_ms * (unconv_flood - unconv_layered)/unconv_flood

With kernel flooding at mi200 costing ~37ms/basis TOTAL (BENCH r5 audit)
and OSD ~164ms/basis at 82% unconverged, the lift's streaming sweeps must
come in under ~1ms to break even — they are HBM-roofline-bound at tens of
ms. The probe records the measured sweep cost so the negative is a
number, not an estimate.

Usage: python scripts/bp288_layered_lift_probe.py [batch] [maxiter]
Writes BP288_LAYERED_LIFT.json.
"""
import json
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
from qldpc_tpu.ops.bp_lift import decode_batch_lift_layered
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mi = int(sys.argv[2]) if len(sys.argv) > 2 else 20
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

    fns = {
        "kernel_flooding": jax.jit(lambda s, d: decode_batch_lift_pallas(
            d.lifted, s, d.prior, d.alpha_seq, mi,
            msg_dtype=jnp.float32)["converged"].sum()),
        "xla_layered": jax.jit(lambda s, d: decode_batch_lift_layered(
            d.lifted, s, d.prior, d.alpha_seq, mi,
            msg_dtype=jnp.float32)["converged"].sum()),
    }
    out = {"batch": B, "maxiter": mi}
    conv = {}
    for name, fn in fns.items():
        t0 = time.time()
        conv[name] = int(jax.device_get(fn(syn, dz)))
        out[name + "_compile_s"] = round(time.time() - t0, 1)
        print(f"{name}: compiled+ran in {out[name + '_compile_s']}s, "
              f"converged {conv[name]}/{B}", flush=True)
    best = {n: float("inf") for n in fns}
    for _ in range(4):
        for n, fn in fns.items():
            t0 = time.time()
            jax.block_until_ready(fn(syn, dz))
            best[n] = min(best[n], time.time() - t0)
    for n in fns:
        out[n + "_ms"] = round(best[n] * 1e3, 2)
        out[n + "_converged"] = conv[n]
    out["xla_layered_ms_per_sweep"] = round(best["xla_layered"] * 1e3 / mi, 3)
    out["kernel_flooding_ms_per_iter"] = round(
        best["kernel_flooding"] * 1e3 / mi, 3)
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BP288_LAYERED_LIFT.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
