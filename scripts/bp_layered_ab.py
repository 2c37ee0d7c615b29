"""Hardware A/B + bit-identity check of the layered BP kernel.

Round-5 rewrite: the layered schedule keeps Q resident and reconstructs
each half's committed R from saved per-check stats + packed per-edge bits
(see ops/bp_lift_pallas._bp_kernel), cutting the sweep from 7 roll passes
to 4. This script validates, ON HARDWARE (CLAUDE.md: never trust
interpret-mode equivalence alone for Mosaic kernels):

1. bit-identity of the layered KERNEL vs the XLA layered lift
   (hard everywhere; values/iterations for unconverged shots — converged
   shots' kernel values are post-convergence by contract);
2. same-session timing: flooding kernel vs layered kernel at equal
   maxIter (interleaved passes, min-of-N against tunnel drift);
3. optionally (--probe-288) whether the restructured layered body now
   FITS the [[288,12,18]] graph (the old body spilled 32.5MB of vector
   registers past the 128MB VMEM ceiling and was budget-gated out).

Usage: python scripts/bp_layered_ab.py [--code NAME] [--batch B]
       [--maxiter MI] [--probe-288]
Writes LAYERED_KERNEL_AB.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from qldpc_tpu import SyndromeCircuit, get_code, build_decoding_matrices
from qldpc_tpu.ops import sampler
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.ops.bp_lift import decode_batch_lift_layered
from qldpc_tpu.ops.bp_lift_pallas import decode_batch_lift_pallas
from qldpc_tpu.parallel.engine import _make_basis, make_key
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def build(code_name, p, maxIter):
    code = get_code(code_name)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                              code.distance, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dec_z = _make_basis(circ, M, "Z", seq)
    return circ, dec_z


def sample_syndromes(circ, dec_z, p, batch):
    samp = jax.jit(lambda k, m: sampler.trial_batch(
        k, p, m, m, circ.num_error_locs, batch=batch)["syndrome_z"])
    return samp(make_key(3), dec_z.maps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="[[144, 12, 12]]")
    ap.add_argument("--p", type=float, default=0.004)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--maxiter", type=int, default=50)
    ap.add_argument("--probe-288", action="store_true")
    args = ap.parse_args()
    out = {"config": vars(args)}

    circ, dec = build(args.code, args.p, args.maxiter)
    syn = sample_syndromes(circ, dec, args.p, args.batch)
    g = dec.lifted
    assert g is not None
    print("built", flush=True)

    kern = {}
    for sched in ("flooding", "layered"):
        kern[sched] = jax.jit(lambda s, d, sch=sched: decode_batch_lift_pallas(
            d.lifted, s, d.prior, d.alpha_seq, args.maxiter,
            msg_dtype=jnp.float32, schedule=sch))

    # 1. hardware bit-identity of the layered kernel vs the XLA layered
    # lift — at a REDUCED shape (B=128, mi=20): bit-identity is shape-
    # independent and the XLA layered program at the full bench shape is a
    # >35-minute remote compile (observed 2026-08-21)
    bi_B, bi_mi = min(128, args.batch), min(20, args.maxiter)
    syn_s = syn[:bi_B]
    xla = jax.jit(lambda s, d: decode_batch_lift_layered(
        g, s, d.prior, d.alpha_seq, bi_mi, msg_dtype=jnp.float32))
    rx = jax.device_get(xla(syn_s, dec))
    print("xla layered (identity shape) done", flush=True)
    kd = jax.device_get(jax.jit(lambda s, d: decode_batch_lift_pallas(
        d.lifted, s, d.prior, d.alpha_seq, bi_mi, msg_dtype=jnp.float32,
        schedule="layered"))(syn_s, dec))
    unc = ~np.asarray(rx["converged"])
    ident = dict(
        converged=bool(np.array_equal(np.asarray(rx["converged"]),
                                      np.asarray(kd["converged"]))),
        hard=bool(np.array_equal(np.asarray(rx["hard"]),
                                 np.asarray(kd["hard"]))),
        iterations=bool(np.array_equal(np.asarray(rx["iterations"]),
                                       np.asarray(kd["iterations"]))),
        values_unconverged=bool(np.array_equal(
            np.asarray(rx["values"])[unc], np.asarray(kd["values"])[unc])),
        unconverged_frac=float(unc.mean()),
    )
    out["hardware_bit_identity"] = ident
    print("bit-identity vs XLA layered:", ident, flush=True)

    # 2. same-session timing, interleaved min-of-N
    best = {s: float("inf") for s in kern}
    for s, fn in kern.items():
        jax.block_until_ready(fn(syn, dec))
    for _ in range(5):
        for s, fn in kern.items():
            t0 = time.time()
            jax.block_until_ready(fn(syn, dec))
            best[s] = min(best[s], time.time() - t0)
    out["flooding_ms"] = round(best["flooding"] * 1e3, 2)
    out["layered_ms"] = round(best["layered"] * 1e3, 2)
    out["layered_over_flooding"] = round(best["layered"] / best["flooding"],
                                         3)
    print(f"flooding {out['flooding_ms']}ms layered {out['layered_ms']}ms "
          f"ratio {out['layered_over_flooding']}", flush=True)

    # 3. [[288]] layered fit probe (forced block, raised budget)
    if args.probe_288:
        circ8, dec8 = build("[[288, 12, 18]]", 0.005, 20)
        syn8 = sample_syndromes(circ8, dec8, 0.005, 128)
        try:
            r8 = jax.jit(lambda s, d: decode_batch_lift_pallas(
                d.lifted, s, d.prior, d.alpha_seq, 20,
                msg_dtype=jnp.float32, schedule="layered",
                block_b=128)["converged"])(syn8, dec8)
            conv8 = int(jax.device_get(r8.sum()))
            # cross-check decisions against the XLA layered lift
            rx8 = jax.jit(lambda s, d: decode_batch_lift_layered(
                d.lifted, s, d.prior, d.alpha_seq, 20,
                msg_dtype=jnp.float32)["converged"])(syn8, dec8)
            out["probe_288"] = dict(
                fits=True, converged=conv8,
                matches_xla=bool(conv8 == int(jax.device_get(rx8.sum()))))
        except Exception as e:
            out["probe_288"] = dict(fits=False, error=repr(e)[:500])
        print("[[288]] layered kernel probe:", out["probe_288"], flush=True)

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "LAYERED_KERNEL_AB.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
