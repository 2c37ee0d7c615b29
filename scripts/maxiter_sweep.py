"""Same-session maxIter throughput sweep.

Rationale (round-2 finding): OSD costs ~16ms/basis at ~82% unconverged
while BP iterations in the VMEM kernel are nearly free, so raising maxIter
(reference engine default is 50; the bench ran 20) trades cheap BP
iterations for expensive OSD invocations. This measures throughput AND the
unconverged fraction per maxIter in one session, pipelined like bench.py.
Measured 2026-08-21 on [[144]] B=1024 rpd4: 20 -> 9,140 shots/s (80.6%
unconverged), 30 -> 9,988 (67.5%), 50 -> 10,735 (50.1%), 80 -> 10,355,
120 -> 9,039 — 50 is the peak AND the reference engine default.

Usage: python scripts/maxiter_sweep.py [maxIters...] [--code NAME]
       [--p P] [--batch B] [--rpd N]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from qldpc_tpu import SyndromeCircuit, get_code, build_decoding_matrices
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.parallel.engine import (_make_basis, make_key, make_round_fn,
                                       make_scanned_round_fn)
from qldpc_tpu.utils.benchloop import timed_windows
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def measure(fn_decs, key, batch, rpd, seconds=6.0):
    fn, dz, dx = fn_decs
    stats = {"conv": 0, "tot": 0}

    def on_round(out):
        stats["conv"] += int(out["z_conv"].sum()) + int(out["x_conv"].sum())
        stats["tot"] += out["z_conv"].size + out["x_conv"].size

    rate, _ = timed_windows(
        lambda i: fn(jax.random.fold_in(key, i), dz, dx), batch * rpd,
        windows=1, seconds=seconds, on_round=on_round)
    return rate, 1.0 - stats["conv"] / stats["tot"]


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("maxiters", nargs="*", default=None,
                    help="maxIter values; an entry may pin its own variant "
                         "as MI:VARIANT (e.g. '200:minsum 50:layered') to "
                         "interleave heterogeneous configs instead of the "
                         "maxiters x variants cross product")
    ap.add_argument("--code", default="[[144, 12, 12]]")
    ap.add_argument("--p", type=float, default=0.004)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rpd", type=int, default=4)
    ap.add_argument("--pooled", action="store_true",
                    help="use the engine-default pooled (cross-round OSD "
                         "compaction) schedule instead of scanned rounds")
    ap.add_argument("--osd-chunk", type=int, default=None,
                    help="pooled OSD chunk override (None = POOL/8)")
    ap.add_argument("--variant", default="minsum",
                    help="bp_variant: minsum | layered | tanh; a comma "
                         "list interleaves variants in the same session "
                         "(drift-fair A/B)")
    args = ap.parse_args()
    maxiters = args.maxiters or ["20", "30", "50"]
    code = get_code(args.code)
    cycles, p = code.distance, args.p
    batch, rpd, osd_order = args.batch, args.rpd, 2
    circ = SyndromeCircuit(code, num_cycles=cycles)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, cycles, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)

    key = make_key(0)
    variants = args.variant.split(",")
    configs = []
    for entry in maxiters:
        entry = str(entry)
        if ":" in entry:
            mi_s, v = entry.split(":")
            configs.append((int(mi_s), v))
        else:
            configs.extend((int(entry), v) for v in variants)
    fns = {}
    for mi, variant in configs:
        seq = alpha_schedule("dynamical", mi)
        dz = _make_basis(circ, M, "Z", seq, osd_order=osd_order)
        dx = _make_basis(circ, M, "X", seq, osd_order=osd_order)
        if args.pooled and rpd > 1:
            from qldpc_tpu.parallel.engine import make_pooled_round_fn
            fn = jax.jit(make_pooled_round_fn(
                dz, dx, circ.num_error_locs, p, batch, mi, osd_order, rpd,
                bp_variant=variant, osd_chunk=args.osd_chunk))
        else:
            base = make_round_fn(dz, dx, circ.num_error_locs, p, batch, mi,
                                 osd_order, bp_variant=variant)
            # bundles travel as jit ARGUMENTS: baked [[288]]-sized closure
            # constants exceed the remote compile service's request limit
            fn = jax.jit(make_scanned_round_fn(base, rpd))
        fns[(mi, variant)] = (fn, dz, dx)

    # two interleaved passes so chip drift hits all configs equally
    results = {c: [] for c in configs}
    uncs = {}
    for _ in range(2):
        for c in configs:
            rate, unc = measure(fns[c], key, batch, rpd)
            results[c].append(rate)
            uncs[c] = unc
            print(f"maxIter={c[0]} {c[1]}: {rate:8.1f} shots/s  "
                  f"unconverged={unc:.3f}", flush=True)
    print("\nbest-of-2 per config:")
    for c in configs:
        print(f"maxIter={c[0]} {c[1]}: {max(results[c]):8.1f} shots/s  "
              f"unconverged={uncs[c]:.3f}")


if __name__ == "__main__":
    main()
