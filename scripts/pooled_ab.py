"""Same-session A/B of the round schedules on one code config.

Configs (all one dispatch = rpd fused rounds, identical RNG):
  scanned       — per-round OSD (make_scanned_round_fn(make_round_fn))
  pooled        — cross-round OSD compaction (make_pooled_round_fn)
  pooled+layered— pooled with the serial (layered) BP schedule

The chip's throughput drifts a lot between sessions (CLAUDE.md), so only
same-session deltas are meaningful — this interleaves the configs
round-robin and reports each config's best window.

Usage: python scripts/pooled_ab.py [--code "[[144, 12, 12]]"] [--p 0.004]
       [--batch 1024] [--rpd 4] [--maxiter 50] [--seconds 8] [--reps 3]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="[[144, 12, 12]]")
    ap.add_argument("--p", type=float, default=0.004)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rpd", type=int, default=4)
    ap.add_argument("--maxiter", type=int, default=50)
    ap.add_argument("--osd-order", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", nargs="*",
                    default=["scanned", "pooled", "pooled+layered"])
    args = ap.parse_args()

    import jax

    from bench import _build
    from qldpc_tpu.parallel.engine import (make_key, make_pooled_round_fn,
                                           make_round_fn,
                                           make_scanned_round_fn)
    from qldpc_tpu.utils.benchloop import timed_windows

    _, circ, _M, dec_z, dec_x, _seq = _build(args.code, args.p,
                                             args.maxiter, args.osd_order)

    fns = {}
    for cfg in args.configs:
        variant = "layered" if "layered" in cfg else "minsum"
        if cfg.startswith("pooled"):
            # optional "@cN" suffix sets the pooled OSD chunk size
            chunk = None
            if "@c" in cfg:
                chunk = int(cfg.split("@c")[1].split("+")[0])
            fns[cfg] = jax.jit(make_pooled_round_fn(
                dec_z, dec_x, circ.num_error_locs, args.p, args.batch,
                args.maxiter, args.osd_order, args.rpd, bp_variant=variant,
                osd_chunk=chunk))
        else:
            base = make_round_fn(dec_z, dec_x, circ.num_error_locs, args.p,
                                 args.batch, args.maxiter, args.osd_order,
                                 bp_variant=variant)
            fns[cfg] = jax.jit(base if args.rpd == 1 else
                               make_scanned_round_fn(base, args.rpd))

    key = make_key(0)
    best = {cfg: 0.0 for cfg in fns}
    convs = {}
    for rep in range(args.reps):
        for cfg, fn in fns.items():
            errs = [0, 0]  # [errors, conv]

            def on_round(out, errs=errs):
                errs[0] += int(out["any_err"].sum())
                errs[1] += int(out["z_conv"].sum()) + int(out["x_conv"].sum())

            t0 = time.time()
            sps, nrounds = timed_windows(
                lambda i: fn(jax.random.fold_in(key, i), dec_z, dec_x),
                args.batch * args.rpd, seconds=args.seconds,
                on_round=on_round)
            shots = nrounds * args.batch * args.rpd
            convs[cfg] = 1.0 - errs[1] / (2 * shots)
            best[cfg] = max(best[cfg], sps)
            print(f"rep{rep} {cfg:16s}: {sps:9,.0f} shots/s "
                  f"({time.time()-t0:.0f}s, bp-unconv {convs[cfg]:.1%})",
                  flush=True)
    out = {"config": vars(args), "best_shots_per_sec": best,
           "bp_unconverged_frac": convs}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
