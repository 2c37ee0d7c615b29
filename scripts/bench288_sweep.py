"""[[288,12,18]] same-session throughput sweep: batch x maxIter x rpd.

The [[288]] round is OSD-dominated (~86% BP-unconverged even at mi200) and
its elimination exit depths are deep, so the candidate levers are (a) more
nearly-free kernel-BP iterations that ORDER the OSD columns better
(earlier validity exits — the mi50->200 gain came from ordering, not
convergence), (b) a bigger batch amortizing the fixed per-round cost, and
(c) fused-round count. All configs share one session (the tunneled chip
drifts); pooled cross-round compaction throughout.

Usage: python scripts/bench288_sweep.py [--p 0.005] [--seconds 10]
       [--configs B,mi,rpd ...]   (default 256,200,2 512,200,2 512,400,1
                                   256,400,2)
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
    ap.add_argument("--p", type=float, default=0.005)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--osd-order", type=int, default=2)
    ap.add_argument("--configs", nargs="*",
                    default=["256,200,2", "512,200,2", "512,400,1",
                             "256,400,2"])
    args = ap.parse_args()

    import jax

    from bench import _build
    from qldpc_tpu.parallel.engine import (make_key, make_pooled_round_fn,
                                           make_round_fn)
    from qldpc_tpu.utils.benchloop import timed_windows

    results = {}
    built = {}
    for cfg in args.configs:
        B, mi, rpd = (int(x) for x in cfg.split(","))
        if mi not in built:
            built[mi] = _build("[[288, 12, 18]]", args.p, mi,
                               args.osd_order)
        _, circ, _M, dec_z, dec_x, _seq = built[mi]
        if rpd > 1:
            fn = jax.jit(make_pooled_round_fn(
                dec_z, dec_x, circ.num_error_locs, args.p, B, mi,
                args.osd_order, rpd))
        else:
            fn = jax.jit(make_round_fn(
                dec_z, dec_x, circ.num_error_locs, args.p, B, mi,
                args.osd_order))
        key = make_key(0)
        stats = [0, 0, 0]  # errs, conv, shots

        def on_round(out, stats=stats):
            stats[0] += int(out["any_err"].sum())
            stats[1] += int(out["z_conv"].sum()) + int(out["x_conv"].sum())
            stats[2] += out["any_err"].shape[0]

        t0 = time.time()
        sps, _n = timed_windows(
            lambda i: fn(jax.random.fold_in(key, i), dec_z, dec_x),
            B * rpd, seconds=args.seconds, on_round=on_round)
        unconv = 1.0 - stats[1] / max(1, 2 * stats[2])
        ler = stats[0] / max(1, stats[2])
        results[cfg] = {"shots_per_sec": round(sps, 1),
                        "bp_unconverged": round(unconv, 3),
                        "ler": round(ler, 3)}
        print(f"B={B} mi={mi} rpd={rpd}: {sps:8,.0f} shots/s  "
              f"unconv {unconv:.1%}  ler {ler:.3f}  "
              f"({time.time()-t0:.0f}s)", flush=True)
    print(json.dumps({"p": args.p, "results": results}))


if __name__ == "__main__":
    main()
