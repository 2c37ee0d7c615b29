"""Experiment driver: LER sweeps over BB codes x physical error rates.

Capability parity with the reference driver (reference main.py:16-154), but
configuration is a CLI instead of edit-the-source: codes, error rates,
stopping targets, alpha mode, and batch size are flags. Codes come from the
built-in registry (generated from their defining polynomials — no external
package needed) or from reference-format npz files via --codes-dir.

Examples:
  python main.py --codes "[[72, 12, 6]]" --error-rates 0.006 0.005 0.004
  python main.py --codes "[[144, 12, 12]]" --alpha-mode alvarado-autoregressive
"""
from __future__ import annotations

import argparse
import json
import logging
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from qldpc_tpu.parallel.mesh import distributed_init_from_env

# multi-host: QLDPC_COORDINATOR/QLDPC_NUM_PROCESSES/QLDPC_PROCESS_ID select
# a jax.distributed cluster; must run before any device use (no-op if unset)
distributed_init_from_env()

from qldpc_tpu import CODE_REGISTRY, get_code
from qldpc_tpu.models.bb import BBCode
from qldpc_tpu.models.circuit import SyndromeCircuit
from qldpc_tpu.models.builder import build_decoding_matrices
from qldpc_tpu.parallel.engine import run_simulation
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)
from qldpc_tpu.utils.plotting import (plot_alpha_comparison,
                                      plot_alpha_linearity,
                                      plot_simulation_results)
from qldpc_tpu.utils.results import make_run_dir, save_results

DEFAULT_RATES = [0.006, 0.005, 0.004]


def parse_args():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--codes", nargs="+", default=["[[72, 12, 6]]"],
                   help=f"code names (registry: {list(CODE_REGISTRY)})")
    p.add_argument("--codes-dir", default=None,
                   help="load codes from reference-format npz files here "
                        "instead of the built-in registry")
    p.add_argument("--error-rates", nargs="+", type=float,
                   default=DEFAULT_RATES)
    p.add_argument("--num-cycles", type=int, default=None,
                   help="syndrome cycles (default: code distance)")
    p.add_argument("--target-logical-errors", type=int, default=30)
    p.add_argument("--max-trials", type=int, default=100000)
    p.add_argument("--max-iter", type=int, default=20)
    p.add_argument("--osd-order", type=int, default=2)
    p.add_argument("--alpha-mode", default="dynamical",
                   choices=["dynamical", "alvarado",
                            "alvarado-autoregressive"])
    p.add_argument("--scopt", action="store_true")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--base-seed", type=int, default=None)
    p.add_argument("--cache-dir", default="matrix_cache")
    p.add_argument("--output-dir", default="output")
    p.add_argument("--resume", default=None, metavar="RUN_DIR",
                   help="resume an interrupted sweep: reuse this run dir, "
                        "skip (code, p) points already in its results.npz")
    return p.parse_args()


def load_code(name: str, codes_dir):
    if codes_dir:
        return BBCode.load_npz(os.path.join(codes_dir, f"{name}.npz"),
                               name=name)
    return get_code(name)


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s",
                        datefmt="%H:%M:%S")
    log = logging.getLogger("driver")
    import jax
    # on a multi-host cluster every process runs the sweep loop (SPMD), but
    # only process 0 touches the filesystem (run dirs, cache writes,
    # checkpoints, plots — concurrent writers to a shared filesystem could
    # tear the npz files)
    is_main = getattr(jax, "process_index", lambda: 0)() == 0
    if args.resume:
        run_dir = args.resume
        est_dir = os.path.join(run_dir, "estimation_plots")
        if is_main:
            os.makedirs(est_dir, exist_ok=True)
        results = {}
        ckpt = os.path.join(run_dir, "results.npz")
        if os.path.exists(ckpt):
            from qldpc_tpu.utils.results import load_results
            results = load_results(ckpt).get("results", {})
            done = [(c, p) for c, d in results.items() for p in d]
            log.info("resuming %s: %d completed points", run_dir, len(done))
    elif is_main:
        run_dir, est_dir = make_run_dir(args.output_dir)
        results = {}
    else:
        run_dir = est_dir = None
        results = {}

    for name in args.codes:
        code = load_code(name, args.codes_dir)
        short = str(code.n)
        results.setdefault(short, {})
        cycles = args.num_cycles or code.distance or 12
        log.info("=== %s (n=%d, k=%d), %d cycles ===", name, code.n, code.k,
                 cycles)
        circ = SyndromeCircuit(code, num_cycles=cycles)
        for p in args.error_rates:
            if p in results[short]:
                log.info("  p=%g already completed (resume) — skipping", p)
                continue
            key = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                                    cycles, p)
            matrices = load_matrices(args.cache_dir, key)
            if matrices is None:
                log.info("building decoding matrices for p=%g ...", p)
                matrices = build_decoding_matrices(circ, code.Lx, code.Lz, p)
                if is_main:
                    save_matrices(args.cache_dir, key, matrices)
            res = run_simulation(
                code.Hx, code.Hz, code.Lx, code.Lz, p, num_cycles=cycles,
                maxIter=args.max_iter, osd_order=args.osd_order,
                precomputed_matrices=matrices, alpha_mode=args.alpha_mode,
                target_logical_errors=args.target_logical_errors,
                max_trials=args.max_trials, scopt=args.scopt,
                estimation_plot_dir=est_dir if is_main else None,
                base_seed=args.base_seed,
                batch_size=args.batch_size,
                ell=getattr(code, "ell", None), m=getattr(code, "m", None),
                a_x_powers=getattr(code, "a_x_powers", None),
                a_y_powers=getattr(code, "a_y_powers", None),
                b_y_powers=getattr(code, "b_y_powers", None),
                b_x_powers=getattr(code, "b_x_powers", None),
            )
            results[short][p] = res
            # checkpoint after every point so an interrupted sweep resumes
            # with --resume RUN_DIR (sweep-level resume; matrices and jit
            # programs are already covered by their own persistent caches)
            if is_main:
                save_results(run_dir, results, {})
            log.info("  p=%g LER=%.4e (trials=%d, errors=%d, %.0f shots/s)",
                     p, res["logical_error_rate"], res["num_trials"],
                     res["logical_errors"], res["shots_per_sec"])

    if not is_main:
        return
    plot_simulation_results(results, os.path.join(run_dir,
                                                  "simulation_results.png"))
    alpha_r2 = {}
    if args.alpha_mode == "alvarado-autoregressive":
        plot_alpha_comparison(results, os.path.join(run_dir,
                                                    "alpha_comparison.png"))
        alpha_r2 = plot_alpha_linearity(
            results, os.path.join(run_dir, "alpha_linearity.png"))
    save_results(run_dir, results, alpha_r2)
    summary = {c: {p: {"ler": r["logical_error_rate"],
                       "trials": r["num_trials"],
                       "shots_per_sec": round(r["shots_per_sec"], 1)}
                   for p, r in d.items()} for c, d in results.items()}
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"Results saved to {run_dir}")


if __name__ == "__main__":
    main()
