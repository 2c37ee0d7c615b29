"""BASELINE config 3 on hardware: [[90,8,10]] + [[108,8,10]] decoded in ONE
jitted launch (engine.make_multi_code_round_fn).

Applies the same levers as the single-code bench (batch 1024, scan-fused
rounds per dispatch, 2 launches in flight) — round 2 ran this at batch 256
serial and measured 1,818 shots/s/code vs 9,283 single-code.

Prints one JSON line with per-code and combined decoded shots/s.
Usage: python scripts/multicode_bench.py [batch] [rpd] [seconds]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.parallel.engine import (_make_basis, make_key,
                                       make_multi_code_round_fn)
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rpd = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    p, maxIter, osd_order = 0.004, 20, 2
    specs, decs = [], []
    for name in ("[[90, 8, 10]]", "[[108, 8, 10]]"):
        code = get_code(name)
        circ = SyndromeCircuit(code, num_cycles=code.distance)
        key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz,
                                  code.distance, p)
        M = load_matrices("matrix_cache", key_c)
        if M is None:
            M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
            save_matrices("matrix_cache", key_c, M)
        seq = alpha_schedule("dynamical", maxIter)
        dz = _make_basis(circ, M, "Z", seq, osd_order=osd_order)
        dx = _make_basis(circ, M, "X", seq, osd_order=osd_order)
        specs.append(dict(dec_z=dz, dec_x=dx, n_locs=circ.num_error_locs,
                          error_rate=p, batch=batch, maxIter=maxIter,
                          osd_order=osd_order))
        decs.append((dz, dx))

    from qldpc_tpu.parallel.engine import make_multi_code_pooled_round_fn
    from qldpc_tpu.utils.benchloop import timed_windows

    # rpd>1: per-code cross-round OSD compaction (the engine default)
    fn = jax.jit(make_multi_code_round_fn(specs) if rpd == 1
                 else make_multi_code_pooled_round_fn(specs, rpd))
    key = make_key(0)
    outs = jax.device_get(fn(key, decs))  # compile + warm + LER sanity
    lers = [float(np.asarray(o["any_err"]).mean()) for o in outs]

    per_code, _ = timed_windows(
        lambda i: fn(jax.random.fold_in(key, i), decs), batch * rpd,
        seconds=seconds)
    print(json.dumps({
        "metric": "multi_code_single_launch_[[90]]+[[108]]",
        "p": p, "batch_per_code": batch, "rounds_per_dispatch": rpd,
        "shots_per_sec_per_code": round(per_code, 1),
        "shots_per_sec_combined": round(2 * per_code, 1),
        "ler_sanity": [round(l, 4) for l in lers],
    }))


if __name__ == "__main__":
    main()
