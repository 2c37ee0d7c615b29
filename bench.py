"""Benchmark: decoded shots/sec/chip on [[144,12,12]] (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md) and
numba is not installed here, so the single-core baseline is MEASURED with a
native C++ rendering of the reference's per-trial decode path (min-sum BP +
OSD fallback, qldpc_tpu/native/gf2kernels.cc) on this host — validated to
agree exactly with the JAX decoder's convergence decisions. The old
python-rate x 75 estimate (midpoint of the reference's claimed 50-100x
Numba speedup, reference src/noise/__init__.py:6) remains as the no-
toolchain fallback; the measurement showed it UNDERestimated native
single-core speed ~8x, so vs_baseline dropped accordingly. A trial = Z + X
decode.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def estimate_python_baseline(H, prior, syndromes, maxIter=20) -> float:
    """Single-core pure-python normalized-min-sum trials/sec (scalar loop,
    mirroring the reference's per-trial decode structure)."""
    H = np.asarray(H) != 0
    m, n = H.shape
    rows = [np.nonzero(H[i])[0] for i in range(m)]
    t0 = time.time()
    ntr = 0
    for syndrome in syndromes:
        sgn_syn = 1.0 - 2.0 * syndrome
        Q = {(i, j): prior[j] for i in range(m) for j in rows[i]}
        for it in range(maxIter):
            alpha = 1.0 - 2.0 ** (-(it + 1))
            Rsum = np.zeros(n)
            R = {}
            for i in range(m):
                if not len(rows[i]):
                    continue
                sgn = sgn_syn[i]
                m1 = m2 = np.inf
                i1 = -1
                for j in rows[i]:
                    v = Q[(i, j)]
                    sgn *= 1.0 if v >= 0 else -1.0
                    a = abs(v)
                    if a < m1:
                        m2, m1, i1 = m1, a, j
                    elif a < m2:
                        m2 = a
                for j in rows[i]:
                    v = Q[(i, j)]
                    sj = 1.0 if v >= 0 else -1.0
                    R[(i, j)] = alpha * sgn * sj * (m2 if j == i1 else m1)
                    Rsum[j] += R[(i, j)]
            values = Rsum + prior
            for i in range(m):
                for j in rows[i]:
                    Q[(i, j)] = np.clip(values[j] - R[(i, j)], -20, 20)
            hard = (values < 0).astype(np.int8)
            if np.array_equal((H @ hard) % 2, syndrome):
                break
        ntr += 1
    return ntr / (time.time() - t0)


def main():
    import jax

    from qldpc_tpu import (SyndromeCircuit, build_decoding_matrices, get_code)
    from qldpc_tpu.ops.bp import alpha_schedule
    from qldpc_tpu.parallel.engine import _make_basis, make_round_fn
    from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                         save_matrices)

    code = get_code("[[144, 12, 12]]")
    cycles, p = 12, 0.004
    circ = SyndromeCircuit(code, num_cycles=cycles)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, cycles, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)

    import os
    # maxIter 50 = the reference ENGINE's own default (reference
    # engine.py:196; its driver main.py:44 sets 20). Measured same-session
    # on v5e (scripts/maxiter_sweep.py, 2026-08-21): 20 -> 9,140 shots/s at
    # 80.6% unconverged; 30 -> 9,988 at 67.5%; 50 -> 10,735 at 50.1% — BP
    # iterations in the VMEM kernel are ~3 orders cheaper than the OSD
    # calls they avoid. LER at mi50 is the configuration the archives were
    # produced with (VALIDATION.md).
    maxIter, osd_order = int(os.environ.get("BENCH_MAXITER", "50")), 2
    # 1024 is the measured sweet spot on v5e: the round has a ~19ms fixed
    # cost (dispatch share + in-program per-round overhead) that larger
    # batches amortize — 512: 7.9k, 1024: 9.3k, 2048: 9.4k shots/s
    # (within drift noise of 1024, at twice the working set and compile
    # time), measured 2026-08-20 back-to-back.
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    seq = alpha_schedule("dynamical", maxIter)
    dec_z = _make_basis(circ, M, "Z", seq, osd_order=osd_order)
    dec_x = _make_basis(circ, M, "X", seq, osd_order=osd_order)
    # fuse several rounds per dispatch: the TPU transport's fixed ~30ms
    # per-dispatch floor is a dispatch-RATE limit that pipelining alone
    # cannot hide (scripts/round_breakdown.py)
    rpd = int(os.environ.get("BENCH_RPD", "4"))
    from qldpc_tpu.parallel.engine import make_scanned_round_fn
    base_fn = make_round_fn(dec_z, dec_x, circ.num_error_locs, p, batch,
                            maxIter, osd_order)
    fn = jax.jit(base_fn if rpd == 1
                 else make_scanned_round_fn(base_fn, rpd))
    from qldpc_tpu.parallel.engine import make_key
    from qldpc_tpu.utils.benchloop import timed_windows
    key = make_key(0)
    errs_box = [0]
    shots_per_sec, total_rounds = timed_windows(
        lambda i: fn(jax.random.fold_in(key, i), dec_z, dec_x),
        batch * rpd,
        on_round=lambda out: errs_box.__setitem__(
            0, errs_box[0] + int(out["any_err"].sum())))
    assert 0 < errs_box[0] < total_rounds * batch * rpd, \
        "decode produced degenerate flags"

    # MEASURED single-core native baseline: the C++ min-sum+OSD trial
    # decoder (qldpc_tpu/native/gf2kernels.cc baseline_decode_trials —
    # same decode semantics as the reference's Numba per-trial path,
    # validated to agree exactly with the JAX decoder's convergence
    # decisions and to satisfy every syndrome). Best-of-3 windows: the
    # shared host's CPU throughput drifts ~2x run-to-run, and the best
    # window is the closest estimate of actual single-core capability.
    # Cached on disk keyed by config, merged (not clobbered) with any
    # existing entries; delete the file to re-measure.
    import sys
    cache_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_native_baseline.json")
    cache_key = f"[[144,12,12]]_maxIter{maxIter}_osd{osd_order}"
    try:
        with open(cache_file) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    if cache_key in cache:
        baseline_rate = cache[cache_key]
    else:
        from qldpc_tpu.models.builder import channel_llrs
        from qldpc_tpu.native.build import baseline_decode_native
        H = (np.asarray(M["HdecZ"]) != 0).astype(np.uint8)
        prior = channel_llrs(M["channel_probsZ"])
        rng = np.random.default_rng(0)
        err_patterns = (rng.random((48, H.shape[1]))
                        < M["channel_probsZ"]).astype(np.int8)
        syns = ((err_patterns @ H.T) % 2).astype(np.uint8)
        num_test = (osd_order + 10) if osd_order > 0 else 0
        rates = []
        for _ in range(3):
            native = baseline_decode_native(H, prior, syns, maxIter, seq,
                                            order=osd_order,
                                            num_test=num_test)
            if native is None:  # no toolchain: python x75 estimate fallback
                py = estimate_python_baseline(H, prior, syns[:2], maxIter)
                rates.append(py * 75.0)
                break
            elapsed, _conv = native
            rates.append(len(syns) / elapsed)
        # a reference trial decodes BOTH bases; the measurement is one basis
        baseline_rate = max(rates) / 2.0
        cache[cache_key] = baseline_rate
        with open(cache_file, "w") as f:
            json.dump(cache, f)
    print(f"baseline: measured native single-core "
          f"{baseline_rate:.1f} trials/s (both-basis decode)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "decoded_shots_per_sec_per_chip_[[144,12,12]]",
        "value": round(shots_per_sec, 1),
        "unit": "shots/s",
        "vs_baseline": round(shots_per_sec / baseline_rate, 1),
    }))


if __name__ == "__main__":
    main()
