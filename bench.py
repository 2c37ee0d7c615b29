"""Benchmark: decoded shots/sec/chip on [[144,12,12]] (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"extra" carries the [[288,12,18]] flagship-scale number and a per-stage
timing/roofline audit (sample / BP / OSD ms, BP effective VMEM bandwidth,
HBM roofline fractions) so "is it actually fast" is answerable from the
bench artifact alone (VERDICT r3 item 4).

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
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HBM_GBPS = 819.0  # v5e HBM roofline


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


def _build(code_name, p, maxIter, osd_order):
    from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
    from qldpc_tpu.ops.bp import alpha_schedule
    from qldpc_tpu.parallel.engine import _make_basis
    from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                         save_matrices)

    code = get_code(code_name)
    cycles = code.distance
    circ = SyndromeCircuit(code, num_cycles=cycles)
    key_c = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, cycles, p)
    M = load_matrices("matrix_cache", key_c)
    if M is None:
        M = build_decoding_matrices(circ, code.Lx, code.Lz, p)
        save_matrices("matrix_cache", key_c, M)
    seq = alpha_schedule("dynamical", maxIter)
    dec_z = _make_basis(circ, M, "Z", seq, osd_order=osd_order)
    dec_x = _make_basis(circ, M, "X", seq, osd_order=osd_order)
    return code, circ, M, dec_z, dec_x, seq


def bench_config(code_name, p, batch, rpd, maxIter, osd_order,
                 bp_variant="minsum", seconds=8.0):
    """Measured decode throughput for one code config. Returns
    (shots_per_sec, errors_seen, total_rounds, built objects)."""
    import jax

    from qldpc_tpu.parallel.engine import (make_key, make_pooled_round_fn,
                                           make_round_fn,
                                           make_scanned_round_fn)
    from qldpc_tpu.utils.benchloop import timed_windows

    code, circ, M, dec_z, dec_x, seq = _build(code_name, p, maxIter,
                                              osd_order)
    # cross-round OSD compaction (bit-identical, cost-only; engine default)
    pooled = os.environ.get("BENCH_POOLED", "1") != "0" and rpd > 1
    if pooled:
        base_fn = make_pooled_round_fn(dec_z, dec_x, circ.num_error_locs,
                                       p, batch, maxIter, osd_order, rpd,
                                       bp_variant=bp_variant)
        fn = jax.jit(base_fn)
    else:
        base_fn = make_round_fn(dec_z, dec_x, circ.num_error_locs, p, batch,
                                maxIter, osd_order, bp_variant=bp_variant)
        fn = jax.jit(base_fn if rpd == 1
                     else make_scanned_round_fn(base_fn, rpd))
    key = make_key(0)
    errs_box = [0]
    shots_per_sec, total_rounds = timed_windows(
        lambda i: fn(jax.random.fold_in(key, i), dec_z, dec_x),
        batch * rpd, seconds=seconds,
        on_round=lambda out: errs_box.__setitem__(
            0, errs_box[0] + int(out["any_err"].sum())))
    assert 0 < errs_box[0] < total_rounds * batch * rpd, \
        "decode produced degenerate flags"
    return shots_per_sec, errs_box[0], total_rounds, (circ, M, dec_z, dec_x)


def native_baseline(cache_key, M, seq, maxIter, osd_order, n_syn=48):
    """Measured single-core native C++ baseline (trials/s, both bases),
    disk-cached per config; see module docstring."""
    cache_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_native_baseline.json")
    try:
        with open(cache_file) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    if cache_key in cache:
        return cache[cache_key]
    from qldpc_tpu.models.builder import channel_llrs
    from qldpc_tpu.native.build import baseline_decode_native
    H = (np.asarray(M["HdecZ"]) != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"])
    rng = np.random.default_rng(0)
    err_patterns = (rng.random((n_syn, H.shape[1]))
                    < M["channel_probsZ"]).astype(np.int8)
    syns = ((err_patterns @ H.T) % 2).astype(np.uint8)
    num_test = (osd_order + 10) if osd_order > 0 else 0
    rates = []
    for _ in range(3):
        native = baseline_decode_native(H, prior, syns, maxIter, seq,
                                        order=osd_order, num_test=num_test)
        if native is None:  # no toolchain: python x75 estimate fallback
            py = estimate_python_baseline(H, prior, syns[:2], maxIter)
            rates.append(py * 75.0)
            break
        elapsed, _conv = native
        rates.append(len(syns) / elapsed)
    baseline_rate = max(rates) / 2.0  # a reference trial decodes BOTH bases
    cache[cache_key] = baseline_rate
    with open(cache_file, "w") as f:
        json.dump(cache, f)
    return baseline_rate


def stage_audit(circ, dec_z, dec_x, p, batch, maxIter, osd_order,
                round_shots_per_sec, bp_variant="minsum", passes=4):
    """Same-session per-stage ms + roofline figures for the bench config.

    Timing method: every stage is timed in ROUND-ROBIN interleaved passes
    and reported as its minimum — the tunneled chip's throughput drifts on
    minute scales, so back-to-back per-stage loops can hand one stage a
    bad window and produce impossible audits (stages summing past the
    measured round). Interleaving gives each stage a draw from each
    window; the min is the closest estimate of the chip's capability
    (same rationale as utils/benchloop.timed_windows).

    BP utilization is reported two ways: HBM traffic of the VMEM-resident
    kernel call as a fraction of the 819GB/s roofline (tiny by design —
    the kernel's point is that per-iteration state never touches HBM), and
    the kernel's EFFECTIVE VMEM bandwidth from the slab-touch model
    (~5 edge-stack traversals per iteration). OSD is characterized by its
    measured full-batch ms and a cond-gating-aware share of the round:
    the engine eliminates ~the unconverged fraction of sorted chunks
    (the elimination's per-step floor and exit-depth data live in
    CLAUDE.md / scripts/osd288_probe.py)."""
    import jax
    import jax.numpy as jnp

    from qldpc_tpu.ops import sampler
    from qldpc_tpu.ops.bp_lift_pallas import (decode_batch_lift_pallas,
                                              viable_block_b)
    from qldpc_tpu.ops.osd import osd_batch
    from qldpc_tpu.parallel.engine import make_key

    key = make_key(1)
    audit = {}
    g = dec_z.lifted
    schedule = "layered" if bp_variant == "layered" else "flooding"
    use_kernel = g is not None and \
        viable_block_b(g, B=batch, schedule=schedule) is not None

    samp = jax.jit(lambda k, mz, mx: sampler.trial_batch(
        k, p, mz, mx, circ.num_error_locs, batch=batch))
    syn_z = samp(key, dec_z.maps, dec_x.maps)["syndrome_z"]

    if use_kernel:
        bp_full = jax.jit(lambda s, d: decode_batch_lift_pallas(
            d.lifted, s, d.prior, d.alpha_seq, maxIter,
            msg_dtype=jnp.float32, schedule=schedule))
        bp_fn = jax.jit(lambda s, d: [v.sum() if hasattr(v, "sum") else v
                                      for v in bp_full(s, d).values()])
    else:
        from qldpc_tpu.ops.bp_lift import decode_batch_lift
        bp_full = jax.jit(lambda s, d: decode_batch_lift(
            d.lifted, s, d.prior, d.alpha_seq, maxIter,
            msg_dtype=jnp.bfloat16))
        bp_fn = jax.jit(lambda s, d: [v.sum() for v in
                                      bp_full(s, d).values()])
    r = bp_full(syn_z, dec_z)
    vals, hard = r["values"], r["hard"]
    if use_kernel:
        audit["bp_unconverged_frac"] = round(
            1.0 - float(jax.device_get(r["converged"].sum())) / batch, 3)

    def osd_small(s, v, h, d):
        rr = osd_batch(d.H, d.HT_bf16, s, v, h, K=d.K, order=osd_order,
                       num_test=d.num_test, use_pallas=True, rank=d.rank,
                       basis_cols=d.basis_cols,
                       logical_pack=d.logical_pack, return_solution=False)
        return (rr["logical_delta_packed"].sum(), rr["valid"].sum(),
                rr["rank_deficient"].sum())

    stages = {
        "sample": (lambda: jax.device_get(
            {n: v.sum() for n, v in
             samp(key, dec_z.maps, dec_x.maps).items()})),
        "bp": (lambda: jax.device_get(bp_fn(syn_z, dec_z))),
        "osd": (lambda fn=jax.jit(osd_small): jax.device_get(
            fn(syn_z, vals, hard, dec_z))),
    }
    best = {}
    for name, fn in stages.items():
        fn()  # compile + warm
        best[name] = float("inf")
    for _ in range(max(3, passes)):
        for name, fn in stages.items():
            t0 = time.time()
            fn()
            best[name] = min(best[name], time.time() - t0)

    audit["sample_ms"] = round(best["sample"] * 1e3, 2)
    t_bp, t_osd = best["bp"], best["osd"]
    audit["bp_ms_per_basis"] = round(t_bp * 1e3, 2)
    if use_kernel:
        # HBM traffic of the kernel call: syn in + posteriors/hardpack out
        slab = g.ell * g.mm * g.T
        hbm_bytes = (batch * slab * 4            # syndrome grid in
                     + batch * slab * 4 * (g.NB + 1))  # vals + hardpack out
        audit["bp_hbm_gbps"] = round(hbm_bytes / t_bp / 1e9, 1)
        audit["bp_hbm_frac_of_roofline"] = round(
            hbm_bytes / t_bp / 1e9 / HBM_GBPS, 4)
        # effective VMEM bandwidth: ~5 traversals of the EB edge stack per
        # iteration (check pass read, R write+roll, V accumulate, Q update
        # read+write), upper-bounded by maxIter iterations per block
        EB = len(g.eb_pb)
        vmem_passes = 5 if schedule == "flooding" else 8
        vmem_bytes = batch * slab * 4 * EB * vmem_passes * maxIter
        audit["bp_vmem_eff_gbps_upper"] = round(vmem_bytes / t_bp / 1e9, 0)
    else:
        # the XLA lift streams the edge-message stack through HBM
        EB = len(g.eb_pb) if g is not None else dec_z.graph.dr
        slab = (g.ell * g.mm * g.T) if g is not None else dec_z.graph.m
        stream = batch * slab * 2 * EB * 15  # bf16, ~15 stack traversals
        audit["bp_hbm_gbps"] = round(stream * maxIter / t_bp / 1e9, 1)
        audit["bp_hbm_frac_of_roofline"] = round(
            stream * maxIter / t_bp / 1e9 / HBM_GBPS, 3)
    audit["osd_full_batch_ms_per_basis"] = round(t_osd * 1e3, 2)
    round_ms = batch / round_shots_per_sec * 1e3
    audit["round_ms_per_batch"] = round(round_ms, 2)
    # the engine's sorted cond-gated chunks eliminate ~the unconverged
    # fraction of the batch; full-batch x unconverged x 2 bases over the
    # measured round is the gating-aware share estimate
    unconv = audit.get("bp_unconverged_frac", 1.0)
    audit["osd_share_of_round_est"] = round(
        min(1.0, 2 * t_osd * unconv * 1e3 / round_ms), 3)
    audit["hbm_roofline_gbps"] = HBM_GBPS
    return audit


def main():
    maxIter = int(os.environ.get("BENCH_MAXITER", "50"))
    # 1024 is the measured sweet spot on v5e: the round has a ~19ms fixed
    # cost (dispatch share + in-program per-round overhead) that larger
    # batches amortize — 512: 7.9k, 1024: 9.3k, 2048: 9.4k shots/s
    # (within drift noise of 1024), measured 2026-08-20 back-to-back.
    # maxIter 50 = the reference ENGINE's own default (reference
    # engine.py:196); measured sweep in CLAUDE.md.
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    rpd = int(os.environ.get("BENCH_RPD", "4"))
    osd_order = 2
    bp_variant = os.environ.get("BENCH_BP_VARIANT", "minsum")

    shots_per_sec, _errs, _rounds, (circ, M, dec_z, dec_x) = bench_config(
        "[[144, 12, 12]]", 0.004, batch, rpd, maxIter, osd_order,
        bp_variant=bp_variant)

    from qldpc_tpu.ops.bp import alpha_schedule
    seq = alpha_schedule("dynamical", maxIter)
    baseline_rate = native_baseline(
        f"[[144,12,12]]_maxIter{maxIter}_osd{osd_order}", M, seq, maxIter,
        osd_order)
    print(f"baseline: measured native single-core "
          f"{baseline_rate:.1f} trials/s (both-basis decode)",
          file=sys.stderr)

    extra = {}
    try:
        audit = stage_audit(circ, dec_z, dec_x, 0.004, batch, maxIter,
                            osd_order, shots_per_sec,
                            bp_variant=bp_variant)
        extra["stage_audit_[[144,12,12]]"] = audit
    except Exception as e:  # pragma: no cover - audit must never kill bench
        extra["stage_audit_error"] = repr(e)

    if os.environ.get("BENCH_288", "1") != "0":
        try:
            b288 = int(os.environ.get("BENCH_288_BATCH", "256"))
            rpd288 = int(os.environ.get("BENCH_288_RPD", "2"))
            # [[288]] runs maxIter=200 by default: kernel-BP iterations are
            # nearly free and the better posteriors cut the OSD validity
            # scan ~2.7x (scripts/osd288_ab.py); the native baseline below
            # is measured at the SAME maxIter so vs_baseline compares the
            # identical decoder config on both sides.
            mi288 = int(os.environ.get("BENCH_288_MAXITER", "200"))
            sps288, _e, _r, (c288, M288, dz288, dx288) = bench_config(
                "[[288, 12, 18]]", 0.005, b288, rpd288, mi288, osd_order,
                bp_variant=bp_variant)
            extra["[[288,12,18]]_p0.005_shots_per_sec"] = round(sps288, 1)
            extra["[[288,12,18]]_maxIter"] = mi288
            seq288 = alpha_schedule("dynamical", mi288)
            base288 = native_baseline(
                f"[[288,12,18]]_maxIter{mi288}_osd{osd_order}", M288,
                seq288, mi288, osd_order, n_syn=6)
            extra["[[288,12,18]]_vs_baseline"] = round(sps288 / base288, 1)
            print(f"[[288]] baseline: {base288:.2f} trials/s; "
                  f"TPU {sps288:,.0f} shots/s", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            extra["bench_288_error"] = repr(e)

    print(json.dumps({
        "metric": "decoded_shots_per_sec_per_chip_[[144,12,12]]",
        "value": round(shots_per_sec, 1),
        "unit": "shots/s",
        "vs_baseline": round(shots_per_sec / baseline_rate, 1),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
