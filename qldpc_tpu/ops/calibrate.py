"""Data-driven min-sum calibration: Alvarado alpha, autoregressive alpha,
and SCOPT beta.

TPU-first reformulation of the reference's per-trial estimation loops
(reference src/decoding/alpha.py:84-276, src/decoding/scopt.py:8-177):
all ``trials`` iid error samples are drawn, propagated to syndromes, and
message-harvested as ONE batched BP computation per estimation point; only
the histogram + linear fit run host-side (scipy curve_fit, exactly the
reference's log(f0/f1) = alpha * lambda model, alpha.py:29-66).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .bp import TannerGraph, alpha_schedule, decode_batch, harvest_messages

import logging

logger = logging.getLogger(__name__)


def _dynamical_alpha(k: int) -> float:
    """The dynamical schedule value for iteration k (kernels.py:273)."""
    return 1.0 - 2.0 ** (-(k + 1))


def _gate_alpha(a: float, r2: float, k: int, r2_gate: float,
                alpha_range: Tuple[float, float]) -> Tuple[float, bool]:
    """Accept a fitted per-iteration alpha only if the fit is trustworthy.

    The reference ships the raw fit unconditionally (alpha.py:160-276),
    which demonstrably collapses decoding at [[288]] scale when one noisy
    early fit corrupts every subsequent autoregressive advance
    (VALIDATION.md: LER 1.000). Guardrail: require R^2 >= r2_gate AND the
    value inside a physically sensible range; otherwise substitute the
    dynamical schedule value for this iteration (and feed THAT into the
    subsequent advances). Returns (alpha, used_fallback)."""
    lo, hi = alpha_range
    if np.isfinite(a) and np.isfinite(r2) and r2 >= r2_gate and lo <= a <= hi:
        return a, False
    return _dynamical_alpha(k), True


def _fit_log_ratio(x0, x1, bins: int, flip: bool = False,
                   plot_path: Optional[str] = None, title: str = ""):
    """Histogram two sample sets, fit log(f0/f1) = a*x (or f1/f0 with
    flip=True), return (a, r2). Reference alpha.py:9-66 / scopt.py:141-160."""
    from scipy.optimize import curve_fit

    x0 = np.asarray(x0, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    # Degree-1 check rows emit messages of magnitude _BIG (the decoder's
    # finite stand-in for the reference's +-inf, see ops/bp.py); the
    # reference drops infinite samples before fitting (alpha.py:23-24), so
    # drop their finite analogue the same way — without this the histogram
    # range explodes and every fit collapses to alpha = 0.
    x0 = x0[np.isfinite(x0) & (np.abs(x0) < 1e29)]
    x1 = x1[np.isfinite(x1) & (np.abs(x1) < 1e29)]
    if x0.size == 0 or x1.size == 0:
        raise ValueError("No finite samples for calibration fit")
    rng = (min(x0.min(), x1.min()), max(x0.max(), x1.max()))
    h0, edges = np.histogram(x0, bins=bins, range=rng, density=True)
    h1, _ = np.histogram(x1, bins=bins, range=rng, density=True)
    centers = (edges[:-1] + edges[1:]) / 2.0
    valid = (h0 > 0) & (h1 > 0)
    if not np.any(valid):
        raise ValueError("No overlapping histogram bins for calibration fit")
    xs = centers[valid]
    ys = (np.log(h1[valid] / h0[valid]) if flip
          else np.log(h0[valid] / h1[valid]))
    popt, _ = curve_fit(lambda x, a: a * x, xs, ys)
    a = float(popt[0])
    fit = a * xs
    ss_res = np.sum((ys - fit) ** 2)
    ss_tot = np.sum((ys - np.mean(ys)) ** 2)
    r2 = 1.0 - (ss_res / ss_tot if ss_tot > 0 else np.nan)
    if plot_path is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(6, 4))
        plt.scatter(xs, ys, s=10, alpha=0.7, label="samples")
        plt.plot(xs, fit, color="#DBA142", label=f"fit (R^2={r2:.3f})")
        plt.xlabel("LLR" if flip else "Lambda")
        plt.ylabel("log(f1/f0)" if flip else "log(f0/f1)")
        plt.title(title)
        plt.grid(True, ls="-", alpha=0.4)
        plt.legend()
        plt.tight_layout()
        plt.savefig(plot_path, dpi=150)
        plt.close()
    return a, float(r2)


def _sample_errors_and_syndromes(key, H_bf16, n, error_rate, trials):
    """iid Bernoulli(error_rate) errors per decoding-graph column and their
    syndromes (the reference calibrates on this simplified channel,
    alpha.py:127-128 — NOT the circuit-level channel)."""
    e = jax.random.uniform(key, (trials, n)) < error_rate
    syn = (jnp.dot(e.astype(jnp.bfloat16), H_bf16,
                   preferred_element_type=jnp.float32).astype(jnp.int32) & 1)
    return e, syn.astype(jnp.int8)


def _harvest_buckets(graph, H_bf16, prior, error_rate, trials, key,
                     alpha_prefix, advance_iters, chunk=512,
                     seq_len=None):
    """Collect unscaled check messages bucketed by the true bit value of the
    edge's variable, advancing ``advance_iters`` BP iterations first.

    ``seq_len`` fixes the alpha-sequence array length so the autoregressive
    sweep (k = 0..maxIter-1) reuses ONE compiled harvest program — the
    advance count itself is a dynamic loop bound."""
    n = graph.n
    maxI = seq_len if seq_len is not None else max(advance_iters, 1)
    seq = np.zeros(maxI, dtype=np.float32)
    seq[:len(alpha_prefix)] = alpha_prefix[:maxI]
    seq_j = jnp.asarray(seq)
    mask = np.asarray(graph.row_mask)
    cols = np.asarray(graph.row_cols)[mask]          # (nnz,) column per edge
    out0, out1 = [], []
    done = 0
    while done < trials:
        t = min(chunk, trials - done)
        kk = jax.random.fold_in(key, done)
        e, syn = _sample_errors_and_syndromes(kk, H_bf16, n, error_rate, t)
        R, _ = harvest_messages(graph, syn, prior, seq_j, advance_iters)
        R = np.asarray(R)                             # (m, dr, t)
        bits = np.asarray(e).T[cols]                  # (nnz, t) true bits
        msgs = R[mask]                                # (nnz, t)
        out0.append(msgs[~bits.astype(bool)].astype(np.float32))
        out1.append(msgs[bits.astype(bool)].astype(np.float32))
        done += t
    return np.concatenate(out0), np.concatenate(out1)


def estimate_alpha_alvarado(H, error_rate, trials=5000, bins=50, llrs=None,
                            key=None, plot_path: Optional[str] = None
                            ) -> Tuple[float, float]:
    """Single-alpha Alvarado estimation from one unscaled min-sum pass
    (reference alpha.py:84-157)."""
    if not (0 < error_rate < 0.5):
        raise ValueError("error_rate must be in (0, 0.5)")
    graph = TannerGraph.from_dense(H)
    H_bf16 = jnp.asarray((np.asarray(H) != 0).astype(np.float32),
                         dtype=jnp.bfloat16).T  # (n, m)
    prior = jnp.asarray(llrs, dtype=jnp.float32)
    key = key if key is not None else jax.random.key(0)
    t0, t1 = _harvest_buckets(graph, H_bf16, prior, error_rate, trials, key,
                              np.zeros(0, np.float32), 0)
    return _fit_log_ratio(t0, t1, bins, plot_path=plot_path,
                          title=f"Alvarado alpha fit (p={error_rate:.6g})")


def estimate_alpha_alvarado_autoregressive(
        H, error_rate, maxIter, trials=5000, bins=50, llrs=None, key=None,
        plot_dir: Optional[str] = None, plot_prefix: Optional[str] = None,
        r2_gate: float = 0.85, alpha_range: Tuple[float, float] = (0.05, 1.5),
        return_fallbacks: bool = False):
    """Per-iteration alpha sequence: iteration k's alpha is fit from
    unscaled messages after advancing k iterations with alpha_0..k-1
    (reference alpha.py:160-276).

    Unlike the reference, each fitted value is R^2- and range-gated
    (see _gate_alpha): untrustworthy fits fall back to the dynamical
    schedule value for that iteration instead of poisoning the rest of the
    sequence. Set r2_gate=-inf AND alpha_range=(-inf, inf) to
    reproduce the reference's ungated behavior exactly."""
    if not (0 < error_rate < 0.5):
        raise ValueError("error_rate must be in (0, 0.5)")
    if maxIter <= 0:
        raise ValueError("maxIter must be > 0")
    graph = TannerGraph.from_dense(H)
    H_bf16 = jnp.asarray((np.asarray(H) != 0).astype(np.float32),
                         dtype=jnp.bfloat16).T
    prior = jnp.asarray(llrs, dtype=jnp.float32)
    key = key if key is not None else jax.random.key(0)
    alphas, r2s = [], []
    n_fallback = 0
    for k in range(maxIter):
        plot_path = None
        if plot_dir is not None:
            prefix = plot_prefix or f"autoregressive_p{error_rate:.6g}"
            plot_path = f"{plot_dir}/{prefix}_iter{k + 1}_alpha_fit.png"
        try:
            t0, t1 = _harvest_buckets(
                graph, H_bf16, prior, error_rate, trials,
                jax.random.fold_in(key, 7919 * k),
                np.asarray(alphas, dtype=np.float32), k, seq_len=maxIter)
            a, r2 = _fit_log_ratio(
                t0, t1, bins, plot_path=plot_path,
                title=f"Autoregressive alpha fit "
                      f"(p={error_rate:.6g}, iter={k+1})")
        except (ValueError, RuntimeError) as e:
            logger.warning("autoregressive alpha fit failed at iter %d "
                           "(%s); using dynamical value", k + 1, e)
            a, r2 = np.nan, np.nan
        a, fell_back = _gate_alpha(a, r2, k, r2_gate, alpha_range)
        n_fallback += fell_back
        alphas.append(a)
        r2s.append(r2)
    if n_fallback:
        logger.warning(
            "autoregressive alpha: %d/%d iterations failed the fit gate "
            "(R^2 < %.2f or alpha outside %s) and used the dynamical "
            "schedule value instead", n_fallback, maxIter, r2_gate,
            alpha_range)
    out = (np.asarray(alphas, dtype=np.float64),
           np.asarray(r2s, dtype=np.float64))
    return out + (n_fallback,) if return_fallbacks else out


def estimate_scopt_beta(H, error_rate, trials=10000, bins=50, alpha=1.0,
                        alpha_mode="dynamical", maxIter=50, llrs=None,
                        key=None, plot_path: Optional[str] = None,
                        chunk=512) -> Tuple[float, float]:
    """SCOPT beta: fit log(f1/f0) = beta * x on FINAL posterior LLRs after a
    full (early-exiting) min-sum decode (reference scopt.py:8-177)."""
    if not (0 < error_rate < 0.5):
        raise ValueError("error_rate must be in (0, 0.5)")
    graph = TannerGraph.from_dense(H)
    H_bf16 = jnp.asarray((np.asarray(H) != 0).astype(np.float32),
                         dtype=jnp.bfloat16).T
    prior = jnp.asarray(llrs, dtype=jnp.float32)
    seq = jnp.asarray(alpha_schedule(alpha_mode, maxIter, alpha))
    key = key if key is not None else jax.random.key(0)
    f0, f1 = [], []
    done = 0
    while done < trials:
        t = min(chunk, trials - done)
        e, syn = _sample_errors_and_syndromes(
            jax.random.fold_in(key, done), H_bf16, graph.n, error_rate, t)
        dec = decode_batch(graph, syn, prior, seq, maxIter)
        vals = np.asarray(dec["values"])              # (t, n) frozen at conv
        bits = np.asarray(e)
        f0.append(vals[~bits].astype(np.float32))
        f1.append(vals[bits].astype(np.float32))
        done += t
    return _fit_log_ratio(np.concatenate(f0), np.concatenate(f1), bins,
                          flip=True, plot_path=plot_path,
                          title=f"SCOPT beta fit (p={error_rate:.6g})")
