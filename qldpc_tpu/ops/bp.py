"""Batched normalized min-sum belief propagation over padded-CSR Tanner graphs.

TPU-first design: one decoder instance decodes B shots simultaneously with
the batch on the minor (lane) axis. Message state lives in a padded
row-major edge layout (m, dr, B) — dr = max check degree (<= 35 for the BB
decoding graphs) — so the check update is pure vectorized two-pass
min1/min2 + sign work with no gather. The variable update gathers R into a
padded column layout (n, dc, B) (dc <= 6) with static indices, sums, and
scatters posteriors back through a second static gather. The whole
iteration loop runs under one jit with a while_loop that exits when every
shot in the batch has converged.

Algorithm parity with the reference decoders (dense
reference src/decoding/dense.py:5-73 + kernels.py:108-136; fused sparse
reference src/decoding/kernels.py:234-366): identical message schedule
(flooding), sign convention (val >= 0 is +), first-argmin min1/min2
semantics, damping + double clipping, per-iteration hard decision and
syndrome check, alpha schedules (dynamical 1 - 2^-(k+1), fixed Alvarado
scalar, per-iteration autoregressive sequence). Per-shot early exit is
replaced by per-shot convergence freezing + whole-batch exit, which returns
bit-identical results to per-shot exit.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e30  # padded-lane magnitude: sign +, never the row min


@dataclasses.dataclass(frozen=True)
class TannerGraph:
    """Padded-CSR structure of a parity-check matrix (static, device arrays)."""

    row_cols: jax.Array   # (m, dr) int32: column of each row edge (pad: n)
    row_mask: jax.Array   # (m, dr) bool: real-edge mask
    col_edges: jax.Array  # (n, dc) int32: flat row-edge slot per column edge
                          #   (pad: m * dr, a dummy zero slot)
    col_mask: jax.Array   # (n, dc) bool
    m: int
    n: int
    dr: int
    dc: int

    @staticmethod
    def from_dense(H: np.ndarray) -> "TannerGraph":
        H = (np.asarray(H) != 0)
        m, n = H.shape
        deg_r = H.sum(1)
        deg_c = H.sum(0)
        dr = max(int(deg_r.max()), 1)
        dc = max(int(deg_c.max()), 1)
        row_cols = np.full((m, dr), n, dtype=np.int32)
        row_mask = np.zeros((m, dr), dtype=bool)
        col_edges = np.full((n, dc), m * dr, dtype=np.int32)
        col_mask = np.zeros((n, dc), dtype=bool)
        col_fill = np.zeros(n, dtype=np.int64)
        for i in range(m):
            cols = np.nonzero(H[i])[0]
            row_cols[i, :len(cols)] = cols
            row_mask[i, :len(cols)] = True
            for e, j in enumerate(cols):
                col_edges[j, col_fill[j]] = i * dr + e
                col_fill[j] += 1
        col_mask = col_edges < m * dr
        return TannerGraph(
            row_cols=jnp.asarray(row_cols), row_mask=jnp.asarray(row_mask),
            col_edges=jnp.asarray(col_edges), col_mask=jnp.asarray(col_mask),
            m=m, n=n, dr=dr, dc=dc)


jax.tree_util.register_pytree_node(
    TannerGraph,
    lambda g: ((g.row_cols, g.row_mask, g.col_edges, g.col_mask),
               (g.m, g.n, g.dr, g.dc)),
    lambda aux, ch: TannerGraph(*ch, *aux),
)


def alpha_schedule(mode: str, maxIter: int, alpha=1.0) -> np.ndarray:
    """Per-iteration normalization factors (reference dense.py:47-51)."""
    if mode == "dynamical":
        return (1.0 - 2.0 ** (-(np.arange(maxIter) + 1.0))).astype(np.float32)
    if mode == "alvarado":
        a = float(alpha)
        if a <= 0:
            raise ValueError("alpha must be > 0 when alpha_mode='alvarado'")
        return np.full(maxIter, a, dtype=np.float32)
    if mode == "alvarado-autoregressive":
        seq = np.asarray(alpha, dtype=np.float32).ravel()
        if seq.size == 0:
            raise ValueError("alpha sequence must be non-empty")
        if seq.size >= maxIter:
            return seq[:maxIter].copy()
        return np.concatenate([seq, np.full(maxIter - seq.size, seq[-1],
                                            dtype=np.float32)])
    raise ValueError(f"Unsupported alpha_mode: {mode}")


def _check_update(Q_rows, sgn_syn, alpha):
    """Two-pass min-sum check update. Q_rows (m, dr, B); padded lanes hold
    +_BIG. Returns R_rows with exact first-argmin min1/min2 semantics.
    All arithmetic stays in Q_rows.dtype (f32 or bf16)."""
    dt = Q_rows.dtype
    absQ = jnp.abs(Q_rows)
    neg = Q_rows < 0.0
    row_neg = jnp.sum(neg, axis=1) & 1                      # (m, B)
    sgn_prod = (jnp.where(row_neg == 1, -1.0, 1.0).astype(dt)
                * sgn_syn.astype(dt))                       # (m, B)
    min1 = jnp.min(absQ, axis=1, keepdims=True)             # (m, 1, B)
    idx1 = jnp.argmin(absQ, axis=1)                          # (m, B) first min
    lane = jax.lax.broadcasted_iota(jnp.int32, Q_rows.shape, 1)
    is_min1 = lane == idx1[:, None, :]
    min2 = jnp.min(jnp.where(is_min1, jnp.asarray(_BIG, dt), absQ),
                   axis=1, keepdims=True)
    mag = jnp.where(is_min1, min2, min1)
    sgn_q = jnp.where(neg, -1.0, 1.0).astype(dt)
    return alpha.astype(dt) * sgn_prod[:, None, :] * sgn_q * mag


def _variable_update(R_rows, prior, graph: TannerGraph, mask3):
    """Posterior + extrinsic Q from R.

    Returns (values (n, B), Q_rows, vals_rows): vals_rows is the row-layout
    gather of the posteriors, exposed so the caller's syndrome check can
    reuse it (hard_rows = vals_rows < 0) instead of issuing a second gather
    with the same indices — gathers dominate the iteration cost on TPU.

    Padding is handled on the GATHER-DESTINATION side (clamped indices +
    masked where): appending a dummy zero row to the 36MB edge tensor costs
    a full copy of it every iteration, while the col-side mask fuses into
    the posterior reduction for free. Padded row-layout lanes come back as
    garbage and are overwritten by the caller's mask3 select.
    """
    B = R_rows.shape[-1]
    dt = R_rows.dtype
    R_flat = R_rows.reshape(graph.m * graph.dr, B)
    # padded col_edges are clamped into range; their values are masked off
    ce = jnp.minimum(graph.col_edges.reshape(-1), graph.m * graph.dr - 1)
    R_cols = jnp.take(R_flat, ce, axis=0).reshape(graph.n, graph.dc, B)
    R_cols = jnp.where(graph.col_mask[:, :, None], R_cols,
                       jnp.asarray(0.0, dt))
    # posterior accumulation in f32 regardless of message dtype
    values = prior[:, None] + jnp.sum(R_cols, axis=1, dtype=jnp.float32)
    rc = jnp.minimum(graph.row_cols.reshape(-1), graph.n - 1)
    vals_rows = jnp.take(values.astype(dt), rc, axis=0)
    vals_rows = vals_rows.reshape(graph.m, graph.dr, B)
    return values, vals_rows - R_rows, vals_rows


def _syndrome_of(hard, graph: TannerGraph):
    """(m, B) parity of hard decisions over each check's support."""
    B = hard.shape[-1]
    hard_pad = jnp.concatenate([hard, jnp.zeros((1, B), hard.dtype)], 0)
    h_rows = jnp.take(hard_pad, graph.row_cols.reshape(-1), axis=0)
    return jnp.sum(h_rows.reshape(graph.m, graph.dr, B), axis=1) & 1


@partial(jax.jit, static_argnames=("maxIter", "damping", "msg_dtype"))
def decode_batch(graph: TannerGraph, syndrome, prior, alpha_seq,
                 maxIter: int, damping: float = 1.0, clip_llr: float = 20.0,
                 msg_dtype=jnp.float32):
    """Decode a batch of syndromes.

    Args:
      graph: TannerGraph of the (class-level) decoding matrix.
      syndrome: (B, m) int8 sparse syndromes.
      prior: (n,) f32 channel LLRs.
      alpha_seq: (maxIter,) f32 per-iteration normalization.
      maxIter, damping, clip_llr: as in the reference decoders.
      msg_dtype: storage/compute dtype of the edge messages. float32 matches
        the reference bit-for-bit; bfloat16 halves the gather traffic that
        dominates the iteration cost on TPU (posterior accumulation stays
        f32) at statistically negligible LER cost — validated in
        tests/test_bp.py and scripts/validate_ler.py.

    Returns dict: hard (B, n) int8 error estimate, converged (B,) bool,
    values (B, n) f32 posterior LLRs, iterations (B,) int32 — all frozen at
    each shot's first syndrome-satisfying iteration.
    """
    B = syndrome.shape[0]
    dt = jnp.dtype(msg_dtype)
    syn = syndrome.T.astype(jnp.int32)                       # (m, B)
    sgn_syn = (1.0 - 2.0 * syn).astype(jnp.float32)
    prior = prior.astype(jnp.float32)
    mask3 = graph.row_mask[:, :, None]
    prior_pad = jnp.concatenate([prior, jnp.zeros((1,), jnp.float32)])
    Q0 = jnp.take(prior_pad, graph.row_cols.reshape(-1), axis=0)
    Q0 = jnp.broadcast_to(Q0.reshape(graph.m, graph.dr, 1),
                          (graph.m, graph.dr, B)).astype(dt)
    Q0 = jnp.where(mask3, Q0, jnp.asarray(_BIG, dt))
    clip_lo = jnp.asarray(-clip_llr, dt)
    clip_hi = jnp.asarray(clip_llr, dt)
    def body(state):
        it, Q, Qold, done, vals, iters = state
        alpha = alpha_seq[it]
        R = _check_update(Q, sgn_syn, alpha)
        values, Q_new, vals_rows = _variable_update(R, prior, graph, mask3)
        Q_new = jnp.clip(Q_new, clip_lo, clip_hi)
        if damping != 1.0:
            Q_new = (jnp.asarray(damping, dt) * Q_new
                     + jnp.asarray(1.0 - damping, dt) * Qold)
            Q_new = jnp.clip(Q_new, clip_lo, clip_hi)
        Q_new = jnp.where(mask3, Q_new, jnp.asarray(_BIG, dt))
        # syndrome check reuses the row-layout posterior gather: the hard
        # decision of edge (i, d) is vals_rows < 0 (padding gathers a 0)
        hard_rows = ((vals_rows < 0.0) & graph.row_mask[:, :, None])
        parity = jnp.sum(hard_rows.astype(jnp.int32), axis=1) & 1  # (m, B)
        ok = jnp.all(parity == syn, axis=0)                  # (B,)
        # Freeze posteriors at each shot's first convergence; unconverged
        # shots keep updating so they report final-iteration state
        # (reference dense.py:71-73). Q itself is NOT frozen — once a shot
        # is done its messages no longer influence any output, and skipping
        # the freeze saves a full (m, dr, B) pass per iteration.
        vals = jnp.where(done[None, :], vals, values)
        iters = jnp.where(ok & ~done, it, iters)
        done = done | ok
        Qold_new = Q_new if damping != 1.0 else Qold
        return it + 1, Q_new, Qold_new, done, vals, iters

    def cond(state):
        it, _, _, done, *_ = state
        return (it < maxIter) & ~jnp.all(done)

    init = (jnp.int32(0), Q0, Q0, jnp.zeros(B, bool),
            jnp.zeros((graph.n, B), jnp.float32),
            jnp.full(B, maxIter - 1, jnp.int32))
    it, Q, Qold, done, vals, iters = jax.lax.while_loop(cond, body, init)

    # the hard decision is a pure function of the frozen posteriors
    cand = (vals < 0.0).astype(jnp.int8)
    return dict(hard=cand.T, converged=done, values=vals.T, iterations=iters)


def _tanh_check_update(Q_rows, sgn_syn, clip_val):
    """Tanh/arctanh true-BP check update (reference bp_core,
    src/decoding/kernels.py:171-193). Padded lanes hold +_BIG, whose tanh is
    exactly 1.0 — the multiplicative identity of the row product. The
    excluded-self product uses the reference's row_prod / t_j division, and
    near-zero tanh factors are floored at +-1e-15 with the reference's
    sign convention (t >= 0 -> +1e-15)."""
    t = jnp.tanh(Q_rows * 0.5)
    floor = jnp.where(t >= 0.0, 1e-15, -1e-15).astype(t.dtype)
    t = jnp.where(jnp.abs(t) < 1e-15, floor, t)
    row_prod = jnp.prod(t, axis=1)                           # (m, B)
    prod_others = row_prod[:, None, :] / t
    prod_c = jnp.clip(prod_others * sgn_syn[:, None, :].astype(t.dtype),
                      -clip_val, clip_val)
    return 2.0 * jnp.arctanh(prod_c)


@partial(jax.jit, static_argnames=("maxIter",))
def decode_batch_tanh(graph: TannerGraph, syndrome, prior, maxIter: int,
                      clip_val: float = 0.9999999):
    """Batched tanh-based true belief propagation.

    Counterpart of the reference's performBeliefPropagationFast
    (src/decoding/dense.py:75-96): no normalization alpha, no damping, no
    message clipping — messages are bounded by 2*arctanh(clip_val) (~16.8)
    instead. Same flooding schedule, per-iteration hard decision + sparse
    syndrome check, and early exit as decode_batch; returns the same dict.
    Messages are float32 (the tanh/arctanh chain needs the mantissa; this
    variant is a capability path, not the perf path).
    """
    B = syndrome.shape[0]
    syn = syndrome.T.astype(jnp.int32)                       # (m, B)
    sgn_syn = (1.0 - 2.0 * syn).astype(jnp.float32)
    prior = prior.astype(jnp.float32)
    mask3 = graph.row_mask[:, :, None]
    prior_pad = jnp.concatenate([prior, jnp.zeros((1,), jnp.float32)])
    Q0 = jnp.take(prior_pad, graph.row_cols.reshape(-1), axis=0)
    Q0 = jnp.broadcast_to(Q0.reshape(graph.m, graph.dr, 1),
                          (graph.m, graph.dr, B))
    Q0 = jnp.where(mask3, Q0, _BIG)

    def body(state):
        it, Q, done, vals, iters = state
        R = _tanh_check_update(Q, sgn_syn, clip_val)
        values, Q_new, vals_rows = _variable_update(R, prior, graph, mask3)
        Q_new = jnp.where(mask3, Q_new, _BIG)
        hard_rows = ((vals_rows < 0.0) & graph.row_mask[:, :, None])
        parity = jnp.sum(hard_rows.astype(jnp.int32), axis=1) & 1
        ok = jnp.all(parity == syn, axis=0)
        vals = jnp.where(done[None, :], vals, values)
        iters = jnp.where(ok & ~done, it, iters)
        done = done | ok
        return it + 1, Q_new, done, vals, iters

    def cond(state):
        it, _, done, *_ = state
        return (it < maxIter) & ~jnp.all(done)

    init = (jnp.int32(0), Q0, jnp.zeros(B, bool),
            jnp.zeros((graph.n, B), jnp.float32),
            jnp.full(B, maxIter - 1, jnp.int32))
    _, _, done, vals, iters = jax.lax.while_loop(cond, body, init)
    cand = (vals < 0.0).astype(jnp.int8)
    return dict(hard=cand.T, converged=done, values=vals.T, iterations=iters)


@partial(jax.jit, static_argnames=("damping",))
def harvest_messages(graph: TannerGraph, syndrome, prior, alpha_seq,
                     advance_iters, damping: float = 1.0,
                     clip_llr: float = 20.0):
    """Advance BP ``advance_iters`` iterations (NO convergence exit —
    calibration advances state unconditionally, reference alpha.py:219-244),
    then run one unscaled (alpha=1) check pass and return its messages.

    ``advance_iters`` is a TRACED value (dynamic fori bound), so the
    autoregressive estimator's k = 0..maxIter-1 sweep reuses one compiled
    program instead of recompiling per iteration count.

    Returns (R_rows (m, dr, B) unscaled messages, edge column ids (m, dr)).
    Used by Alvarado / autoregressive-Alvarado alpha estimation, which
    buckets messages by the true bit value of the edge's column.
    """
    B = syndrome.shape[0]
    syn = syndrome.T.astype(jnp.int32)
    sgn_syn = (1.0 - 2.0 * syn).astype(jnp.float32)
    prior = prior.astype(jnp.float32)
    mask3 = graph.row_mask[:, :, None]
    prior_pad = jnp.concatenate([prior, jnp.zeros((1,), jnp.float32)])
    Q = jnp.take(prior_pad, graph.row_cols.reshape(-1), axis=0)
    Q = jnp.broadcast_to(Q.reshape(graph.m, graph.dr, 1),
                         (graph.m, graph.dr, B))
    Q = jnp.where(mask3, Q, _BIG)

    def body(it, carry):
        Q, Qold = carry
        R = _check_update(Q, sgn_syn, alpha_seq[it])
        _, Q_new, _ = _variable_update(R, prior, graph, mask3)
        Q_new = jnp.clip(Q_new, -clip_llr, clip_llr)
        if damping != 1.0:
            Q_new = jnp.clip(damping * Q_new + (1.0 - damping) * Qold,
                             -clip_llr, clip_llr)
        Q_new = jnp.where(mask3, Q_new, _BIG)
        return Q_new, Q_new

    Q, _ = jax.lax.fori_loop(0, advance_iters, body, (Q, Q))
    R = _check_update(Q, sgn_syn, jnp.float32(1.0))
    return R, graph.row_cols
