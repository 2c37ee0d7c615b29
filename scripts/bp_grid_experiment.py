"""NEGATIVE EXPERIMENT (moved out of the package): Cycle-periodic ("time-Toeplitz") layout for the min-sum BP decoder.

The circuit-level decoding graphs are block-banded and periodic along the
syndrome-cycle axis: every fault-equivalence class (column of HdecZ/HdecX)
is a time-shifted copy of one of a small number of local *patterns*. For
the [[144,12,12]] graph at 12 cycles, the 8785 columns collapse to 720
patterns, each anchored at every cycle and spanning at most 2 adjacent
cycles (verified at build time, not assumed). Rows are (cycle t, check c)
with identical local neighborhoods for all interior t.

This lets the two per-iteration gathers that dominate BP cost on TPU
(qldpc_tpu/ops/bp.py uses one dynamic index per edge — ~35k and ~53k
gather rows of one batch-width each) be re-expressed as *static* gathers
with one index per LOCAL edge over arrays whose minor dims are
(cycle, batch): ~2.5k and ~4.3k gather rows, each T-times longer. Gather
cost on TPU is dominated by per-row overhead, so this runs several times
faster at identical algebra:

  messages   Q, R   : (n2, dr, T, B)   row-edge layout, cycle+batch minor
  posteriors V      : (nq, T, B)       pattern-grid layout
  col gather source U = [R ; shift(R, -1 cycle) ; ... ; zeros]  (o-stacked)
  row gather source W = [V ; shift(V, +1 cycle) ; ... ; zeros]

Boundary cycles are handled purely by masks (dead row edges) and dead grid
slots — the gather indices stay cycle-independent. Semantics are identical
to ops/bp.decode_batch (same flooding schedule, min1/min2, damping,
clipping, convergence freezing); column-side summation order is preserved
(row-ascending) so float32 results match the generic layout bit-for-bit.
Tie-breaking in the check update's argmin needs no ordering guarantee: when
|Q| ties at the row minimum, min1 == min2 and every edge receives the same
magnitude regardless of which slot argmin selects.

Reference parity: this is a layout of the same algorithm as the reference's
fused sparse decoder (reference src/decoding/kernels.py:234-366); see
ops/bp.py for the semantic parity notes.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from qldpc_tpu.ops.bp import _BIG


@dataclasses.dataclass(frozen=True)
class PeriodicGraph:
    """Static cycle-periodic structure of a decoding matrix.

    Build with :func:`try_from_dense`; ``None`` means the matrix is not
    (cleanly) periodic and the generic ``TannerGraph`` should be used.
    """

    row_src: jax.Array    # (n2, dr) int32 index into W's first axis
                          #   (o * nq + q; pad = S1 * nq, a zero row)
    row_mask: jax.Array   # (n2, dr, T) bool — per-cycle edge liveness
    col_src: jax.Array    # (nq, dc) int32 index into U's first axis
                          #   (o * n2 * dr + c * dr + slot; pad = dead row)
    prior_grid: jax.Array  # (nq, T) f32 — channel LLRs on the grid
                           #   (dead slots hold +50)
    out_gather: jax.Array  # (n,) int32 index into V.reshape(nq*T, B)
    residual: jax.Array    # (n,) bool — cols outside the grid (edge-free)
    n2: int               # checks per cycle
    T: int                # row cycles
    nq: int               # patterns
    dr: int               # max local row degree
    dc: int               # max pattern size
    S1: int               # number of distinct cycle offsets (span + 1)
    n: int
    m: int

    @staticmethod
    def try_from_dense(H: np.ndarray, n2: int, prior: np.ndarray,
                       max_span: int = 3):
        """Detect the periodic structure of ``H`` (rows = cycle-major
        syndrome bits, ``n2`` per cycle). Returns a PeriodicGraph, or None
        when the matrix does not decompose into cycle-shifted column
        patterns (each grid slot occupied at most once, span <= max_span,
        residual columns edge-free)."""
        H = np.asarray(H) != 0
        m, n = H.shape
        if n2 <= 0 or m % n2:
            return None
        T = m // n2
        if T < 2:
            return None
        patterns: dict = {}          # key -> q
        pat_edges: list = []         # q -> tuple of (offset, check)
        col_anchor = np.full(n, -1, np.int64)
        col_q = np.full(n, -1, np.int64)
        residual = np.zeros(n, bool)
        for j in range(n):
            rows = np.nonzero(H[:, j])[0]
            if rows.size == 0:
                residual[j] = True
                continue
            cyc = rows // n2
            a = int(cyc.min())
            off = cyc - a
            if off.max() >= max_span:
                return None
            key = (tuple(off.tolist()), tuple((rows % n2).tolist()))
            q = patterns.get(key)
            if q is None:
                q = patterns[key] = len(pat_edges)
                pat_edges.append(tuple(zip(off.tolist(),
                                           (rows % n2).tolist())))
            col_anchor[j] = a
            col_q[j] = q
        nq = len(pat_edges)
        if nq == 0 or nq * T > 4 * n:  # grid too sparse to pay off
            return None
        S1 = 1 + max(max(o for o, _ in e) for e in pat_edges)
        # grid occupancy: each (anchor, pattern) at most one column
        grid_col = np.full((T, nq), -1, np.int64)
        live = ~residual
        a_l, q_l, j_l = col_anchor[live], col_q[live], np.nonzero(live)[0]
        if np.unique(a_l * nq + q_l).size != j_l.size:
            return None
        grid_col[a_l, q_l] = j_l

        # row slot assignment: for each check c, the (offset, q) edge list
        # (cycle-independent); slots ordered (offset desc, q asc)
        row_edges = [[] for _ in range(n2)]
        for q, edges in enumerate(pat_edges):
            for o, c in edges:
                row_edges[c].append((o, q))
        for c in range(n2):
            row_edges[c].sort(key=lambda e: (-e[0], e[1]))
        dr = max(1, max(len(e) for e in row_edges))
        row_src = np.full((n2, dr), S1 * nq, np.int32)       # pad: zero row
        row_mask = np.zeros((n2, dr, T), bool)
        slot_of = {}
        t_idx = np.arange(T)
        for c in range(n2):
            for s, (o, q) in enumerate(row_edges[c]):
                row_src[c, s] = o * nq + q
                slot_of[(o, c, q)] = s
                # edge lives at cycle t iff column (t - o, q) is real
                a = t_idx - o
                ok = (a >= 0) & (a < T)
                ok[ok] = grid_col[a[ok], q] >= 0
                row_mask[c, s] = ok

        # column slots: pattern q's edges ordered by row index (offset asc,
        # check asc) so the posterior summation order matches the generic
        # layout (and the reference) bit-for-bit in f32
        dc = max(1, max(len(e) for e in pat_edges))
        col_src = np.full((nq, dc), S1 * n2 * dr, np.int32)  # pad: zero row
        for q, edges in enumerate(pat_edges):
            for s, (o, c) in enumerate(sorted(edges)):
                col_src[q, s] = o * (n2 * dr) + c * dr + slot_of[(o, c, q)]

        prior = np.asarray(prior, np.float32)
        prior_grid = np.full((nq, T), 50.0, np.float32)   # dead slots: +50
        tt, qq = np.nonzero(grid_col >= 0)
        prior_grid[qq, tt] = prior[grid_col[tt, qq]]

        out_gather = np.zeros(n, np.int32)
        out_gather[live] = (col_q[live] * T + col_anchor[live]).astype(np.int32)
        return PeriodicGraph(
            row_src=jnp.asarray(row_src),
            row_mask=jnp.asarray(row_mask),
            col_src=jnp.asarray(col_src),
            prior_grid=jnp.asarray(prior_grid),
            out_gather=jnp.asarray(out_gather),
            residual=jnp.asarray(residual),
            n2=n2, T=T, nq=nq, dr=dr, dc=dc, S1=S1, n=n, m=m)


jax.tree_util.register_pytree_node(
    PeriodicGraph,
    lambda g: ((g.row_src, g.row_mask, g.col_src, g.prior_grid,
                g.out_gather, g.residual),
               (g.n2, g.T, g.nq, g.dr, g.dc, g.S1, g.n, g.m)),
    lambda aux, ch: PeriodicGraph(*ch, *aux),
)


def _shift_stack_V(V, g: PeriodicGraph, dt):
    """W (S1*nq + 1, T, B): slab o holds V shifted so W[o*nq+q, t] =
    V[q, t-o]; final row is zeros (gather pad)."""
    nq, T, B = V.shape
    slabs = [V]
    for o in range(1, g.S1):
        slabs.append(jnp.pad(V[:, :T - o], ((0, 0), (o, 0), (0, 0))))
    slabs.append(jnp.zeros((1, T, B), dt))
    return jnp.concatenate(slabs, 0)


def _shift_stack_U(R_flat, g: PeriodicGraph, dt):
    """U (S1*n2*dr + 1, T, B): slab o holds R shifted so
    U[o*E + e, a] = R[e, a+o]; final row zeros (gather pad)."""
    E, T, B = R_flat.shape
    slabs = [R_flat]
    for o in range(1, g.S1):
        slabs.append(jnp.pad(R_flat[:, o:], ((0, 0), (0, o), (0, 0))))
    slabs.append(jnp.zeros((1, T, B), dt))
    return jnp.concatenate(slabs, 0)


def _check_update_grid(Q, sgn_syn, alpha, dt):
    """Min-sum check update; Q (n2, dr, T, B), sgn_syn (n2, T, B)."""
    absQ = jnp.abs(Q)
    neg = Q < 0.0
    row_neg = jnp.sum(neg, axis=1) & 1                        # (n2, T, B)
    sgn_prod = jnp.where(row_neg == 1, -1.0, 1.0).astype(dt) * sgn_syn
    min1 = jnp.min(absQ, axis=1, keepdims=True)
    idx1 = jnp.argmin(absQ, axis=1)                            # (n2, T, B)
    lane = jax.lax.broadcasted_iota(jnp.int32, Q.shape, 1)
    is_min1 = lane == idx1[:, None]
    min2 = jnp.min(jnp.where(is_min1, jnp.asarray(_BIG, dt), absQ),
                   axis=1, keepdims=True)
    mag = jnp.where(is_min1, min2, min1)
    sgn_q = jnp.where(neg, -1.0, 1.0).astype(dt)
    return alpha.astype(dt) * sgn_prod[:, None] * sgn_q * mag


def _variable_update_grid(R, g: PeriodicGraph, mask4, prior_grid, dt):
    """R (n2, dr, T, B) -> (values (nq, T, B) f32, vals_rows (n2, dr, T, B))."""
    n2, dr, T, B = R.shape
    R_flat = jnp.where(mask4, R, jnp.asarray(0.0, dt)).reshape(n2 * dr, T, B)
    U = _shift_stack_U(R_flat, g, dt)
    R_cols = jnp.take(U, g.col_src.reshape(-1), axis=0)
    R_cols = R_cols.reshape(g.nq, g.dc, T, B)
    values = prior_grid[:, :, None] + jnp.sum(R_cols, axis=1,
                                              dtype=jnp.float32)
    W = _shift_stack_V(values.astype(dt), g, dt)
    vals_rows = jnp.take(W, g.row_src.reshape(-1), axis=0)
    return values, vals_rows.reshape(n2, dr, T, B)


@partial(jax.jit, static_argnames=("maxIter", "damping", "msg_dtype"))
def decode_batch_grid(g: PeriodicGraph, syndrome, prior, alpha_seq,
                      maxIter: int, damping: float = 1.0,
                      clip_llr: float = 20.0, msg_dtype=jnp.float32):
    """Drop-in equivalent of ops.bp.decode_batch on a PeriodicGraph.

    Same arguments/returns (syndrome (B, m), outputs in original column
    order); float32 results are bit-identical to the generic layout.
    """
    B = syndrome.shape[0]
    dt = jnp.dtype(msg_dtype)
    # (B, m) -> (n2, T, B); row index = t * n2 + c
    syn = syndrome.reshape(B, g.T, g.n2).transpose(2, 1, 0).astype(jnp.int32)
    sgn_syn = (1.0 - 2.0 * syn).astype(dt)
    prior = prior.astype(jnp.float32)
    mask4 = g.row_mask[:, :, :, None]
    big = jnp.asarray(_BIG, dt)
    clip_lo, clip_hi = jnp.asarray(-clip_llr, dt), jnp.asarray(clip_llr, dt)

    pg = jnp.broadcast_to(g.prior_grid[:, :, None].astype(dt),
                          (g.nq, g.T, B))
    W0 = _shift_stack_V(pg, g, dt)
    Q0 = jnp.take(W0, g.row_src.reshape(-1), axis=0)
    Q0 = jnp.where(mask4, Q0.reshape(g.n2, g.dr, g.T, B), big)

    def body(state):
        it, Q, Qold, done, vals, iters = state
        R = _check_update_grid(Q, sgn_syn, alpha_seq[it], dt)
        values, vals_rows = _variable_update_grid(R, g, mask4,
                                                  g.prior_grid, dt)
        Q_new = jnp.clip(vals_rows - R, clip_lo, clip_hi)
        if damping != 1.0:
            Q_new = (jnp.asarray(damping, dt) * Q_new
                     + jnp.asarray(1.0 - damping, dt) * Qold)
            Q_new = jnp.clip(Q_new, clip_lo, clip_hi)
        Q_new = jnp.where(mask4, Q_new, big)
        hard_rows = (vals_rows < 0.0) & g.row_mask[:, :, :, None]
        parity = jnp.sum(hard_rows.astype(jnp.int32), axis=1) & 1
        ok = jnp.all(jnp.all(parity == syn, axis=0), axis=0)    # (B,)
        vals = jnp.where(done[None, None, :], vals, values)
        iters = jnp.where(ok & ~done, it, iters)
        done = done | ok
        Qold_new = Q_new if damping != 1.0 else Qold
        return it + 1, Q_new, Qold_new, done, vals, iters

    def cond(state):
        it, _, _, done, *_ = state
        return (it < maxIter) & ~jnp.all(done)

    init = (jnp.int32(0), Q0, Q0, jnp.zeros(B, bool),
            jnp.zeros((g.nq, g.T, B), jnp.float32),
            jnp.full(B, maxIter - 1, jnp.int32))
    it, Q, Qold, done, vals, iters = jax.lax.while_loop(cond, body, init)

    # grid -> original column order; residual (edge-free) cols keep prior
    flat = vals.reshape(g.nq * g.T, B)
    vals_n = jnp.take(flat, g.out_gather, axis=0)              # (n, B)
    vals_n = jnp.where(g.residual[:, None], prior[:, None], vals_n)
    cand = (vals_n < 0.0).astype(jnp.int8)
    return dict(hard=cand.T, converged=done, values=vals_n.T,
                iterations=iters)
