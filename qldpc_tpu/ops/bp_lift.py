"""Lifted (circulant-structured) layout for the min-sum BP decoder.

The circuit-level decoding graphs of BB codes are not just cycle-periodic
(scripts/bp_grid_experiment.py) — they are full *lifts* of a tiny base graph by the code's
Z_ell x Z_m translation group crossed with time: every fault-equivalence
class (column of HdecZ/HdecX) is a (translation, time-shift) copy of one of
~10 base patterns, and the checks of one cycle form a single translation
orbit (check c = x*m + y). Verified at build time, never assumed; see
``LiftedGraph.try_from_dense``.

This removes BP's gathers entirely — the irregular Tanner connectivity that
dominates iteration cost on TPU (the generic layout in ops/bp.py issues two
~35k/53k-row dynamic gathers per iteration, ~3.5x off the HBM roofline)
becomes *static rolls over dense axes*:

  messages Q     : (EB, ell, m, T, B)   EB = base-graph edge slots (~45)
  posteriors V   : (NB, ell, m, T, B)   NB = base patterns (~10)
  syndrome       : (ell, m, T, B)

An edge slot eb = (base pattern pb, offset o, rep-check (cx, cy)) connects
column (pb, gx, gy, a) to check (gx+cx, gy+cy, a+o): mapping a tensor
between column and check layouts is jnp.roll on the (ell, m) axes plus a
static slice-shift on T. The check update is a running min1/min2/sign
reduction over the EB axis of rolled slabs; the variable update is purely
local (all edges of a column live at the same (gx, gy, a)). Everything
streams; XLA fuses rolls (concats of two static slices) into consumers.

Algorithm parity: identical message schedule, min-sum semantics, damping,
double clipping, per-iteration syndrome check, alpha schedules, and
convergence freezing as ops/bp.py (reference src/decoding/dense.py:5-73,
src/decoding/kernels.py:234-366). Two deliberate deviations, both
value-preserving: (a) the magnitude select uses |Q| == min1 instead of
first-argmin — at ties min1 == min2 so every edge receives the same
magnitude either way; (b) the posterior sums each column's messages in base
slot order rather than row-ascending order, reordering f32 rounding only
(validated against the scalar float64 oracle and statistically in
scripts/validate_ler.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bp import _BIG

_DEAD_PRIOR = 50.0  # prior of dead grid slots: hard bit 0, matches the grid experiment


@dataclasses.dataclass(frozen=True)
class LiftedGraph:
    """Static lift structure of a decoding matrix (build via
    :func:`try_from_dense`; ``None`` means not (cleanly) lifted)."""

    # device arrays
    prior_grid: jax.Array  # (NB, ell, mm, T) f32; dead slots +_DEAD_PRIOR
    slot_mask: jax.Array   # (NB, ell, mm, T) bool — live column slots
    cmask: jax.Array       # (EB, ell, mm, T) bool — edge mask, check layout
    out_gather: jax.Array  # (n,) int32 into V.reshape(NB*ell*mm*T, B)
    residual: jax.Array    # (n,) bool — edge-free columns (keep prior)
    # static metadata (hashable tuples -> part of the jit cache key)
    eb_pb: tuple           # (EB,) base-pattern index per edge slot
    eb_o: tuple            # (EB,) time offset per edge slot
    eb_cx: tuple           # (EB,) rep-check x per edge slot
    eb_cy: tuple           # (EB,) rep-check y per edge slot
    NB: int
    ell: int
    mm: int
    T: int
    n: int
    m: int

    @staticmethod
    def try_from_dense(H: np.ndarray, ell: int, mm: int, prior: np.ndarray):
        """Detect the lifted structure of ``H`` (rows = cycle-major syndrome
        bits, ell*mm per cycle, check index c = x*mm + y translated by the
        code's Z_ell x Z_mm group). Returns a LiftedGraph, or None when any
        of the following fails to hold exactly: cycle periodicity, pattern
        orbits of size exactly ell*mm closed under translation, one column
        per (pattern, anchor) grid slot, residual columns edge-free."""
        H = np.asarray(H) != 0
        m, n = H.shape
        n2 = ell * mm
        if n2 <= 0 or m % n2:
            return None
        T = m // n2
        if T < 2:
            return None
        # --- cycle-pattern detection (as scripts/bp_grid_experiment.py) ---
        patterns: dict = {}
        pat_edges: list = []
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
            if off.max() >= T:
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
        if nq == 0 or nq % n2:
            return None
        # one column per (anchor, pattern)
        live = ~residual
        a_l, q_l, j_l = col_anchor[live], col_q[live], np.nonzero(live)[0]
        if np.unique(a_l * nq + q_l).size != j_l.size:
            return None
        grid_col = np.full((T, nq), -1, np.int64)
        grid_col[a_l, q_l] = j_l

        # --- translation orbits of the patterns ---
        def tr_check(c, gx, gy):
            x, y = c // mm, c % mm
            return ((x + gx) % ell) * mm + (y + gy) % mm

        def tr_pattern(q, gx, gy):
            offs, checks = (tuple(o for o, _ in pat_edges[q]),
                            tuple(c for _, c in pat_edges[q]))
            edges = sorted(zip(offs, (tr_check(c, gx, gy) for c in checks)))
            key = (tuple(o for o, _ in edges), tuple(c for _, c in edges))
            return patterns.get(key, -1)

        pat_rep = np.full(nq, -1, np.int64)    # orbit representative
        pat_g = np.full((nq, 2), -1, np.int64)  # translation rep -> pattern
        reps = []
        for q0 in range(nq):
            if pat_rep[q0] >= 0:
                continue
            for gx in range(ell):
                for gy in range(mm):
                    q = tr_pattern(q0, gx, gy)
                    if q < 0 or (pat_rep[q] >= 0 and not
                                 (q == q0 and gx == 0 and gy == 0)):
                        return None  # open orbit or non-trivial stabilizer
                    pat_rep[q] = q0
                    pat_g[q] = (gx, gy)
            reps.append(q0)
        NB = len(reps)
        if NB * n2 != nq:
            return None
        rep_of = {q0: pb for pb, q0 in enumerate(reps)}

        # --- edge slots: rep-pattern edges sorted by (offset, rep check) ---
        eb_pb, eb_o, eb_cx, eb_cy = [], [], [], []
        pb_slots = []
        for pb, q0 in enumerate(reps):
            slots = sorted(pat_edges[q0])
            pb_slots.append(len(slots))
            for o, c in slots:
                eb_pb.append(pb)
                eb_o.append(int(o))
                eb_cx.append(int(c // mm))
                eb_cy.append(int(c % mm))
        EB = len(eb_pb)

        # --- grids ---
        # column (pb, gx, gy, a) -> original column j via pattern
        # q = translate(rep_pb, gx, gy)
        q_of = np.full((NB, ell, mm), -1, np.int64)
        for q in range(nq):
            pb = rep_of[int(pat_rep[q])]
            gx, gy = pat_g[q]
            q_of[pb, gx, gy] = q
        if (q_of < 0).any():
            return None
        # col_grid[pb, gx, gy, a] = j or -1
        col_grid = grid_col[:, q_of].transpose(1, 2, 3, 0)  # (NB,ell,mm,T)
        slot_mask = col_grid >= 0

        prior = np.asarray(prior, np.float32)
        prior_grid = np.full((NB, ell, mm, T), _DEAD_PRIOR, np.float32)
        prior_grid[slot_mask] = prior[col_grid[slot_mask]]

        # check-layout edge masks: cmask[eb](x,y,t) =
        #   slot_mask[pb][x-cx, y-cy, t-o]
        cmask = np.zeros((EB, ell, mm, T), bool)
        for e in range(EB):
            r = np.roll(slot_mask[eb_pb[e]], (eb_cx[e], eb_cy[e]),
                        axis=(0, 1))
            o = eb_o[e]
            cmask[e, :, :, o:] = r[:, :, :T - o] if o else r
        # sanity: every check edge count equals the row degree of H
        deg = cmask.sum(0).transpose(2, 0, 1).reshape(m)  # (t,x,y)->row
        if not np.array_equal(deg, H.sum(1)):
            return None

        out_gather = np.zeros(n, np.int32)
        flat = col_grid.reshape(-1)
        pos = np.nonzero(flat >= 0)[0]
        out_gather[flat[pos]] = pos.astype(np.int32)

        return LiftedGraph(
            prior_grid=jnp.asarray(prior_grid),
            slot_mask=jnp.asarray(slot_mask),
            cmask=jnp.asarray(cmask),
            out_gather=jnp.asarray(out_gather),
            residual=jnp.asarray(residual),
            eb_pb=tuple(eb_pb), eb_o=tuple(eb_o),
            eb_cx=tuple(eb_cx), eb_cy=tuple(eb_cy),
            NB=NB, ell=ell, mm=mm, T=T, n=n, m=m)


jax.tree_util.register_pytree_node(
    LiftedGraph,
    lambda g: ((g.prior_grid, g.slot_mask, g.cmask, g.out_gather,
                g.residual),
               (g.eb_pb, g.eb_o, g.eb_cx, g.eb_cy, g.NB, g.ell, g.mm,
                g.T, g.n, g.m)),
    lambda aux, ch: LiftedGraph(*ch, *aux),
)


def _to_check(A, e, g: LiftedGraph, dead):
    """Column layout (ell, mm, T, B) -> check layout for edge slot e:
    out[x, y, t] = A[x-cx, y-cy, t-o] (x/y wrap, t does not)."""
    cx, cy, o = g.eb_cx[e], g.eb_cy[e], g.eb_o[e]
    if cx:
        A = jnp.roll(A, cx, axis=0)
    if cy:
        A = jnp.roll(A, cy, axis=1)
    if o:
        pad = jnp.full(A.shape[:2] + (o,) + A.shape[3:], dead, A.dtype)
        A = jnp.concatenate([pad, A[:, :, :-o]], axis=2)
    return A


def _to_col(A, e, g: LiftedGraph, dead):
    """Check layout -> column layout for edge slot e (inverse of
    :func:`_to_check`): out[gx, gy, a] = A[gx+cx, gy+cy, a+o]."""
    cx, cy, o = g.eb_cx[e], g.eb_cy[e], g.eb_o[e]
    if cx:
        A = jnp.roll(A, -cx, axis=0)
    if cy:
        A = jnp.roll(A, -cy, axis=1)
    if o:
        pad = jnp.full(A.shape[:2] + (o,) + A.shape[3:], dead, A.dtype)
        A = jnp.concatenate([A[:, :, o:], pad], axis=2)
    return A


@partial(jax.jit, static_argnames=("maxIter", "damping", "msg_dtype"))
def decode_batch_lift(g: LiftedGraph, syndrome, prior, alpha_seq,
                      maxIter: int, damping: float = 1.0,
                      clip_llr: float = 20.0, msg_dtype=jnp.float32):
    """Drop-in equivalent of ops.bp.decode_batch on a LiftedGraph.

    Same arguments/returns (syndrome (B, m) with rows t*ell*mm + x*mm + y,
    outputs in original column order).

    Iteration layout: edge messages live in CHECK layout (each edge at its
    check position), so the check update (min1/min2/sign) and the syndrome
    parity are pure reductions over the EB axis with no data movement; the
    only cross-layout traffic is two static rolls per edge per iteration
    (R to column layout for the posterior sum, V back to check layout)."""
    B = syndrome.shape[0]
    dt = jnp.dtype(msg_dtype)
    big = jnp.asarray(_BIG, dt)
    clip_lo, clip_hi = jnp.asarray(-clip_llr, dt), jnp.asarray(clip_llr, dt)
    ell, mm, T, NB, EB = g.ell, g.mm, g.T, g.NB, len(g.eb_pb)
    # slots of each base pattern are a contiguous EB range
    pb_start = [0] * (NB + 1)
    for e, pb in enumerate(g.eb_pb):
        pb_start[pb + 1] = e + 1

    # (B, m) -> (ell, mm, T, B)
    syn = syndrome.T.reshape(T, ell, mm, B).transpose(1, 2, 0, 3)
    syn = syn.astype(jnp.int32)
    sgn_syn = (1.0 - 2.0 * syn).astype(dt)
    prior = prior.astype(jnp.float32)

    cmask = g.cmask[..., None]                            # (EB,ell,mm,T,1)
    pg = g.prior_grid[..., None]                          # (NB,ell,mm,T,1)
    pg_dt = pg.astype(dt)

    Q0 = jnp.stack([_to_check(jnp.broadcast_to(
        pg_dt[g.eb_pb[e]], (ell, mm, T, B)), e, g, big)
        for e in range(EB)])
    Q0 = jnp.where(cmask, Q0, big)

    def body(state):
        it, Q, Qold, done, vals, iters = state
        alpha = alpha_seq[it].astype(dt)
        # --- check pass: pure reductions over the EB axis ---
        absQ = jnp.abs(Q)                    # dead positions hold +_BIG
        m1 = jnp.min(absQ, axis=0)                       # (ell,mm,T,B)
        is_min = absQ == m1[None]
        nmin = jnp.sum(is_min, axis=0)
        m2d = jnp.min(jnp.where(is_min, big, absQ), axis=0)
        m2 = jnp.where(nmin > 1, m1, m2d)
        neg = Q < 0.0                        # dead positions are +
        negtot = jnp.sum(neg, axis=0) & 1
        sgn = jnp.where(negtot == 1, -1.0, 1.0).astype(dt) * sgn_syn
        mag = jnp.where(is_min, m2[None], m1[None])
        sq = jnp.where(neg, -1.0, 1.0).astype(dt)
        Rchk = alpha * sgn[None] * sq * mag
        Rchk = jnp.where(cmask, Rchk, jnp.asarray(0.0, dt))

        # --- posterior sum per base pattern (column layout) ---
        Rcol = [_to_col(Rchk[e], e, g, jnp.asarray(0.0, dt))
                for e in range(EB)]
        V = jnp.stack([
            pg[pb] + sum(Rcol[e].astype(jnp.float32)
                         for e in range(pb_start[pb], pb_start[pb + 1]))
            for pb in range(NB)])                        # (NB,...,B) f32

        # --- Q update + syndrome parity (one V->check roll per edge) ---
        Qn, par = [], jnp.zeros((ell, mm, T, B), jnp.int32)
        for e in range(EB):
            vhc = _to_check(V[g.eb_pb[e]].astype(dt), e, g, big)
            par = par + jnp.where(cmask[e], (vhc < 0.0), False)
            q = jnp.clip(vhc - Rchk[e], clip_lo, clip_hi)
            if damping != 1.0:
                q = jnp.clip(jnp.asarray(damping, dt) * q
                             + jnp.asarray(1.0 - damping, dt) * Qold[e],
                             clip_lo, clip_hi)
            Qn.append(jnp.where(cmask[e], q, big))
        Q_new = jnp.stack(Qn)
        ok = jnp.all(((par & 1) == syn).reshape(-1, B), axis=0)

        vals = jnp.where(done[None, None, None, None, :], vals, V)
        iters = jnp.where(ok & ~done, it, iters)
        done = done | ok
        Qold_new = Q_new if damping != 1.0 else Qold
        return it + 1, Q_new, Qold_new, done, vals, iters

    def cond(state):
        it, _, _, done, *_ = state
        return (it < maxIter) & ~jnp.all(done)

    init = (jnp.int32(0), Q0, Q0, jnp.zeros(B, bool),
            jnp.zeros((NB, ell, mm, T, B), jnp.float32),
            jnp.full(B, maxIter - 1, jnp.int32))
    it, Q, Qold, done, vals, iters = jax.lax.while_loop(cond, body, init)

    flat = vals.reshape(NB * ell * mm * T, B)
    vals_n = jnp.take(flat, g.out_gather, axis=0)           # (n, B)
    vals_n = jnp.where(g.residual[:, None], prior[:, None], vals_n)
    cand = (vals_n < 0.0).astype(jnp.int8)
    return dict(hard=cand.T, converged=done, values=vals_n.T,
                iterations=iters)


@partial(jax.jit, static_argnames=("maxIter", "msg_dtype"))
def decode_batch_lift_layered(g: LiftedGraph, syndrome, prior, alpha_seq,
                              maxIter: int, clip_llr: float = 20.0,
                              msg_dtype=jnp.float32):
    """Time-layered (serial-schedule) min-sum on a LiftedGraph.

    Beyond-reference variant (the reference only implements the flooding
    schedule, reference src/decoding/kernels.py:278-345): each iteration is
    one SWEEP of two half-updates — first every check at an even time slice,
    then every check at an odd slice — with posteriors recomputed between
    the halves, so the odd layer sees the even layer's fresh messages.
    Serial/layered schedules are the classic ~2x-convergence-per-iteration
    BP accelerator; checks at time t reach columns anchored at t-1 and t
    (all edge time offsets are 0/1), so the even/odd split propagates
    information two time steps per sweep instead of one.

    Message semantics per half-update are identical to the flooding decoder
    (normalized min-sum, value-equality min1/min2, double clipping, dead
    slots at +_BIG); alpha_seq indexes by sweep; damping is not supported
    (the engine falls back to flooding for damped decoding). Convergence is
    checked once per sweep on the post-sweep posteriors, with the same
    per-shot freezing + whole-batch exit as decode_batch_lift.

    Returns the decode_batch_lift dict (hard, converged, values,
    iterations; ``iterations`` counts sweeps).
    """
    B = syndrome.shape[0]
    dt = jnp.dtype(msg_dtype)
    big = jnp.asarray(_BIG, dt)
    zero = jnp.asarray(0.0, dt)
    clip_lo, clip_hi = jnp.asarray(-clip_llr, dt), jnp.asarray(clip_llr, dt)
    ell, mm, T, NB, EB = g.ell, g.mm, g.T, g.NB, len(g.eb_pb)
    pb_start = [0] * (NB + 1)
    for e, pb in enumerate(g.eb_pb):
        pb_start[pb + 1] = e + 1

    syn = syndrome.T.reshape(T, ell, mm, B).transpose(1, 2, 0, 3)
    syn = syn.astype(jnp.int32)
    sgn_syn = (1.0 - 2.0 * syn).astype(dt)
    prior = prior.astype(jnp.float32)

    cmask = g.cmask[..., None]                            # (EB,ell,mm,T,1)
    pg = g.prior_grid[..., None]                          # (NB,ell,mm,T,1)
    # layer selector on the check-layout time axis
    t_even = (np.arange(T) % 2) == 0
    lmasks = [jnp.asarray(t_even)[None, None, :, None],
              jnp.asarray(~t_even)[None, None, :, None]]  # (1,1,T,1)

    V0 = jnp.broadcast_to(pg, (NB, ell, mm, T, B)).astype(jnp.float32)
    R0 = jnp.zeros((EB, ell, mm, T, B), dt)

    def half(V, R, alpha, lm):
        # Q from current posteriors (extrinsic), all slices; only the
        # layer's slices are committed into R
        Q = jnp.stack([
            jnp.where(cmask[e],
                      jnp.clip(_to_check(V[g.eb_pb[e]].astype(dt), e, g,
                                         big) - R[e], clip_lo, clip_hi),
                      big)
            for e in range(EB)])
        absQ = jnp.abs(Q)
        m1 = jnp.min(absQ, axis=0)
        is_min = absQ == m1[None]
        nmin = jnp.sum(is_min, axis=0)
        m2d = jnp.min(jnp.where(is_min, big, absQ), axis=0)
        m2 = jnp.where(nmin > 1, m1, m2d)
        neg = Q < 0.0
        negtot = jnp.sum(neg, axis=0) & 1
        sgn = jnp.where(negtot == 1, -1.0, 1.0).astype(dt) * sgn_syn
        mag = jnp.where(is_min, m2[None], m1[None])
        sq = jnp.where(neg, -1.0, 1.0).astype(dt)
        Rl = alpha * sgn[None] * sq * mag
        Rl = jnp.where(cmask, Rl, zero)
        R = jnp.where(lm[None], Rl, R)                    # commit the layer
        # posterior recompute from ALL layers' current messages
        Rcol = [_to_col(R[e], e, g, zero) for e in range(EB)]
        V = jnp.stack([
            pg[pb] + sum(Rcol[e].astype(jnp.float32)
                         for e in range(pb_start[pb], pb_start[pb + 1]))
            for pb in range(NB)])
        return V, R

    def body(state):
        it, V, R, done, vals, iters = state
        alpha = alpha_seq[it].astype(dt)
        V, R = half(V, R, alpha, lmasks[0])
        V, R = half(V, R, alpha, lmasks[1])
        # convergence on the post-sweep posteriors
        par = jnp.zeros((ell, mm, T, B), jnp.int32)
        for e in range(EB):
            vhc = _to_check(V[g.eb_pb[e]].astype(dt), e, g, big)
            par = par + jnp.where(cmask[e], (vhc < 0.0), False)
        ok = jnp.all(((par & 1) == syn).reshape(-1, B), axis=0)
        vals = jnp.where(done[None, None, None, None, :], vals, V)
        iters = jnp.where(ok & ~done, it, iters)
        done = done | ok
        return it + 1, V, R, done, vals, iters

    def cond(state):
        it, _, _, done, *_ = state
        return (it < maxIter) & ~jnp.all(done)

    init = (jnp.int32(0), V0, R0, jnp.zeros(B, bool),
            jnp.zeros((NB, ell, mm, T, B), jnp.float32),
            jnp.full(B, maxIter - 1, jnp.int32))
    it, V, R, done, vals, iters = jax.lax.while_loop(cond, body, init)
    # unconverged shots report their final posteriors (parity with the
    # flooding decoders, which freeze only on convergence)
    vals = jnp.where(done[None, None, None, None, :], vals, V)

    flat = vals.reshape(NB * ell * mm * T, B)
    vals_n = jnp.take(flat, g.out_gather, axis=0)           # (n, B)
    vals_n = jnp.where(g.residual[:, None], prior[:, None], vals_n)
    cand = (vals_n < 0.0).astype(jnp.int8)
    return dict(hard=cand.T, converged=done, values=vals_n.T,
                iterations=iters)
