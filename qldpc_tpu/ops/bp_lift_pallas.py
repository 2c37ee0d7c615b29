"""Pallas TPU kernel: VMEM-resident min-sum BP on a lifted decoding graph.

The XLA realization of the lifted layout (ops/bp_lift.py) still streams the
~36MB edge-message stack through HBM ~15 times per iteration. This kernel
keeps the ENTIRE BP state for a batch block resident in VMEM across all
iterations — edge messages (EB, ell, mm, T, Bb), posteriors, aggregates —
so per-iteration HBM traffic is zero and the iteration runs at VPU speed.
Measured on v5e: an unrolled 35-edge roll+reduce pass costs ~5us/iteration
in-kernel vs ~2ms/iteration for the XLA pipeline (scripts/bp_lift_bench.py).

The lift makes this possible: the graph's irregular connectivity is
compiled into ~35 static (roll_x, roll_y, time-shift) slab moves per pass
(zero dynamic gathers — Mosaic's dynamic_gather cannot express BP's
permutations, see CLAUDE.md). Dead grid slots travel as +_BIG messages; the
per-edge liveness masks are bit-packed over the edge axis into
ceil(EB/32) int32 slabs (every (..., 1)-shaped VMEM input is lane-padded
to 128, so unpacked per-edge f32 masks would cost a full EB-slab stack —
~49MB for [[288,12,18]], the round-3 OOM; packed they cost 2 slabs).

Two schedules:
- "flooding": every check updated from the previous iteration's messages
  (the reference schedule, src/decoding/kernels.py:278-345).
- "layered": the beyond-reference time-layered serial schedule of
  ops/bp_lift.decode_batch_lift_layered — even time slices' checks, then
  odd, with posteriors recomputed between the halves. Edge messages hold Q
  (exactly like flooding); each half's committed R is reconstructed
  bit-exactly from small saved stats (see _bp_kernel docstring), cutting
  the sweep from 7 roll passes to 4 for a modest scratch cost
  (3 stat slabs + 2*ceil(EB/32) packed-bit slabs).

Convergence freezing uses a PACKED hard-decision plane: at a shot's first
converged sweep its NB hard bits per grid slot are latched into one int32
slab (bit pb). The posterior output therefore holds the FINAL posteriors
for every shot; for converged shots the decision comes from the latched
bits (``hard``), and their ``values`` are the post-convergence evolution —
downstream code (engine OSD ordering, residual weights) only ever consumes
``values`` of unconverged shots, and ``hard`` everywhere. Unconverged
shots' values/hard and all converged/iterations flags remain bit-exact
against the XLA layouts (cross-checked in tests/test_bp_lift_pallas.py and
on hardware).

WARNING — bfloat16 ON HARDWARE IS MISCOMPILED: with msg_dtype=bfloat16 the
Mosaic-compiled kernel returns wrong posteriors (44-76% of values off, even
though every constituent op — rolls, shifts, min, selects — verifies
bit-correct on-chip in isolation, and interpret mode is bit-exact). The
engine therefore always calls this kernel with float32 messages; since the
VMEM-resident loop is compute-bound, f32 is also the faster choice
(34.5ms vs 36.5ms, [[144]] B=512 20 iters). Known Mosaic limits hit while
building this kernel (all documented in CLAUDE.md): bf16 comparisons crash
the compiler, selects with scalar bf16 operands crash, bool vectors as
data (broadcast/astype of a comparison) hit unsupported i8<->i1 casts,
zero-shift jnp.roll emits zero-width slices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bp import _BIG
from .bp_lift import LiftedGraph


def _roll_to_check(A, cx: int, cy: int, o: int, dead):
    """Column layout (ell, mm, T, Bb) -> check layout: out[x, y, t] =
    A[x-cx, y-cy, t-o]; x/y wrap, the time shift fills with ``dead``."""
    if cx:
        A = jnp.roll(A, cx, axis=0)
    if cy:
        A = jnp.roll(A, cy, axis=1)
    if o:
        pad = jnp.full(A.shape[:2] + (o,) + A.shape[3:], dead, A.dtype)
        A = jnp.concatenate([pad, A[:, :, :-o]], axis=2)
    return A


def _roll_to_col(A, cx: int, cy: int, o: int, dead):
    """Inverse of :func:`_roll_to_check`."""
    if cx:
        A = jnp.roll(A, -cx, axis=0)
    if cy:
        A = jnp.roll(A, -cy, axis=1)
    if o:
        pad = jnp.full(A.shape[:2] + (o,) + A.shape[3:], dead, A.dtype)
        A = jnp.concatenate([A[:, :, o:], pad], axis=2)
    return A


def _bp_kernel(meta, maxIter: int, clip_llr: float, dt, schedule: str,
               syn_ref, prior_ref, cmaskw_ref, alpha_ref,
               vals_ref, done_ref, iters_ref, hardpack_ref,
               msg_scr, stats_scr=None, bits_scr=None):
    """One batch block, all BP iterations in VMEM.

    meta: (eb_pb, eb_cx, eb_cy, eb_o, NB) python statics.
    syn_ref      (ell, mm, T, Bb) int32
    prior_ref    (NB, ell, mm, T, 1) f32
    cmaskw_ref   (ceil(EB/32), ell, mm, T, 1) int32 — bit e%32 of word
                 e//32 = edge e live at this check slot
    alpha_ref    (maxIter,) f32 [SMEM]
    vals_ref     (NB, ell, mm, T, Bb) f32 — the WORKING posterior buffer;
                 holds final posteriors at exit
    done/iters_ref (1, Bb) int32
    hardpack_ref (ell, mm, T, Bb) int32 — bit pb = latched hard decision of
                 grid slot (pb, x, y, t) at the shot's first convergence
    msg_scr      (EB, ell, mm, T, Bb) dt — Q in BOTH schedules
    stats_scr    (3, ell, mm, T, Bb) dt [layered only] — per-check m1, m2,
                 alpha*sgn of each slice's LAST committed half-update
    bits_scr     (2*ceil(EB/32), ell, mm, T, Bb) int32 [layered only] —
                 per-edge is-min / q-sign bits of the last commit, packed
                 over the edge axis like cmaskw

    The layered schedule keeps Q resident (exactly like flooding) and
    RECONSTRUCTS each edge's committed R on demand from the saved stats:
    R[e] = (alpha*sgn)_saved * (sign_bit ? -1 : +1) * (ismin_bit ? m2 : m1)
    — the identical f32 products the commit computed, so values are
    bit-equal to storing R itself. That turns the sweep from 7 roll passes
    (Q-build x2 per half, posterior rebuild per half, parity) into 4 (one
    stats read pass with NO rolls + one roll-to-col commit pass + one
    roll-to-check Q-update pass per half, with the parity fused into the
    second half's Q-update pass). Measured A/B + bit-identity on hardware:
    scripts/bp_layered_ab.py.
    """
    eb_pb, eb_cx, eb_cy, eb_o, NB = meta
    EB = len(eb_pb)
    ell, mm, T, Bb = syn_ref.shape
    big = jnp.asarray(_BIG, dt)
    one = jnp.asarray(1.0, dt)
    # selects/min/max with SCALAR bf16 operands crash Mosaic: hoist the
    # constants as materialized vectors (vector-operand forms compile)
    big_v = jnp.full((ell, mm, T, Bb), _BIG, dt)
    zero_v = jnp.zeros((ell, mm, T, Bb), dt)
    clip_lo_v = jnp.full((ell, mm, T, Bb), -clip_llr, dt)
    clip_hi_v = jnp.full((ell, mm, T, Bb), clip_llr, dt)

    syn = syn_ref[:]                    # int32 (Mosaic cannot trunci int8)
    sgn_syn = (one - 2.0 * syn.astype(dt))

    def mk(e):
        """Live-edge predicate of edge e at each check slot (int32 > 0)."""
        w = jnp.broadcast_to(cmaskw_ref[e // 32], (ell, mm, T, Bb))
        return ((w >> (e % 32)) & 1) > 0

    def prior_bc(pb):
        return jnp.broadcast_to(prior_ref[pb], (ell, mm, T, Bb))

    def latch(ok):
        """Per-shot convergence bookkeeping shared by both schedules:
        latch packed hard bits + iteration at first convergence."""
        hp = jnp.zeros((ell, mm, T, Bb), jnp.int32)
        for pb in range(NB):
            bit_v = jnp.full((ell, mm, T, Bb), 1 << pb, jnp.int32)
            hp = hp + jnp.where(vals_ref[pb] < 0.0, bit_v,
                                jnp.zeros((ell, mm, T, Bb), jnp.int32))
        done = done_ref[:]                                # (1, Bb)
        keep = jnp.broadcast_to(done.reshape(1, 1, 1, Bb),
                                (ell, mm, T, Bb))
        hardpack_ref[:] = jnp.where(keep > 0, hardpack_ref[:], hp)
        return done

    wcm = -(-EB // 32)
    if schedule == "flooding":
        # init: Q0 = prior of the edge's column, at the edge's check position
        for e in range(EB):
            pv = prior_bc(eb_pb[e]).astype(dt)
            qc = _roll_to_check(pv, eb_cx[e], eb_cy[e], eb_o[e], big)
            msg_scr[e] = jnp.where(mk(e), qc, big_v)
    else:
        # layered: Q resident like flooding (the first half's Q is
        # clip(V0 - R0) = clip(prior at the check position)); saved commit
        # stats zeroed — SA = 0 reconstructs R = 0 exactly
        for pb in range(NB):
            vals_ref[pb] = prior_bc(pb)
        for e in range(EB):
            pv = prior_bc(eb_pb[e]).astype(dt)
            qc = _roll_to_check(pv, eb_cx[e], eb_cy[e], eb_o[e], big)
            q0 = jnp.minimum(jnp.maximum(qc, clip_lo_v), clip_hi_v)
            msg_scr[e] = jnp.where(mk(e), q0, big_v)
        for i in range(3):
            stats_scr[i] = zero_v
        for w in range(2 * wcm):
            bits_scr[w] = jnp.zeros((ell, mm, T, Bb), jnp.int32)
    done_ref[:] = jnp.zeros((1, Bb), jnp.int32)
    iters_ref[:] = jnp.full((1, Bb), maxIter - 1, jnp.int32)
    hardpack_ref[:] = jnp.zeros((ell, mm, T, Bb), jnp.int32)

    def flood_body(carry):
        it, _ = carry
        alpha = alpha_ref[it].astype(dt)

        # --- check pass: min1/min2 + sign-parity over the EB axis ---
        m1 = jnp.full((ell, mm, T, Bb), _BIG, dt)
        m2 = m1
        negs = jnp.zeros((ell, mm, T, Bb), jnp.int32)
        for e in range(EB):
            qe = msg_scr[e]
            a = jnp.abs(qe)                     # dead slots: +_BIG
            # all comparisons in f32 (exact bf16 upcast): Mosaic crashes
            # on bf16 compares; bool results feed ONLY where-predicates
            # (bool vectors as data hit unsupported i8<->i1 casts)
            a32 = a.astype(jnp.float32)
            m2 = jnp.minimum(m2, jnp.where(a32 < m1.astype(jnp.float32),
                                           m1, a))
            m1 = jnp.minimum(m1, a)
            negs = negs + jnp.where(qe.astype(jnp.float32) < 0.0, 1, 0)
        sgn = (1 - 2 * (negs & 1)).astype(dt) * sgn_syn

        # --- R per edge (overwrites Q in place), local posterior sum ---
        # accumulate R first and add the prior at the end: same f32
        # association as the XLA lift's `prior + sum(Rcol)` (bit-exactness)
        for pb in range(NB):
            vals_ref[pb] = jnp.zeros((ell, mm, T, Bb), jnp.float32)
        for e in range(EB):
            qe = msg_scr[e]
            qe32 = qe.astype(jnp.float32)
            mag = jnp.where(jnp.abs(qe32) == m1.astype(jnp.float32), m2, m1)
            # the edge-sign multiply is an exact +-1 flip: select the
            # negated product instead of multiplying by a scalar sign
            rpos = alpha * sgn * mag
            r = jnp.where(qe32 < 0.0, -rpos, rpos)
            r = jnp.where(mk(e), r, zero_v)
            msg_scr[e] = r                      # Rchk, check layout
            rc = _roll_to_col(r, eb_cx[e], eb_cy[e], eb_o[e],
                              jnp.asarray(0.0, dt))
            vals_ref[eb_pb[e]] = vals_ref[eb_pb[e]] + rc.astype(jnp.float32)
        for pb in range(NB):
            vals_ref[pb] = prior_bc(pb) + vals_ref[pb]

        # --- Q update + syndrome parity (one V->check roll per edge) ---
        par = jnp.zeros((ell, mm, T, Bb), jnp.int32)
        for e in range(EB):
            vhc = _roll_to_check(vals_ref[eb_pb[e]].astype(dt),
                                 eb_cx[e], eb_cy[e], eb_o[e], big)
            par = par + jnp.where(mk(e)
                                  & (vhc.astype(jnp.float32) < 0.0), 1, 0)
            qn = jnp.minimum(jnp.maximum(vhc - msg_scr[e], clip_lo_v),
                             clip_hi_v)
            msg_scr[e] = jnp.where(mk(e), qn, big_v)

        eq = jnp.where((par & 1) == syn, 1, 0)
        ok = jnp.min(eq.reshape(ell * mm * T, Bb), axis=0,
                     keepdims=True)                       # (1, Bb)

        done = latch(ok)
        newly = (ok > 0) & (done == 0)
        iters_ref[:] = jnp.where(newly, it, iters_ref[:])
        done = jnp.where(ok > 0, 1, done)
        done_ref[:] = done
        return it + 1, jnp.min(done) > 0

    def layered_body(carry):
        it, _ = carry
        alpha = alpha_ref[it].astype(dt)
        # layer selector: even/odd position on the check-layout time axis
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (ell, mm, T, Bb), 2)
        zero_i = jnp.zeros((ell, mm, T, Bb), jnp.int32)

        par = jnp.zeros((ell, mm, T, Bb), jnp.int32)
        for L in (0, 1):
            lm = (t_idx & 1) == L            # predicate only, never data
            # pass 1: check stats straight from the RESIDENT Q — no rolls
            # (Q was stored by the previous pass-3 as exactly the
            # clip(V - R) the old schedule recomputed here)
            m1 = jnp.full((ell, mm, T, Bb), _BIG, dt)
            m2 = m1
            negs = jnp.zeros((ell, mm, T, Bb), jnp.int32)
            for e in range(EB):
                qe = msg_scr[e]
                a = jnp.abs(qe)
                a32 = a.astype(jnp.float32)
                m2 = jnp.minimum(m2, jnp.where(a32 < m1.astype(jnp.float32),
                                               m1, a))
                m1 = jnp.minimum(m1, a)
                negs = negs + jnp.where(qe.astype(jnp.float32) < 0.0, 1, 0)
            sgn = (1 - 2 * (negs & 1)).astype(dt) * sgn_syn
            sa_new = alpha * sgn             # (alpha*sgn)*mag association
            # pass 2: commit this layer's R (reconstructing the other
            # layer's from the saved stats) + full posterior rebuild.
            # Packed-bit words are handled LAZILY per 32-edge group (one
            # old + one new word of each kind live at a time) to keep the
            # loop's live vector state small — spill pressure is what
            # keeps the layered body off [[288]]-sized slabs.
            m1_s, m2_s, sa_s = stats_scr[0], stats_scr[1], stats_scr[2]
            for pb in range(NB):
                vals_ref[pb] = jnp.zeros((ell, mm, T, Bb), jnp.float32)
            im_old = sg_old = new_im = new_sg = None
            for e in range(EB):
                if e % 32 == 0:
                    w = e // 32
                    im_old, sg_old = bits_scr[w], bits_scr[wcm + w]
                    new_im, new_sg = zero_i, zero_i
                qe = msg_scr[e]
                q32 = qe.astype(jnp.float32)
                is_min = jnp.abs(q32) == m1.astype(jnp.float32)
                neg_q = q32 < 0.0
                mag = jnp.where(is_min, m2, m1)
                rpos = sa_new * mag
                r_new = jnp.where(neg_q, -rpos, rpos)
                r_new = jnp.where(mk(e), r_new, zero_v)
                # previously committed R, reconstructed bit-exactly:
                # same (alpha*sgn)*mag product, same sign select
                imb = ((im_old >> (e % 32)) & 1) > 0
                sgb = ((sg_old >> (e % 32)) & 1) > 0
                mag_o = jnp.where(imb, m2_s, m1_s)
                rpos_o = sa_s * mag_o
                r_old = jnp.where(sgb, -rpos_o, rpos_o)
                r_old = jnp.where(mk(e), r_old, zero_v)
                r_cur = jnp.where(lm, r_new, r_old)
                rc = _roll_to_col(r_cur, eb_cx[e], eb_cy[e], eb_o[e],
                                  jnp.asarray(0.0, dt))
                vals_ref[eb_pb[e]] = (vals_ref[eb_pb[e]]
                                      + rc.astype(jnp.float32))
                bit_v = jnp.full((ell, mm, T, Bb), 1 << (e % 32), jnp.int32)
                new_im = new_im + jnp.where(is_min, bit_v, zero_i)
                new_sg = new_sg + jnp.where(neg_q, bit_v, zero_i)
                if e == EB - 1 or (e + 1) % 32 == 0:
                    # flush this word group: keep old bits off-layer
                    w = e // 32
                    bits_scr[w] = jnp.where(lm, new_im, im_old)
                    bits_scr[wcm + w] = jnp.where(lm, new_sg, sg_old)
            for pb in range(NB):
                vals_ref[pb] = prior_bc(pb) + vals_ref[pb]
            # latch this layer's commit stats on its slices
            stats_scr[0] = jnp.where(lm, m1, m1_s)
            stats_scr[1] = jnp.where(lm, m2, m2_s)
            stats_scr[2] = jnp.where(lm, sa_new, sa_s)
            # pass 3: Q update from the fresh posteriors; the second
            # half's V rolls double as the post-sweep parity (the old
            # schedule paid a 7th standalone roll pass for it)
            m1_s, m2_s, sa_s = stats_scr[0], stats_scr[1], stats_scr[2]
            im_s = sg_s = None
            for e in range(EB):
                if e % 32 == 0:
                    im_s, sg_s = bits_scr[e // 32], bits_scr[wcm + e // 32]
                vhc = _roll_to_check(vals_ref[eb_pb[e]].astype(dt),
                                     eb_cx[e], eb_cy[e], eb_o[e], big)
                imb = ((im_s >> (e % 32)) & 1) > 0
                sgb = ((sg_s >> (e % 32)) & 1) > 0
                mag_c = jnp.where(imb, m2_s, m1_s)
                rpos_c = sa_s * mag_c
                r_cur = jnp.where(sgb, -rpos_c, rpos_c)
                r_cur = jnp.where(mk(e), r_cur, zero_v)
                qn = jnp.minimum(jnp.maximum(vhc - r_cur, clip_lo_v),
                                 clip_hi_v)
                msg_scr[e] = jnp.where(mk(e), qn, big_v)
                if L == 1:
                    par = par + jnp.where(
                        mk(e) & (vhc.astype(jnp.float32) < 0.0), 1, 0)

        eq = jnp.where((par & 1) == syn, 1, 0)
        ok = jnp.min(eq.reshape(ell * mm * T, Bb), axis=0,
                     keepdims=True)                       # (1, Bb)

        done = latch(ok)
        newly = (ok > 0) & (done == 0)
        iters_ref[:] = jnp.where(newly, it, iters_ref[:])
        done = jnp.where(ok > 0, 1, done)
        done_ref[:] = done
        return it + 1, jnp.min(done) > 0

    def cond(carry):
        it, all_done = carry
        return (it < maxIter) & ~all_done

    body = flood_body if schedule == "flooding" else layered_body
    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))


def _state_bytes(g: LiftedGraph, msg_dtype, dbuf: int,
                 schedule: str = "flooding") -> int:
    """Resident VMEM bytes for one 128-lane batch block: the EB edge
    slabs + the NB posterior output block + packed masks/prior/syndrome/
    hardpack windows; ``dbuf`` = 2 counts the revolving input/output
    windows twice (multi-step grids double-buffer them). The scratch
    slab's second-minor (T) dim is sublane-padded to a multiple of 8
    (seen in the [[288]] allocation dump: f32[35,12,12,24,128] for
    T=20); window allocations are unpadded, but budgeting everything at
    the padded size buys the right-sized safety margin. The layered
    schedule adds its saved-commit scratch: 3 stat slabs + 2*ceil(EB/32)
    packed-bit slabs."""
    dt = jnp.dtype(msg_dtype)
    T8 = -(-g.T // 8) * 8
    slab = g.ell * g.mm * T8 * 128 * max(dt.itemsize, 4)
    EB, NB = len(g.eb_pb), g.NB
    wcm = -(-EB // 32)
    # msg scratch + vals out + prior in + packed cmask in + syn in +
    # hardpack out + done/iters (negligible)
    slabs = EB + NB * dbuf + NB + wcm + dbuf + dbuf
    if schedule == "layered":
        slabs += 3 + 2 * wcm
    return slabs * slab


_BUDGET_BYTES = 110 << 20
# the layered body spills ~32.5MB of vector registers on [[288]]-sized
# slabs (measured: 132.1M of 128M, flooding fits) — budget layered
# launches against a correspondingly reduced ceiling so [[288]]-scale
# graphs keep the flooding kernel and [[144]]-scale graphs (validated on
# hardware at B=512) keep both schedules
_LAYERED_BUDGET_BYTES = 72 << 20


def viable_block_b(g: LiftedGraph, msg_dtype=jnp.float32,
                   budget_bytes: int = None, B: int = None,
                   schedule: str = "flooding"):
    """Legal VMEM batch block for this graph (and batch size), or None.

    Mosaic requires the minor (batch) block dimension to be a multiple of
    128 or the full array dimension, and pads sub-128 batches to a full
    128-lane tile, so every slab is budgeted at 128 lanes regardless of B
    (measured: a 64-shot [[288]] call allocated the full 128-padded state,
    scripts/bp288_chunked_ab.py). [[288,12,18]] fits at ~83MB single-step
    since round 4 (packed masks + merged posterior scratch); when a
    B > 128 batch's double-buffered multi-step grid would overflow but a
    single-step block fits, decode_batch_lift_pallas runs grid-1 calls
    under lax.map instead (full 128-wide blocks — NOT the sub-128
    chunking that was measured useless). Graphs whose single block
    exceeds the budget return None and take the XLA lift path."""
    if budget_bytes is None:
        budget_bytes = (_LAYERED_BUDGET_BYTES if schedule == "layered"
                        else _BUDGET_BYTES)
    if _state_bytes(g, msg_dtype, dbuf=1, schedule=schedule) > budget_bytes:
        return None
    if B is None or B % 128 == 0:
        return 128
    if B <= 128:
        return B
    return None


@functools.partial(jax.jit, static_argnames=("maxIter", "clip_llr",
                                             "msg_dtype", "block_b",
                                             "schedule", "interpret"))
def decode_batch_lift_pallas(g: LiftedGraph, syndrome, prior, alpha_seq,
                             maxIter: int, clip_llr: float = 20.0,
                             msg_dtype=jnp.float32, block_b: int = None,
                             schedule: str = "flooding",
                             interpret: bool = False):
    """VMEM-resident BP decode. Same arguments/returns as
    ops.bp_lift.decode_batch_lift (damping fixed at 1.0 — the engine falls
    back to the XLA layouts for damped decoding); schedule="layered"
    selects the serial time-layered sweep of decode_batch_lift_layered.

    Output note: ``values`` of CONVERGED shots are their final (post-
    convergence) posteriors, not the frozen-at-convergence ones — ``hard``
    carries the frozen decisions (latched in-kernel as packed bits), and
    no caller consumes converged shots' posteriors (see module docstring).

    block_b: shots per VMEM block; None uses viable_block_b (which callers
    should consult first — a graph too large for a legal block raises)."""
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule: {schedule!r}")
    B = syndrome.shape[0]
    dt = jnp.dtype(msg_dtype)
    ell, mm, T, NB, EB = g.ell, g.mm, g.T, g.NB, len(g.eb_pb)
    if block_b is None:
        block_b = viable_block_b(g, msg_dtype, B=B, schedule=schedule)
        if block_b is None:
            raise ValueError(
                "graph state exceeds the VMEM budget at the only legal "
                "batch block (128); use ops.bp_lift.decode_batch_lift")
    Bb = min(block_b, B)
    assert B % Bb == 0, (B, Bb)

    syn_grid = syndrome.T.reshape(T, ell, mm, B).transpose(1, 2, 0, 3)
    syn_grid = syn_grid.astype(jnp.int32)
    prior_in = g.prior_grid[..., None]                    # (NB,e,m,T,1) f32
    # per-edge masks bit-packed over the edge axis (int32 — Mosaic cannot
    # reduce/shift unsigned); see module docstring for why not f32 slabs
    wcm = -(-EB // 32)
    cmw = jnp.stack([
        sum(g.cmask[e].astype(jnp.int32) << (e % 32)
            for e in range(w * 32, min((w + 1) * 32, EB)))
        for w in range(wcm)])                             # (wcm,e,m,T)
    cmaskw_in = cmw[..., None]                            # (wcm,e,m,T,1)
    alpha_in = alpha_seq.astype(jnp.float32)

    meta = (g.eb_pb, g.eb_cx, g.eb_cy, g.eb_o, NB)
    kernel = functools.partial(_bp_kernel, meta, maxIter, clip_llr, dt,
                               schedule)

    def call(syn_block, nsteps: int):
        Bc = syn_block.shape[-1]
        return pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((ell, mm, T, Bb), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, ell, mm, T, 1), lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wcm, ell, mm, T, 1), lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((NB, ell, mm, T, Bb),
                             lambda i: (0, 0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ell, mm, T, Bb), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NB, ell, mm, T, Bc), jnp.float32),
                jax.ShapeDtypeStruct((1, Bc), jnp.int32),
                jax.ShapeDtypeStruct((1, Bc), jnp.int32),
                jax.ShapeDtypeStruct((ell, mm, T, Bc), jnp.int32),
            ],
            scratch_shapes=(
                [pltpu.VMEM((EB, ell, mm, T, Bb), dt)]
                + ([pltpu.VMEM((3, ell, mm, T, Bb), dt),
                    pltpu.VMEM((2 * (-(-EB // 32)), ell, mm, T, Bb),
                               jnp.int32)]
                   if schedule == "layered" else [])),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=128 << 20),
            interpret=interpret,
        )(syn_block, prior_in, cmaskw_in, alpha_in)

    nb = B // Bb
    budget = (_LAYERED_BUDGET_BYTES if schedule == "layered"
              else _BUDGET_BYTES)
    if nb > 1 and _state_bytes(g, msg_dtype, dbuf=2,
                            schedule=schedule) > budget:
        # big graph: a multi-step grid double-buffers its revolving
        # windows past the VMEM budget — run one grid-1 call per 128-wide
        # block instead (blocks are serial either way). An UNROLLED python
        # loop, not lax.map: a pallas_call inside a while/map body loses
        # its vmem_limit_bytes compiler param (the scoped limit reverts to
        # 16MB — observed on v5e) and the 59MB edge scratch aborts compile.
        parts = [call(syn_grid[..., c * Bb:(c + 1) * Bb], 1)
                 for c in range(nb)]
        vals = jnp.concatenate([p[0] for p in parts], axis=4)
        done = jnp.concatenate([p[1] for p in parts], axis=1)
        iters = jnp.concatenate([p[2] for p in parts], axis=1)
        hardpack = jnp.concatenate([p[3] for p in parts], axis=3)
    else:
        vals, done, iters, hardpack = call(syn_grid, nb)

    conv = done[0] > 0
    flat = vals.reshape(NB * ell * mm * T, B)
    vals_n = jnp.take(flat, g.out_gather, axis=0)         # (n, B)
    prior_f = prior.astype(jnp.float32)
    vals_n = jnp.where(g.residual[:, None], prior_f[:, None], vals_n)
    # frozen decisions for converged shots come from the packed latch;
    # unconverged shots decide from their final posteriors
    slot = g.out_gather.astype(jnp.int32)
    pb_of = slot // (ell * mm * T)
    rest = slot % (ell * mm * T)
    hp_flat = hardpack.reshape(ell * mm * T, B)
    hard_frozen = (jnp.take(hp_flat, rest, axis=0)
                   >> pb_of[:, None]) & 1                 # (n, B)
    hard_frozen = jnp.where(g.residual[:, None],
                            (prior_f[:, None] < 0.0).astype(jnp.int32),
                            hard_frozen)
    hard_final = (vals_n < 0.0).astype(jnp.int32)
    cand = jnp.where(conv[None, :], hard_frozen, hard_final).astype(jnp.int8)
    return dict(hard=cand.T, converged=conv, values=vals_n.T,
                iterations=iters[0])
