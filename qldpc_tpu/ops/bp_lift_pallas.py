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
permutations, see CLAUDE.md). Dead grid slots travel as +_BIG messages and
multiplicative masks, so the kernel body is pure arithmetic.

Semantics: identical to ops/bp_lift.decode_batch_lift with damping == 1
(same schedule, min1/min2 via value-equality, per-shot convergence freeze,
per-block early exit — each batch block exits its while loop independently,
which can only *tighten* the generic whole-batch exit). Cross-checked
bitwise against the XLA lift in tests/test_bp_lift_pallas.py (interpret
mode) and on hardware (float32 bit-exact at every tested batch/grid/depth).
Reference algorithm parity notes: ops/bp.py, ops/bp_lift.py docstrings.

WARNING — bfloat16 ON HARDWARE IS MISCOMPILED: with msg_dtype=bfloat16 the
Mosaic-compiled kernel returns wrong posteriors (44-76% of values off, even
though every constituent op — rolls, shifts, min, selects — verifies
bit-correct on-chip in isolation, and interpret mode is bit-exact). The
engine therefore always calls this kernel with float32 messages; since the
VMEM-resident loop is compute-bound, f32 is also the faster choice
(34.5ms vs 36.5ms, [[144]] B=512 20 iters). Known Mosaic limits hit while
building this kernel (all documented in CLAUDE.md): bf16 comparisons crash
the compiler, selects with scalar bf16 operands crash, bool vectors as
data (broadcast/astype) hit unsupported i8<->i1 casts, zero-shift
jnp.roll emits zero-width slices.
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


def _bp_kernel(meta, maxIter: int, clip_llr: float, dt,
               syn_ref, prior_ref, cmask_ref, alpha_ref,
               vals_ref, done_ref, iters_ref,
               q_scr, v_scr):
    """One batch block, all BP iterations in VMEM.

    meta: (eb_pb, eb_cx, eb_cy, eb_o, NB) python statics.
    syn_ref   (ell, mm, T, Bb) int32     prior_ref (NB, ell, mm, T, 1) f32
    cmask_ref (EB, ell, mm, T, 1) f32    alpha_ref (maxIter,) f32 [SMEM]
    vals_ref  (NB, ell, mm, T, Bb) f32   done/iters_ref (1, Bb) int32
    q_scr     (EB, ell, mm, T, Bb) dt    v_scr (NB, ell, mm, T, Bb) f32
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

    # init: Q0 = prior of the edge's column, at the edge's check position
    for e in range(EB):
        pv = jnp.broadcast_to(prior_ref[eb_pb[e]].astype(dt),
                              (ell, mm, T, Bb))
        qc = _roll_to_check(pv, eb_cx[e], eb_cy[e], eb_o[e], big)
        mk = jnp.broadcast_to(cmask_ref[e], (ell, mm, T, Bb))
        q_scr[e] = jnp.where(mk > 0.5, qc, big_v)
    done_ref[:] = jnp.zeros((1, Bb), jnp.int32)
    iters_ref[:] = jnp.full((1, Bb), maxIter - 1, jnp.int32)
    vals_ref[:] = jnp.zeros(vals_ref.shape, jnp.float32)

    def body(carry):
        it, _ = carry
        alpha = alpha_ref[it].astype(dt)

        # --- check pass: min1/min2 + sign-parity over the EB axis ---
        m1 = jnp.full((ell, mm, T, Bb), _BIG, dt)
        m2 = m1
        negs = jnp.zeros((ell, mm, T, Bb), jnp.int32)
        for e in range(EB):
            qe = q_scr[e]
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
            v_scr[pb] = jnp.zeros((ell, mm, T, Bb), jnp.float32)
        for e in range(EB):
            qe = q_scr[e]
            qe32 = qe.astype(jnp.float32)
            mag = jnp.where(jnp.abs(qe32) == m1.astype(jnp.float32), m2, m1)
            mk = jnp.broadcast_to(cmask_ref[e], (ell, mm, T, Bb))
            # the edge-sign multiply is an exact +-1 flip: select the
            # negated product instead of multiplying by a scalar sign
            rpos = alpha * sgn * mag
            r = jnp.where(qe32 < 0.0, -rpos, rpos)
            r = jnp.where(mk > 0.5, r, zero_v)
            q_scr[e] = r                        # Rchk, check layout
            rc = _roll_to_col(r, eb_cx[e], eb_cy[e], eb_o[e],
                              jnp.asarray(0.0, dt))
            v_scr[eb_pb[e]] = v_scr[eb_pb[e]] + rc.astype(jnp.float32)
        for pb in range(NB):
            v_scr[pb] = jnp.broadcast_to(prior_ref[pb],
                                         (ell, mm, T, Bb)) + v_scr[pb]

        # --- Q update + syndrome parity (one V->check roll per edge) ---
        par = jnp.zeros((ell, mm, T, Bb), jnp.int32)
        for e in range(EB):
            vhc = _roll_to_check(v_scr[eb_pb[e]].astype(dt),
                                 eb_cx[e], eb_cy[e], eb_o[e], big)
            mk = jnp.broadcast_to(cmask_ref[e], (ell, mm, T, Bb))
            par = par + jnp.where((mk > 0.5)
                                  & (vhc.astype(jnp.float32) < 0.0), 1, 0)
            qn = jnp.minimum(jnp.maximum(vhc - q_scr[e], clip_lo_v),
                             clip_hi_v)
            q_scr[e] = jnp.where(mk > 0.5, qn, big_v)

        eq = jnp.where((par & 1) == syn, 1, 0)
        ok = jnp.min(eq.reshape(ell * mm * T, Bb), axis=0,
                     keepdims=True)                       # (1, Bb)

        # freeze posteriors at each shot's first convergence
        done = done_ref[:]                                # (1, Bb)
        # broadcast the int32 flags, compare at use: Mosaic cannot
        # materialize broadcast bool vectors (i8->i1 trunci is unsupported)
        keep = jnp.broadcast_to(done.reshape(1, 1, 1, Bb),
                                (ell, mm, T, Bb))
        for pb in range(NB):
            vals_ref[pb] = jnp.where(keep > 0, vals_ref[pb], v_scr[pb])
        newly = (ok > 0) & (done == 0)
        iters_ref[:] = jnp.where(newly, it, iters_ref[:])
        done = jnp.where(ok > 0, 1, done)
        done_ref[:] = done
        return it + 1, jnp.min(done) > 0

    def cond(carry):
        it, all_done = carry
        return (it < maxIter) & ~all_done

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))


def viable_block_b(g: LiftedGraph, msg_dtype=jnp.bfloat16,
                   budget_bytes: int = 48 << 20, B: int = None):
    """Legal VMEM batch block for this graph (and batch size), or None.

    Mosaic requires the minor (batch) block dimension to be a multiple of
    128 or the full array dimension. So: block 128 whenever the resident
    state (edge stack + posterior accumulators + frozen output block) fits
    the budget at 128 shots and the batch divides by it; otherwise a
    full-batch block (shape-legal) for batches <= 128 — but budgeted at
    the PADDED width of 128 lanes, because sub-128 batches allocate the
    full 128-lane tile anyway (measured: a 64-shot [[288]] call OOMs at
    179MB vs the chip's 128MB VMEM, scripts/bp288_chunked_ab.py).
    Otherwise None and the caller must take the XLA lift path — which is
    [[288]] at EVERY batch. The engine consults this before selecting the
    kernel."""
    dt = jnp.dtype(msg_dtype)
    slab = g.ell * g.mm * g.T * max(dt.itemsize, 4)
    per_shot = (len(g.eb_pb) + 2 * g.NB) * slab
    if per_shot * 128 <= budget_bytes and (B is None or B % 128 == 0):
        return 128
    # Sub-128 full-batch blocks pay for 128 shots anyway: the batch rides
    # the minor (lane) axis, which Mosaic pads to a full 128-lane tile —
    # measured on v5e: a 64-shot [[288]] whole-batch call allocates 179MB
    # (the 128-padded state + double-buffered windows), exceeding the
    # chip's 128MB VMEM (scripts/bp288_chunked_ab.py). So the small-batch
    # branch must budget at the PADDED width.
    if B is not None and B <= 128 and per_shot * 128 <= budget_bytes:
        return B
    return None


@functools.partial(jax.jit, static_argnames=("maxIter", "clip_llr",
                                             "msg_dtype", "block_b",
                                             "interpret"))
def decode_batch_lift_pallas(g: LiftedGraph, syndrome, prior, alpha_seq,
                             maxIter: int, clip_llr: float = 20.0,
                             msg_dtype=jnp.bfloat16, block_b: int = None,
                             interpret: bool = False):
    """VMEM-resident BP decode. Same arguments/returns as
    ops.bp_lift.decode_batch_lift (damping fixed at 1.0 — the engine falls
    back to the XLA layouts for damped decoding).

    block_b: shots per VMEM block; None uses viable_block_b (which callers
    should consult first — a graph too large for a legal block raises)."""
    B = syndrome.shape[0]
    dt = jnp.dtype(msg_dtype)
    ell, mm, T, NB, EB = g.ell, g.mm, g.T, g.NB, len(g.eb_pb)
    if block_b is None:
        block_b = viable_block_b(g, msg_dtype, B=B)
        if block_b is None:
            raise ValueError(
                "graph state exceeds the VMEM budget at the only legal "
                "batch block (128); use ops.bp_lift.decode_batch_lift")
    Bb = min(block_b, B)
    assert B % Bb == 0, (B, Bb)

    syn_grid = syndrome.T.reshape(T, ell, mm, B).transpose(1, 2, 0, 3)
    syn_grid = syn_grid.astype(jnp.int32)
    prior_in = g.prior_grid[..., None]                    # (NB,e,m,T,1) f32
    cmask_in = g.cmask[..., None].astype(jnp.float32)     # (EB,e,m,T,1)
    # masks stay f32: they are only ever compared (mk > 0.5), and Mosaic
    # crashes on bf16 comparisons
    alpha_in = alpha_seq.astype(jnp.float32)

    meta = (g.eb_pb, g.eb_cx, g.eb_cy, g.eb_o, NB)
    kernel = functools.partial(_bp_kernel, meta, maxIter, clip_llr, dt)
    grid = (B // Bb,)
    vals, done, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ell, mm, T, Bb), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, ell, mm, T, 1), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, ell, mm, T, 1), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((NB, ell, mm, T, Bb), lambda i: (0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, ell, mm, T, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((EB, ell, mm, T, Bb), dt),
            pltpu.VMEM((NB, ell, mm, T, Bb), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 << 20),
        interpret=interpret,
    )(syn_grid, prior_in, cmask_in, alpha_in)

    flat = vals.reshape(NB * ell * mm * T, B)
    vals_n = jnp.take(flat, g.out_gather, axis=0)         # (n, B)
    prior_f = prior.astype(jnp.float32)
    vals_n = jnp.where(g.residual[:, None], prior_f[:, None], vals_n)
    cand = (vals_n < 0.0).astype(jnp.int8)
    return dict(hard=cand.T, converged=done[0] > 0, values=vals_n.T,
                iterations=iters[0])
