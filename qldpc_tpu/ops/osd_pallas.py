"""Pallas TPU kernel: batched bit-packed GF(2) Gauss-Jordan elimination.

The XLA elimination loop in osd.py re-reads the whole (B, m, W) packed
matrix from HBM on every one of the K column steps (~hundreds of GB of
traffic per batch). This kernel instead grids over shot blocks and keeps
each block's matrices resident in VMEM for the entire elimination — HBM is
touched once on the way in and once on the way out, and the K-step loop
runs at VPU speed.

Layout: checks on the lane axis (m padded to 128), packed words on the
sublane axis, shots as the leading block dim — so the hot update
``Hp ^= elim_mask * pivot_row`` is a fully lane-parallel (S, W, M) op, and
per-shot pivot selection / pivot-row extraction are lane reductions
(first-set-index via masked min of an iota; row extraction via masked sum —
per-lane dynamic gathers do not exist on the VPU).

Semantics identical to osd.py's elimination fori_loop (same swap-free
greedy pivoting); cross-checked by tests/test_osd_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


# Eliminator kernel generation. 1 (default) = the original kernel. 2 = the
# fused multi-column variant (_elim_kernel_v2): augmented-syndrome word +
# unroll-4 fused rank-1 updates. MEASURED NEGATIVE on v5e: bit-exact but
# 54.6ms vs v1's 49.0ms on the full [[144]] B=512 failed batch
# (scripts/osd_kernel_ab.py) — the per-column cost is a serial-dependency
# floor (ref read -> reduce -> ref write per column), not pass count or
# small-op count; Mosaic does not fuse elementwise where-chains, so the
# "single" fused update still materializes one VMEM pass per rank-1 term.
# Kept selectable (QLDPC_OSD_KERNEL=2) for future A/B.
_KERNEL_VERSION = int(__import__("os").environ.get("QLDPC_OSD_KERNEL", "1"))


def _word_group(W: int) -> int:
    """Left-skip tail-group width: multiple of 8, at most 5 unrolled
    sections so kernel code size stays bounded for wide (full-n) matrices."""
    per_section = -(-W // 5)
    return max(8, -(-per_section // 8) * 8)


def _elim_kernel(hp_ref, s_ref, out_hp_ref, out_s_ref, colofrow_ref,
                 *, K: int, m: int, rank: int, full_jordan: bool = False,
                 exit_on_valid: bool = True):
    """One shot-block: eliminate K columns fully in VMEM.

    hp_ref/out_hp_ref: (S, W, M) int32 word bit-patterns (Mosaic has no
    unsigned reductions, so packed words travel as int32; ``(w >> b) & 1``
    is sign-fill-safe and XOR is bitwise either way).
    s_ref/out_s_ref:   (S, 1, M) int32 residual syndrome (lane-padded; the
        singleton middle dim satisfies Mosaic's block-tiling rule for
        arbitrary S).
    colofrow_ref:      (S, 1, M) int32 — pivot column of each row (-1 = row
        unused). Recorded as a lane-masked full-row write because dynamic
        minor-dimension stores (prow_of_col[col] = piv) are not 128-aligned;
        the caller inverts the mapping to prow_of_col.

    Left-word skipping: the column loop is unrolled over static groups of
    _WORD_GROUP words; while eliminating columns of group g, the pivot-row
    extraction and the XOR update only touch words [g*_WORD_GROUP:]. Words
    to the LEFT of the current group are never read again by pivot
    selection or the syndrome reduction, so skipping them leaves the pivot
    sequence, s_red, colofrow, and all words >= the pivot's own group
    identical to full Gauss-Jordan. The only difference is that already-
    processed NON-pivot (dependent) columns are not kept fully reduced —
    exactly the part only the order-w reprocess reads, which re-reduces
    under its own runtime cond (see osd.py) before use.
    """
    S, W, M = hp_ref.shape
    # hp/s are input_output_aliased: the elimination runs in place; the
    # initial copies are no-ops Mosaic elides when in == out
    out_hp_ref[:] = hp_ref[:]
    out_s_ref[:] = s_ref[:]
    colofrow_ref[:] = jnp.full((S, 1, M), -1, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    valid_lane = lane < m

    def make_step(g0: int, Wt: int):
        """Elimination step touching only words [g0 : g0 + Wt)."""

        def step(carry):
            col, _ = carry
            w = col // 32
            bit = col % 32
            word = out_hp_ref[:, pl.ds(w, 1), :][:, 0, :]        # (S, M)
            colbits = (word >> bit) & jnp.int32(1)
            cand = (colbits == 1) & (colofrow_ref[:, 0, :] < 0) & valid_lane
            piv = jnp.min(jnp.where(cand, lane, M), axis=1,
                          keepdims=True)                         # (S, 1)
            has = piv < M
            pivmask = (lane == piv) & has                        # (S, M)
            tail = out_hp_ref[:, pl.ds(g0, Wt), :]               # static slice
            # pivot row extraction: masked lane reduction (no per-lane gather)
            prow = jnp.sum(jnp.where(pivmask[:, None, :], tail, 0),
                           axis=2, keepdims=True)                # (S, Wt, 1)
            ps = jnp.sum(jnp.where(pivmask, out_s_ref[:, 0, :], 0), axis=1,
                         keepdims=True)                          # (S, 1)
            elim = (colbits == 1) & ~pivmask & has               # (S, M)
            out_hp_ref[:, pl.ds(g0, Wt), :] = jnp.where(
                elim[:, None, :], tail ^ prow, tail)
            out_s_ref[:, 0, :] = jnp.where(elim, out_s_ref[:, 0, :] ^ ps,
                                           out_s_ref[:, 0, :])
            colofrow_ref[:, 0, :] = jnp.where(pivmask, col,
                                              colofrow_ref[:, 0, :])
            # Early exit, per shot: (a) `rank` pivots reached — no remaining
            # column can pivot or trigger row ops; (b) the residual syndrome
            # is inside the pivot span (zero on every unused row) — from
            # here on any new pivot row carries s = 0, so s_red is frozen
            # and every later pivot's correction bit is 0. Both leave every
            # consumed output (s_red, OSD-0 solution, validity) identical to
            # the full scan. (b) matters enormously on BB decoding graphs:
            # the reliability-ordered prefix is so redundant that full rank
            # sits beyond column 2000, but ~98% of failed-BP shots are
            # syndrome-covered within the first 512 columns (measured by
            # scripts/osd_margin_probe.py).
            npiv = jnp.sum((colofrow_ref[:, 0, :] >= 0).astype(jnp.int32),
                           axis=1)
            shot_done = npiv >= rank
            if exit_on_valid:
                unsat = jnp.max(jnp.where((colofrow_ref[:, 0, :] < 0)
                                          & valid_lane,
                                          out_s_ref[:, 0, :], 0), axis=1)
                shot_done = shot_done | (unsat == 0)
            return col + 1, jnp.all(shot_done)

        return step

    if exit_on_valid:
        # all-zero residuals (e.g. converged shots landing in a mixed OSD
        # chunk) are valid before any elimination: skip the loop outright
        done = jnp.all(jnp.max(jnp.where(valid_lane, out_s_ref[:, 0, :], 0),
                               axis=1) == 0)
    else:
        done = jnp.bool_(False)
    group = W if full_jordan else _word_group(W)
    for g in range(0, W, group):
        Wt = W - g
        c_end = min((g + group) * 32, K)
        _, done = jax.lax.while_loop(
            lambda c, e=c_end: (c[0] < e) & ~c[1], make_step(g, Wt),
            (jnp.int32(g * 32), done))
        if g * 32 >= K:
            break


def _elim_kernel_v2(hp_ref, out_hp_ref, colofrow_ref, *, K: int, m: int,
                    rank: int, W_s: int, unroll: int = 4,
                    full_jordan: bool = False, exit_on_valid: bool = True):
    """Fused multi-column variant of _elim_kernel. The elimination at
    production block sizes is VMEM-traffic-bound on the (S, Wt, M) tail
    passes (v1 pays ~3 per column: pivot-row read, XOR read, write), so:

    1. AUGMENTED SYNDROME: the residual syndrome rides in bit 0 of packed
       word ``W_s`` (always inside every group's tail slice): the pivot's
       syndrome bit arrives with the pivot-row extraction and the syndrome
       XOR fuses into the tail update.
    2. FUSED ``unroll``-COLUMN UPDATE: all ``unroll`` pivots are selected
       against the PRE-update state T0 with word-level corrections, then
       their rank-1 updates land in ONE tail read-modify-write:
           T_k = T0 ^ XOR_i R_i (x) prow_i
           prow_i = T0[r_i] ^ XOR_{l<i} R_l[r_i] * prow_l
           bits_i = bits_i(T0) ^ XOR_{l<i} R_l * prow_l[c_i]
       (plain GF(2) algebra — bit-identical to the sequential updates;
       cross-checked by tests/test_osd_pallas.py and on hardware by
       scripts/osd_kernel_ab.py). Tail passes per ``unroll`` columns:
       ``unroll`` masked-reduction reads + 1 elementwise read-modify-write
       (a fused where-chain) instead of 3 * unroll.
    3. Exit checks once per fused group; a block may overrun its exit point
       by up to unroll-1 columns — every consumed output is unchanged
       (post-validity pivots carry a zero syndrome bit; see v1 docstring).
       colofrow lives in the loop carry, written back once at the end.
    """
    S, W_aug, M = hp_ref.shape
    out_hp_ref[:] = hp_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    valid_lane = lane < m

    def unsat_of(colofrow):
        sword = out_hp_ref[:, pl.ds(W_s, 1), :][:, 0, :]     # static slice
        return jnp.max(jnp.where((colofrow < 0) & valid_lane,
                                 sword & jnp.int32(1), 0), axis=1)

    def make_body(g0: int, Wt: int):
        def body(carry):
            col, _, colofrow = carry
            tail0 = out_hp_ref[:, pl.ds(g0, Wt), :]          # T0 (pre-update)
            Rs, prows, pivmasks = [], [], []
            cb0s = []        # T0 bits of each sub-column, (S, M)
            pbits = {}       # (l, i) -> prow_l's bit at column c_i, (S, 1)
            rjl = {}         # (j, l) -> R_j[r_l], (S, 1)
            for i in range(unroll):
                c = col + i
                w = c // 32
                bit = c % 32
                word = out_hp_ref[:, pl.ds(w, 1), :][:, 0, :]    # T0 word
                cb0 = (word >> bit) & jnp.int32(1)               # (S, M)
                cb0s.append(cb0)
                b = cb0
                # correct column bits for the l < i pending updates; each
                # needed prow bit is a lane reduction of the ALREADY-READ
                # T0 word, recursively corrected (Mosaic has no value
                # dynamic_slice to read it from prow directly):
                #   pbit(l,i) = reduce(pivmask_l * cb0_i)
                #             ^ XOR_{j<l} rjl(j,l) * pbit(j,i)
                for l in range(i):
                    t = jnp.sum(jnp.where(pivmasks[l], cb0, 0), axis=1,
                                keepdims=True)                   # (S, 1)
                    for j in range(l):
                        t = t ^ (rjl[(j, l)] * pbits[(j, i)])
                    pbits[(l, i)] = t
                    b = b ^ (Rs[l] * t)                          # (S, M)
                cand = (b == 1) & (colofrow < 0) & valid_lane
                if K % unroll:  # guard tail columns past K (never pivot on
                    cand = cand & (c < K)  # the syndrome/padding words)
                piv = jnp.min(jnp.where(cand, lane, M), axis=1,
                              keepdims=True)                     # (S, 1)
                has = piv < M
                pivmask = (lane == piv) & has                    # (S, M)
                # pivot row from T0, corrected by pending updates at r_i
                prow = jnp.sum(jnp.where(pivmask[:, None, :], tail0, 0),
                               axis=2, keepdims=True)            # (S, Wt, 1)
                for l in range(i):
                    rl = jnp.sum(jnp.where(pivmask, Rs[l], 0), axis=1,
                                 keepdims=True)                  # (S, 1)
                    rjl[(l, i)] = rl
                    prow = prow ^ (rl[:, :, None] * prows[l])
                Rs.append(((b == 1) & ~pivmask & has).astype(jnp.int32))
                prows.append(prow)
                pivmasks.append(pivmask)
                colofrow = jnp.where(pivmask, c, colofrow)
            acc = tail0
            for i in range(unroll):
                acc = jnp.where(Rs[i][:, None, :] == 1, acc ^ prows[i], acc)
            out_hp_ref[:, pl.ds(g0, Wt), :] = acc
            npiv = jnp.sum((colofrow >= 0).astype(jnp.int32), axis=1)
            shot_done = npiv >= rank
            if exit_on_valid:
                shot_done = shot_done | (unsat_of(colofrow) == 0)
            return col + unroll, jnp.all(shot_done), colofrow

        return body

    colofrow = jnp.full((S, M), -1, jnp.int32)
    done = (jnp.all(unsat_of(colofrow) == 0) if exit_on_valid
            else jnp.bool_(False))
    col = jnp.int32(0)
    group = W_s if full_jordan else _word_group(W_s)
    for g in range(0, W_s, group):
        # tail always includes the syndrome word (W_aug - g0 words)
        Wt = W_aug - g
        c_end = min((g + group) * 32, K)
        col, done, colofrow = jax.lax.while_loop(
            lambda cr, e=c_end: (cr[0] < e) & ~cr[1], make_body(g, Wt),
            (col, done, colofrow))
        if (g + group) * 32 >= K:
            break
    colofrow_ref[:, 0, :] = colofrow


def _elim_kernel_v3(hp_ref, s_ref, out_hp_ref, out_s_ref, colofrow_ref,
                    *, K: int, m: int, rank: int, S: int,
                    full_jordan: bool = False, exit_on_valid: bool = True):
    """Dual-block interleave: TWO independent S-shot blocks advance through
    the v1 column scan inside ONE while_loop body. Hypothesis under test:
    the per-column cost is a serial-dependency stall floor (each op waits
    on the previous ref read/reduce/write), so interleaving two independent
    chains overlaps the stalls and two blocks finish in ~one block's wall
    time. The batch arrives sorted by difficulty, so the two contiguous
    halves of a 2S slice have similar exit depths and the max-depth loop
    bound wastes little. Semantics per half are exactly v1's (a finished or
    past-c_end half runs data-level no-ops: cand is masked by its active
    flag, so no pivot, no XOR)."""
    S2, W, M = hp_ref.shape
    assert S2 == 2 * S
    out_hp_ref[:] = hp_ref[:]
    out_s_ref[:] = s_ref[:]
    colofrow_ref[:] = jnp.full((S2, 1, M), -1, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    valid_lane = lane < m

    def half_done(h0):
        cf = colofrow_ref[h0:h0 + S, 0, :]
        npiv = jnp.sum((cf >= 0).astype(jnp.int32), axis=1)
        done = npiv >= rank
        if exit_on_valid:
            unsat = jnp.max(jnp.where((cf < 0) & valid_lane,
                                      out_s_ref[h0:h0 + S, 0, :], 0),
                            axis=1)
            done = done | (unsat == 0)
        return jnp.all(done)

    def make_step(g0: int, Wt: int, c_end: int):
        def sub(h0, col, active):
            w = col // 32
            bit = col % 32
            word = out_hp_ref[h0:h0 + S, pl.ds(w, 1), :][:, 0, :]
            colbits = (word >> bit) & jnp.int32(1)
            cf = colofrow_ref[h0:h0 + S, 0, :]
            cand = (colbits == 1) & (cf < 0) & valid_lane & active
            piv = jnp.min(jnp.where(cand, lane, M), axis=1, keepdims=True)
            has = piv < M
            pivmask = (lane == piv) & has
            tail = out_hp_ref[h0:h0 + S, pl.ds(g0, Wt), :]
            prow = jnp.sum(jnp.where(pivmask[:, None, :], tail, 0),
                           axis=2, keepdims=True)
            sh = out_s_ref[h0:h0 + S, 0, :]
            ps = jnp.sum(jnp.where(pivmask, sh, 0), axis=1, keepdims=True)
            elim = (colbits == 1) & ~pivmask & has
            out_hp_ref[h0:h0 + S, pl.ds(g0, Wt), :] = jnp.where(
                elim[:, None, :], tail ^ prow, tail)
            out_s_ref[h0:h0 + S, 0, :] = jnp.where(elim, sh ^ ps, sh)
            colofrow_ref[h0:h0 + S, 0, :] = jnp.where(pivmask, col, cf)

        def step(carry):
            colA, colB, dA, dB = carry
            actA = ~dA & (colA < c_end)
            actB = ~dB & (colB < c_end)
            sub(0, colA, actA)
            sub(S, colB, actB)
            dA = dA | half_done(0)
            dB = dB | half_done(S)
            return (jnp.minimum(colA + 1, c_end),
                    jnp.minimum(colB + 1, c_end), dA, dB)

        return step

    if exit_on_valid:
        dA = jnp.all(jnp.max(jnp.where(valid_lane,
                                       out_s_ref[0:S, 0, :], 0),
                             axis=1) == 0)
        dB = jnp.all(jnp.max(jnp.where(valid_lane,
                                       out_s_ref[S:2 * S, 0, :], 0),
                             axis=1) == 0)
    else:
        dA = dB = jnp.bool_(False)
    group = W if full_jordan else _word_group(W)
    for g in range(0, W, group):
        Wt = W - g
        c_end = min((g + group) * 32, K)
        colA, colB, dA, dB = jax.lax.while_loop(
            lambda c, e=c_end: ((c[0] < e) & ~c[2]) | ((c[1] < e) & ~c[3]),
            make_step(g, Wt, c_end),
            (jnp.int32(g * 32), jnp.int32(g * 32), dA, dB))
        if g * 32 >= K:
            break


@functools.partial(jax.jit, static_argnames=("K", "m", "block_shots",
                                             "interpret", "rank",
                                             "full_jordan", "exit_on_valid"))
def eliminate_blocks(Hp, s, K: int, m: int, block_shots: int = 32,
                     interpret: bool = False, rank: int = None,
                     full_jordan: bool = False, exit_on_valid: bool = True):
    """Batched elimination. Hp (B, W, M) uint32 (M = lane-padded checks;
    W padded to a multiple of 8 internally), s (B, M) int32. Returns
    (Hp_reduced (B, W, M), s_reduced, prow_of_col (B, K), used (B, M),
    colofrow (B, M) — each row's pivot column slot, -1 if unused; callers
    use it to scatter row-space results into column slots, which is far
    cheaper on TPU than gathering along lanes with prow_of_col).

    With full_jordan=False (default), already-passed words are skipped in
    the row updates: s_reduced/prow_of_col/used and all pivot columns are
    identical to full Gauss-Jordan, but dependent (non-pivot) columns left
    of a pivot's word group are stale. Pass full_jordan=True when the
    fully-reduced matrix itself is needed (OSD order-w reprocessing).

    With exit_on_valid=True (default), a shot-block stops scanning once
    every shot's residual syndrome lies in its pivot span (see the kernel
    docstring): s_reduced, the OSD-0 solution (pivot correction bits), and
    per-shot validity are bit-identical to the full scan, but prow_of_col /
    used omit post-validity pivots (whose correction bits are all zero) and
    the reduced matrix beyond the exit column is untouched. Pass
    exit_on_valid=False for bit-exact full-scan outputs (oracle tests)."""
    B, W, M = Hp.shape
    W8 = _round_up(max(W, 8), 8)  # Mosaic: second-minor block dim % 8 == 0
    S = min(block_shots, B)
    assert B % S == 0, (B, S)
    grid = (B // S,)
    rank = m if rank is None else rank
    if _KERNEL_VERSION == 2:
        # augmented layout: syndrome in bit 0 of word W8, zero-padded to a
        # sublane tile. Every group tail slice reaches W_aug, so the
        # syndrome update rides the tail XOR for free.
        W_aug = W8 + 8
        Hp = jnp.pad(jax.lax.bitcast_convert_type(Hp, jnp.int32),
                     ((0, 0), (0, W_aug - W), (0, 0)))
        Hp = Hp.at[:, W8, :].set(s.astype(jnp.int32))
        kernel = functools.partial(_elim_kernel_v2, K=K, m=m, rank=rank,
                                   W_s=W8, full_jordan=full_jordan,
                                   exit_on_valid=exit_on_valid)
        out_hp, colofrow = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((S, W_aug, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((S, W_aug, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, W_aug, M), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
            ],
            input_output_aliases={0: 0},  # eliminate in place
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
            interpret=interpret,
        )(Hp)
        out_s = out_hp[:, W8, :] & 1
        out_hp = jax.lax.bitcast_convert_type(out_hp[:, :W, :], jnp.uint32)
        colofrow = colofrow[:, 0, :]
    else:
        if W8 != W:
            Hp = jnp.pad(Hp, ((0, 0), (0, W8 - W), (0, 0)))
        Hp = jax.lax.bitcast_convert_type(Hp, jnp.int32)
        s = s[:, None, :]
        if _KERNEL_VERSION == 3 and B % (2 * S) == 0:
            # dual-block interleave: one grid step advances TWO independent
            # S-shot blocks (see _elim_kernel_v3)
            S2 = 2 * S
            grid = (B // S2,)
            kernel = functools.partial(_elim_kernel_v3, K=K, m=m, rank=rank,
                                       S=S, full_jordan=full_jordan,
                                       exit_on_valid=exit_on_valid)
            S = S2
        else:
            kernel = functools.partial(_elim_kernel, K=K, m=m, rank=rank,
                                       full_jordan=full_jordan,
                                       exit_on_valid=exit_on_valid)
        out_hp, out_s, colofrow = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((S, W8, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((S, W8, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, W8, M), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
            ],
            input_output_aliases={0: 0, 1: 1},  # eliminate in place
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
            interpret=interpret,
        )(Hp, s)
        out_hp = jax.lax.bitcast_convert_type(out_hp[:, :W, :], jnp.uint32)
        out_s = out_s[:, 0, :]
        colofrow = colofrow[:, 0, :]
    # invert row->column into prow_of_col (cheap XLA scatter)
    used = colofrow >= 0                                         # (B, M)
    lane = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    target = jnp.where(used, colofrow, K)                        # dump slot K
    prow_of_col = jnp.full((B, K + 1), -1, jnp.int32).at[
        jnp.arange(B)[:, None], target].set(lane)[:, :K]
    return out_hp, out_s, prow_of_col, used, colofrow


def pick_block_shots(m_pad: int, W: int, vmem_budget: int = 26 << 20,
                     cap: int = 32) -> int:
    """Largest power-of-two shot block (<= cap) whose matrices fit the VMEM
    budget (the kernel requests a raised vmem_limit_bytes). Accounts for the
    Mosaic 8-sublane padding of W and the grid pipeline's double buffering
    of the (aliased) matrix block.

    Default cap 32, not 64: elimination time = sum over blocks of (block
    exit depth x per-step latency), and the per-step cost is latency-bound,
    nearly independent of both S and W (S=64/W=40 vs S=64/W=8 measured
    1.14x, scripts/osd_panel_probe.py). Smaller blocks therefore cost
    little per step but exit at their own sorted-difficulty depth instead
    of a larger block's max: S=32 measured ~25%% faster than S=64 net of
    the dispatch floor on [[144]] B=512 real failed shots; S=16/8 are flat
    vs 32 (scripts/osd_blockshots_sweep.py). Callers whose blocks are
    uniformly DEEP (the staged tail on [[288]]-scale graphs) pass a larger
    budget: the same step-latency argument means a wide block serves 4x
    the shots at ~the same per-column cost."""
    W8 = _round_up(max(W, 8), 8) + (8 if _KERNEL_VERSION == 2 else 0)
    per_shot = m_pad * W8 * 4 * 2 + m_pad * 4 * 6  # 2x-buffered Hp + small
    if _KERNEL_VERSION == 3:
        per_shot *= 2  # dual-block interleave doubles the resident block
    s = max(1, vmem_budget // max(per_shot, 1))
    return 1 << min(max(0, int(np.log2(cap))), max(0, int(np.log2(s))))
