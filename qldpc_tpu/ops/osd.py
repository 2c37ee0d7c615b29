"""Batched ordered-statistics decoding (OSD) with bit-packed GF(2) elimination.

TPU-first design: per-shot reliability-ordered Gauss-Jordan elimination runs
as one jitted routine over a whole batch of failed-BP shots. Columns are
sorted by |posterior LLR| per shot, the K least-reliable columns are
gathered and bit-packed 32-per-uint32 word along the column axis, and a
fori_loop performs swap-free pivoting with word-wise XOR row elimination —
every step fully vectorized over (batch, rows, words) on the VPU.

Truncation: the reference eliminates over all n columns
(reference src/decoding/osd.py:13-17 + kernels.py:48-106); here elimination
runs over the first K = rank + margin columns in reliability order PLUS a
fixed rank-completing column basis appended after them (``basis_cols``), so
full rank is always reached without scanning all n columns. The greedy
pivot set is identical to the reference's whenever the K-prefix already
reaches full rank (the ~99.5% case); for the rare truncation-deficient shot
the completing pivots come from the appended basis instead of the
reference's deeper reliability scan — a different but equally syndrome-valid
near-ML solution. The appended columns cost nothing on the common path: the
per-block early exit stops at full rank before ever reaching them.

Order-w reprocessing follows reference osd.py:31-77: OSD-0 returns
immediately when its syndrome matches (physical syndromes are always in the
column space, so this is the common case); otherwise up to ``order``-sized
flips of the ``order + 10`` least-reliable non-pivot columns are scored by
the penalized |LLR| metric (reference kernels.py:195-204) and the first
minimum wins, reproducing the reference's strict-< update rule.
"""
from __future__ import annotations

from functools import partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np


def _combo_masks(num_test: int, order: int) -> np.ndarray:
    """(Ncombo, num_test) 0/1 masks for all flip sets of size 1..order, in
    the reference's enumeration order (weight-1 combos first)."""
    rows = []
    for w in range(1, order + 1):
        for combo in combinations(range(num_test), w):
            row = np.zeros(num_test, dtype=np.int32)
            row[list(combo)] = 1
            rows.append(row)
    if not rows:
        return np.zeros((0, num_test), dtype=np.int32)
    return np.stack(rows)


def _pack_columns(bits: jax.Array) -> jax.Array:
    """(..., K) 0/1 -> (..., K//32) uint32, bit c of word w = column 32w+c.

    Packs via uint8 byte sums + a 4-byte bitcast so no uint32-per-bit
    intermediate is ever materialized (that costs 32x the packed size in
    HBM — enough to OOM a chip at production batch sizes).
    """
    K = bits.shape[-1]
    assert K % 32 == 0
    b = bits.astype(jnp.uint8).reshape(*bits.shape[:-1], K // 8, 8)
    byte = jnp.sum(b << jnp.arange(8, dtype=jnp.uint8), axis=-1,
                   dtype=jnp.uint8)
    return jax.lax.bitcast_convert_type(
        byte.reshape(*bits.shape[:-1], K // 32, 4), jnp.uint32)


# A transposed-layout gather+pack variant (_gather_pack_T) was measured
# NEGATIVE (~2x slower than _gather_pack + transpose at B=512 K=1280 on
# v5e) and lives in scripts/osd_microbench.py with its timing harness;
# see also the negative-results log in CLAUDE.md.
def _gather_pack(H, colsK, Kp: int, chunk: int = 256,
                 words_major: bool = False) -> jax.Array:
    """Per-shot column gather + bit-pack, chunked over columns so the
    transient unpacked gather never exceeds (m, B, chunk) bytes.

    The gather lands in (m, B, chunk) layout and is PACKED BEFORE any
    transpose: the unpacked uint8 tensor (32x the packed size, ~660MB at
    production [[144]] shapes) is only ever read once where it falls out of
    the gather; all layout moves happen on the packed words.

    Returns (B, m, Kp//32), or the eliminator's (B, Kp//32, m) layout
    directly when words_major=True (skips the second transpose the Pallas
    path would otherwise pay)."""
    B, K = colsK.shape
    m = H.shape[0]
    Hu8 = H.astype(jnp.uint8)
    words = []
    for c0 in range(0, Kp, chunk):
        c1 = min(c0 + chunk, Kp)
        if c0 >= K:
            words.append(jnp.zeros((m, B, (c1 - c0) // 32), jnp.uint32))
            continue
        idx = colsK[:, c0:min(c1, K)]
        Hg = jnp.take(Hu8, idx, axis=1)                    # (m, B, c)
        if c1 > K:  # zero-pad the final partial chunk
            Hg = jnp.pad(Hg, ((0, 0), (0, 0), (0, c1 - K)))
        words.append(_pack_columns(Hg))                    # (m, B, c/32)
    packed = jnp.concatenate(words, axis=-1)               # (m, B, Kp/32)
    if words_major:
        return jnp.transpose(packed, (1, 2, 0))            # (B, W, m)
    return jnp.transpose(packed, (1, 0, 2))                # (B, m, W)


@partial(jax.jit, static_argnames=("K", "order", "num_test", "use_pallas",
                                   "rank", "return_solution", "stage1_cols"))
def osd_batch(H, HT, syndrome, llr, hard, K: int, order: int = 0,
              num_test: int = 0, use_pallas: bool = False, rank: int = None,
              basis_cols=None, logical_pack=None,
              return_solution: bool = True, stage1_cols: int = None):
    """Batched OSD post-processing of failed-BP shots.

    Args:
      H: (m, n) uint8 dense decoding matrix (class-level).
      HT: (n, m) bf16 transpose of H (for the residual matmul).
      syndrome: (B, m) int8 target syndromes.
      llr: (B, n) f32 posterior LLRs from BP.
      hard: (B, n) int8 BP hard decisions (starting point).
      K: static column budget for the elimination (multiple of 32).
      order: OSD reprocessing order (0 = OSD-0 only).
      num_test: number of least-reliable non-pivot test positions
        (reference uses order + 10; pass 0 with order=0).
      basis_cols: optional (R,) int32 — a fixed column basis of H (e.g.
        gf2.column_basis(H)), appended after the K reliability-ordered
        columns so elimination always reaches full rank.
      stage1_cols: staged-elimination stage-1 width for the Pallas path.
        None = auto (768 when K >= 2048, 256 when K >= 512, single-stage
        for tiny K); 0 disables.
        Large decoding graphs ([[288,12,18]]: K=3072, per-shot exit depths
        p50 ~1500) pay for every block's full-width scan; the staged path
        scans a narrow stage-1 prefix first, sorts covered shots ahead,
        and reruns ONLY the uncovered tail at full width in chunk-gated
        lax.while_loop passes, so full-width cost tracks the actual
        uncovered count. Results are consumed-output-identical to the
        single-stage scan (covered shots' post-validity pivots carry zero
        correction bits; see eliminate_blocks docstring).
      logical_pack: optional (n,) int32 — column j's logical action packed
        as bits (bit i = L[i, j]). When given, the output gains
        ``logical_delta_packed`` (B,) int32: the packed logical action of
        the OSD correction alone (the full decoded logical is
        hard@L^T ^ delta). Computed straight from the permuted correction
        (one gather + XOR reduce), skipping the (B, n) correction scatter —
        callers that only consume logical bits should pass this and
        return_solution=False (measured ~4.5ms/basis saved at B=512 on v5e).
      return_solution: skip materializing the (B, n) solution when False.

    Returns dict: solution (B, n) int8 (if return_solution), valid (B,) bool
    (syndrome exactly reproduced), rank_deficient (B,) bool,
    logical_delta_packed (B,) int32 (if logical_pack is given).

    Truncation safety: when the K least-reliable columns fail to reach full
    rank for some shot (measured ~0.2-0.7% of shots at p=0.005 on
    [[144,12,12]] — the completing columns can sit at the very END of the
    reliability order), the appended ``basis_cols`` complete the pivot set
    within the same elimination. The appended words are packed ONCE from
    fixed indices (no per-shot gather) and the per-block early exit stops
    at full rank, so clean blocks never step into them. A column listed in
    both the prefix and the basis is reduced to zero by the time the scan
    reaches its second copy (appended words lie right of every prefix
    pivot's word group, so left-skipping never leaves them stale) — it can
    never re-pivot, and the correction scatter adds 0 for it.
    ``rank_deficient`` then only flags syndromes outside H's column space
    (impossible for physical syndromes) — or real truncation deficiency
    when basis_cols is not provided.
    """
    B, n = llr.shape
    m = H.shape[0]
    assert K <= n
    Kp = -(-K // 32) * 32  # packed prefix width (zero-padded beyond K)

    # residual syndrome the correction must reproduce (reference osd.py:8-9)
    hard_syn = (jnp.dot(hard.astype(jnp.bfloat16), HT,
                        preferred_element_type=jnp.float32)
                .astype(jnp.int32) & 1)
    residual = (syndrome.astype(jnp.int32) ^ hard_syn)          # (B, m)

    # reliability ordering; gather + bit-pack the K least-reliable columns
    if logical_pack is not None:
        # carry each column's packed logical action through the sort as an
        # extra lax.sort operand (~free next to the key sort); the
        # equivalent post-hoc (n,) -> (B, KT) table gather costs ~12ms at
        # B=512 on v5e (per-shot dynamic lane indexing). Stable sort on the
        # key with an iota operand IS jnp.argsort — order_idx is unchanged.
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (B, n))
        lp_b = jnp.broadcast_to(logical_pack.astype(jnp.int32)[None], (B, n))
        _, order_idx, lp_sorted = jax.lax.sort(
            (jnp.abs(llr), iota, lp_b), dimension=1, num_keys=1,
            is_stable=True)
    else:
        order_idx = jnp.argsort(jnp.abs(llr), axis=1)           # (B, n)
        lp_sorted = None
    colsK = order_idx[:, :K]                                     # (B, K)

    # rank-completing basis appended after the prefix (see docstring):
    # fixed indices, so packed once and broadcast — no per-shot gather.
    if basis_cols is not None and K == n:
        basis_cols = None  # full-width prefix: nothing left to complete
    if basis_cols is not None:
        # packed padding slots between prefix and basis would alias column 0
        # in colsE (and could leak into reprocess test positions) — require
        # an aligned prefix instead (choose_K always returns one below n)
        assert K % 32 == 0, "basis_cols requires K % 32 == 0"
        R = basis_cols.shape[0]
        Rp = -(-R // 32) * 32
        Hb_bits = jnp.pad(
            jnp.take(H.astype(jnp.uint8), basis_cols, axis=1),
            ((0, 0), (0, Rp - R)))                               # (m, Rp)
        Hb_words = _pack_columns(Hb_bits)                        # (m, Rp//32)
        basis_words = jnp.broadcast_to(Hb_words[None],
                                       (B, m, Rp // 32))
        colsE = jnp.concatenate(
            [colsK,
             jnp.zeros((B, Kp - K), jnp.int32),  # packed padding slots
             jnp.broadcast_to(basis_cols[None].astype(jnp.int32), (B, R))],
            axis=1)                                              # (B, KT)
        KT = Kp + R
        if lp_sorted is not None:
            lp_perm = jnp.concatenate(
                [lp_sorted[:, :K], jnp.zeros((B, Kp - K), jnp.int32),
                 jnp.broadcast_to(jnp.take(logical_pack.astype(jnp.int32),
                                           basis_cols)[None], (B, R))],
                axis=1)                                          # (B, KT)
    else:
        basis_words = None
        colsE = colsK  # loop bound K never scans the packed padding
        KT = K
        if lp_sorted is not None:
            lp_perm = lp_sorted[:, :K]

    refine_for_reprocess = None
    if use_pallas:
        # VMEM-resident elimination kernel (osd_pallas.py). The gather+pack
        # lands straight in its checks-on-lanes layout (no unpacked-array
        # transposes). The default left-skipping kernel leaves dependent
        # columns left of a pivot's word group stale — everything OSD-0
        # reads (s_red, pivots, used, validity) is exact; the fully-reduced
        # matrix is recomputed on demand inside the reprocess cond.
        from .osd_pallas import eliminate_blocks, pick_block_shots
        M_pad = -(-m // 128) * 128
        s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))
        W_full = KT // 32 if KT % 32 == 0 else -(-KT // 32)
        S = pick_block_shots(M_pad, W_full)
        while B % S:
            S //= 2

        if basis_words is not None:
            HbT = jnp.pad(jnp.transpose(Hb_words, (1, 0)),
                          ((0, 0), (0, M_pad - m)))              # (Wb, M)

        if stage1_cols is None:
            # auto: narrow stage-1 pays FAR below the K>=2048 deep-exit
            # regime it was built for — on [[144]] (K=1280, exit depths
            # mean ~78/max ~300) the full osd_batch dropped 90 -> 66 ms at
            # B=1024 with any stage1 in [128, 320] (flat plateau, outputs
            # identical; scripts/osd144_stage_ab.py 2026-08-21). 256 sits
            # mid-plateau and safely covers the exit-depth tail; tiny K
            # (< 2*stage1) stays single-stage — nothing to narrow. Gates are
            # on the TRUE K (not the padded Kp) so stage1 <= K/2 always.
            if B % 32 != 0:
                stage1_cols = 0
            elif K >= 2048:
                stage1_cols = 768
            elif K >= 2 * 256:
                stage1_cols = 256
            else:
                stage1_cols = 0
        staged = bool(stage1_cols) and stage1_cols < K and B % 32 == 0

        def _gather_pref(cols, Kx):
            """Per-shot gather + pack of the first Kx reliability columns,
            lane-padded to the eliminator layout."""
            packed = _gather_pack(H, cols[:, :min(Kx, K)], Kx,
                                  words_major=True)
            return jnp.pad(packed, ((0, 0), (0, 0), (0, M_pad - m)))

        if staged:
            # staged mode gathers/packs ONLY the stage-1 prefix up front
            # (the full-width pack is ~4x the bytes and most shots never
            # need it); tail chunks and the reprocess path gather their
            # full-width columns on demand.
            HpT_pref = None
        else:
            HpT_pref = _gather_pref(colsK, Kp)                   # (B,Wp,M)

        def _full_HpT():
            pref = _gather_pref(colsK, Kp) if HpT_pref is None else HpT_pref
            return jnp.concatenate(
                [pref, jnp.broadcast_to(HbT[None], (B,) + HbT.shape)],
                axis=1) if basis_words is not None else pref
        if staged:
            # --- staged scan: narrow stage-1 + compacted full-width tail ---
            K1 = stage1_cols
            W1 = -(-K1 // 32)
            S1 = pick_block_shots(M_pad, -(-W1 // 8) * 8)
            while B % S1:
                S1 //= 2
            Hp_s1 = _gather_pref(colsK, W1 * 32)                 # (B,W1,M)
            _, s1, prow1, used1, cf1 = eliminate_blocks(
                Hp_s1, s_pad, K1, m, block_shots=S1, rank=rank)
            unsat1 = jnp.sum(jnp.where(~used1[:, :m], s1[:, :m], 0), axis=1)
            covered = unsat1 == 0                              # (B,)
            prow1p = jnp.pad(prow1, ((0, 0), (0, KT - K1)),
                             constant_values=-1)
            # coverage sort (stable): shots needing the full-width scan
            # occupy a contiguous tail, so full-width cost tracks the
            # ACTUAL uncovered count at chunk granularity
            order2 = jnp.argsort(~covered, stable=True)        # (B,)
            u0 = B - jnp.sum((~covered).astype(jnp.int32))
            CH = 32
            Wp8 = -(-(Kp // 32) // 8) * 8
            # tail blocks are uniformly DEEP (only stage-1-uncovered shots
            # land here), so size them against a raised VMEM budget
            # (QLDPC_OSD_TAIL_MB overrides for A/B; S=8 vs 16 measured
            # FLAT on [[288]] — cost there tracks width, not block count,
            # which is why the tail scans PREFIX-ONLY below).
            import os as _os
            tail_mb = int(_os.environ.get("QLDPC_OSD_TAIL_MB", "78"))
            S_t = min(CH, pick_block_shots(M_pad, Wp8,
                                           vmem_budget=tail_mb << 20))
            while CH % S_t:
                S_t //= 2

            def chunk_body(state):
                c0, s_o, prow_o, used_o, cf_o = state
                idx = jax.lax.dynamic_slice_in_dim(order2, c0, CH)
                # PREFIX-ONLY gather for this chunk's shots: the appended
                # rank-completing basis words (~W/2 of the full width on
                # [[288]]) are dead weight in the hot XOR — the validity
                # exit stops before them on every physical shot, and the
                # rare prefix-deficient shot is completed by the shared
                # basis rerun below, exactly like the non-staged path.
                Hp_c = _gather_pref(jnp.take(colsK, idx, axis=0), Kp)
                _, s2, prow2, used2, cf2 = eliminate_blocks(
                    Hp_c, jnp.take(s_pad, idx, axis=0), K, m,
                    block_shots=S_t, rank=rank)
                prow2p = jnp.pad(prow2, ((0, 0), (0, KT - K)),
                                 constant_values=-1)
                return (c0 + CH, s_o.at[idx].set(s2),
                        prow_o.at[idx].set(prow2p),
                        used_o.at[idx].set(used2), cf_o.at[idx].set(cf2))

            # boundary-chunk covered shots are rerun too: their deeper-scan
            # outputs are consumed-identical (post-validity pivots carry
            # zero syndrome bits), so overwriting is safe
            c_start = (u0 // CH) * CH
            _, s1, prow1p, used1, cf1 = jax.lax.while_loop(
                lambda st: st[0] < B, chunk_body,
                (c_start, s1, prow1p, used1, cf1))
        else:
            # Eliminate over the reliability prefix ONLY: the rank-completing
            # basis words are dead weight in the hot XOR (the validity exit
            # stops long before them on every physical shot), so the ~W_basis
            # extra words per column step are paid only inside the cond below,
            # which fires iff some shot's prefix failed to cover its syndrome.
            # Results are bit-identical either way: covered shots never read
            # the basis; uncovered shots take the rerun's full-width answer.
            import os as _os
            tail_mb = int(_os.environ.get("QLDPC_OSD_TAIL_MB", "78"))
            _, s1, prow1, used1, cf1 = eliminate_blocks(
                HpT_pref, s_pad, K, m, block_shots=S, rank=rank)
            prow1p = jnp.pad(prow1, ((0, 0), (0, KT - K)),
                             constant_values=-1)
        if basis_words is not None:
            # Shared basis completion (staged AND non-staged): a batch of
            # failed shots at a ~0.2-0.7% per-shot prefix-deficiency rate
            # trips the rerun cond most rounds, and a full-batch rerun
            # would re-eliminate all B shots at full width (measured
            # ~20ms/basis at B=512 on v5e — larger than the prefix
            # elimination itself). Instead gather the <= S_r uncovered
            # shots into one kernel block, rerun full width there
            # (prefix + basis), and scatter the results back; covered
            # shots keep their prefix-only outputs (the full-width run is
            # consumed-output-identical for them anyway, see the kernel
            # docstring). Fill slots index B: the gather clamps them to a
            # real shot, the scatter drops them (out-of-bounds updates).
            unsatp = jnp.sum(jnp.where(~used1[:, :m], s1[:, :m], 0), axis=1)
            bad = unsatp != 0                                     # (B,)
            nbad = jnp.sum(bad.astype(jnp.int32))
            W_f8 = -(-W_full // 8) * 8
            S_r = min(B, pick_block_shots(M_pad, W_f8,
                                          vmem_budget=tail_mb << 20))

            def rerun_small(_):
                idx = jnp.nonzero(bad, size=S_r, fill_value=B)[0]
                gi = jnp.minimum(idx, B - 1).astype(jnp.int32)
                pref_r = (jnp.take(HpT_pref, gi, axis=0)
                          if HpT_pref is not None else
                          _gather_pref(jnp.take(colsK, gi, axis=0), Kp))
                Hp_r = jnp.concatenate(
                    [pref_r,
                     jnp.broadcast_to(HbT[None], (S_r,) + HbT.shape)],
                    axis=1)
                _, s2, prow2, used2, cf2 = eliminate_blocks(
                    Hp_r, jnp.take(s_pad, gi, axis=0), KT, m,
                    block_shots=S_r, rank=rank)
                return (s1.at[idx].set(s2), prow1p.at[idx].set(prow2),
                        used1.at[idx].set(used2), cf1.at[idx].set(cf2))

            def rerun_full(_):  # > S_r deficient shots: effectively never
                _, s2, prow2, used2, cf2 = eliminate_blocks(
                    _full_HpT(), s_pad, KT, m, block_shots=S, rank=rank)
                return s2, prow2, used2, cf2

            def keep_prefix(_):
                return s1, prow1p, used1, cf1

            s_out, prow_of_col, used_p, cf = jax.lax.cond(
                nbad == 0, keep_prefix,
                lambda op: jax.lax.cond(nbad <= S_r, rerun_small, rerun_full,
                                        op),
                operand=None)
        else:
            s_out, prow_of_col, used_p, cf = s1, prow1p, used1, cf1
        Hp = None  # only the (rare) reprocess path materializes it
        s_red = s_out[:, :m]
        used = used_p[:, :m]
        # OSD-0 correction via SCATTER from row space (e0[colofrow[r]] =
        # s_red[r] for pivot rows): bit-identical to gathering
        # s_red[prow_of_col] per column slot, but ~1ms instead of ~11ms at
        # B=512 on v5e — TPU scatters are cheap, per-shot lane gathers are
        # not. Unused rows (and lane padding) dump into slot KT.
        tgt = jnp.where(used_p, cf, KT)                          # (B, M_pad)
        e0_perm = jnp.zeros((B, KT + 1), jnp.int32).at[
            jnp.arange(B)[:, None], tgt].set(s_out)[:, :KT]

        def refine_for_reprocess():
            hp_full, *_ = eliminate_blocks(_full_HpT(), s_pad, KT, m,
                                           block_shots=S, rank=rank,
                                           full_jordan=True)
            return jnp.transpose(hp_full, (0, 2, 1))[:, :m, :]
    else:
        Hp = _gather_pack(H, colsK, Kp)                          # (B, m, W)
        if basis_words is not None:
            Hp = jnp.concatenate([Hp, basis_words], axis=-1)
        Hp, s_red, used, prow_of_col = _eliminate_xla(Hp, residual, KT, m, B)
        # OSD-0 correction in permuted coords: e[col] = s_red[pivot_row(col)]
        e0_perm = jnp.where(
            prow_of_col >= 0,
            jnp.take_along_axis(s_red, jnp.maximum(prow_of_col, 0), axis=1),
            0)

    is_pivot = prow_of_col >= 0                                  # (B, K)
    # validity: un-pivoted rows must carry zero reduced syndrome
    unsat0 = jnp.sum(jnp.where(~used, s_red, 0), axis=1)         # (B,)
    valid0 = unsat0 == 0
    # With basis_cols appended, elimination always reaches H's full rank, so
    # an invalid OSD-0 can only mean the syndrome is outside H's column
    # space; without it, it can also mean K-prefix truncation deficiency.
    rank_deficient = ~valid0

    if order > 0 and num_test > 0:
        # The reference returns OSD-0 straight away whenever it reproduces
        # the syndrome (reference osd.py:27-29); physical syndromes are
        # always in H's column space so that is the overwhelmingly common
        # case. Guard the whole order-w search behind a runtime cond so the
        # O(B*m*C) combination scoring is paid only when some shot's OSD-0
        # actually failed — the cond's result is bit-identical because
        # _reprocess itself keeps e0_perm for valid0 shots.
        def run_reprocess(_):
            Hp_full = Hp if refine_for_reprocess is None \
                else refine_for_reprocess()
            return _reprocess(
                Hp_full, s_red, used, prow_of_col, is_pivot, e0_perm,
                valid0, llr, hard, colsE, order, num_test, B, KT, m)

        e_perm, valid = jax.lax.cond(
            jnp.all(valid0), lambda _: (e0_perm.astype(jnp.int32), valid0),
            run_reprocess, operand=None)
    else:
        e_perm, valid = e0_perm, valid0

    out = dict(valid=valid, rank_deficient=rank_deficient)
    if logical_pack is not None:
        # logical action of the correction, straight in permuted coords:
        # keep each slot's sort-carried packed logical column where the
        # correction bit is set, XOR-reduce. A basis column duplicated from
        # the prefix contributes 0 (its duplicate slot can never pivot).
        out["logical_delta_packed"] = jax.lax.reduce(
            jnp.where(e_perm > 0, lp_perm, 0), jnp.int32(0),
            jax.lax.bitwise_xor, (1,))
    if return_solution:
        # scatter correction back to original coordinates and apply to hard.
        # (Measured: this 2D scatter costs ~4.5ms at B=512 on v5e; the
        # "cleverer" inverse-permutation gather costs 46ms because
        # take_along_axis on the lane axis is per-lane dynamic indexing.)
        # .add, not .set: a basis column duplicated from the prefix shares
        # its slot's index; the duplicate slot can never pivot so it adds 0.
        corr = jnp.zeros((B, n), jnp.int32)
        corr = corr.at[jnp.arange(B)[:, None], colsE].add(e_perm)
        out["solution"] = (hard.astype(jnp.int32) ^ corr).astype(jnp.int8)
    return out


def _eliminate_xla(Hp, residual, K: int, m: int, B: int,
                   exit_on_valid: bool = True):
    """XLA while_loop swap-free Gauss-Jordan (CPU / fallback path). Touches
    the full (B, m, W) matrix in HBM every step — use the Pallas kernel on
    TPU for the VMEM-resident version.

    Validity early exit (same argument as the Pallas kernel's, see
    eliminate_blocks): the scan stops once EVERY shot's residual syndrome
    lies in its pivot span — from there on every new pivot's correction bit
    is zero, so all consumed outputs are identical to the full scan. The
    order-w reprocess needs the fully-reduced matrix, but it only runs when
    some shot is INVALID (osd_batch's cond), and the exit only fires when
    every shot is valid — so an early-exited matrix is never reprocessed."""
    row_ids = jnp.arange(m, dtype=jnp.int32)[None, :]            # (1, m)

    def elim_cond(carry):
        col, _ = carry
        return col < K

    def elim_step(carry):
        col, state = carry
        Hp, s, used, prow_of_col = state
        w = col // 32
        bit = (col % 32).astype(jnp.uint32)
        word = jax.lax.dynamic_slice_in_dim(Hp, w, 1, axis=2)[:, :, 0]
        colbits = (word >> bit) & jnp.uint32(1)                  # (B, m)
        cand = (colbits == 1) & ~used
        has = jnp.any(cand, axis=1)                              # (B,)
        piv = jnp.argmax(cand, axis=1).astype(jnp.int32)         # first True
        prow = jnp.take_along_axis(Hp, piv[:, None, None], axis=1)  # (B,1,W)
        ps = jnp.take_along_axis(s, piv[:, None], axis=1)        # (B, 1)
        elim = (colbits == 1) & (row_ids != piv[:, None]) & has[:, None]
        Hp = jnp.where(elim[:, :, None], Hp ^ prow, Hp)
        s = jnp.where(elim, s ^ ps, s)
        used = used | ((row_ids == piv[:, None]) & has[:, None])
        prow_of_col = jax.lax.dynamic_update_slice_in_dim(
            prow_of_col, jnp.where(has, piv, -1)[:, None], col, axis=1)
        if exit_on_valid:
            all_valid = jnp.all(
                jnp.sum(jnp.where(~used, s, 0), axis=1) == 0)
            next_col = jnp.where(all_valid, K, col + 1)
        else:
            next_col = col + 1
        return next_col, (Hp, s, used, prow_of_col)

    init = (Hp, residual, jnp.zeros((B, m), bool),
            jnp.full((B, K), -1, jnp.int32))
    start = (jnp.where(jnp.all(residual == 0), K, 0).astype(jnp.int32)
             if exit_on_valid else jnp.int32(0))
    _, out = jax.lax.while_loop(elim_cond, elim_step, (start, init))
    return out


def _reprocess(Hp, s_red, used, prow_of_col, is_pivot, e0_perm, valid0,
               llr, hard, colsK, order, num_test, B, K, m):
    """Order-w flip search over the least-reliable non-pivot columns.

    Only consulted for shots whose OSD-0 syndrome fails (reference
    osd.py:28-29 returns OSD-0 immediately otherwise).
    """
    # test positions: first num_test non-pivot column slots (ascending |LLR|)
    nonpiv = ~is_pivot                                           # (B, K)
    np_rank = jnp.cumsum(nonpiv.astype(jnp.int32), axis=1) - 1   # rank among nonpiv
    slot_ids = jnp.arange(K, dtype=jnp.int32)[None, :]
    # slot_of_rank (B, num_test): K-slot index of the t-th non-pivot column
    # (scatter by non-pivot rank; out-of-range ranks dump into slot num_test)
    cand_rank = jnp.where(nonpiv & (np_rank < num_test), np_rank, num_test)
    slot_of_rank = jnp.zeros((B, num_test + 1), jnp.int32).at[
        jnp.arange(B)[:, None], cand_rank].set(
        jnp.broadcast_to(slot_ids, (B, K)))[:, :num_test]

    # extract reduced-matrix bit columns at the test slots: (B, m, num_test)
    w_idx = slot_of_rank // 32                                   # (B, T)
    b_idx = (slot_of_rank % 32).astype(jnp.uint32)
    words = jnp.take_along_axis(Hp, w_idx[:, None, :], axis=2)   # (B, m, T)
    test_cols = ((words >> b_idx[:, None, :]) & jnp.uint32(1)).astype(jnp.int32)

    combos = jnp.asarray(_combo_masks(num_test, order))          # (C, T)
    C = combos.shape[0]
    # parity of flipped test columns at every row: (B, m, C) — the only
    # O(B*m*C) array; all per-column-slot work stays in row space to avoid
    # O(B*K*C) intermediates (a multi-GB HBM blowup at production batch)
    par_rows = jnp.einsum("bmt,ct->bmc", test_cols, combos) & 1
    unsat = jnp.sum(jnp.where(~used[:, :, None],
                              s_red[:, :, None] ^ par_rows, 0), axis=1)  # (B, C)

    # Penalized |LLR| metric (reference kernels.py:195-204) relative to hard.
    # The reference's float64 metric 1e10 + unsat*1e8 + sum|llr| orders
    # candidates lexicographically by (unsat, sum|llr|) since any LLR sum is
    # << 1e8; compare that way explicitly (f32 cannot hold 1e10 + few-unit
    # deltas without losing the LLR term entirely).
    #
    # Per-combo LLR delta, derived in row space: for pivot slot c with
    # weight w'_c, its correction bit is base_c XOR par(prow_c, combo), and
    # base ^ par = base + (1 - 2*base) * par, so
    #   delta(combo) = sum_c w'_c base_c
    #                + sum_r [sum_{c: prow_c = r} w'_c (1-2 base_c)] par(r, combo)
    #                + sum_{t in combo} w'_{test_t}.
    abs_llr = jnp.abs(llr)
    base_metric = jnp.sum(abs_llr * hard, axis=1)                # (B,)
    wperm = jnp.take_along_axis(abs_llr * (1 - 2 * hard), colsK, axis=1)
    prow_clamped = jnp.maximum(prow_of_col, 0)                   # (B, K)
    base_piv = jnp.take_along_axis(s_red, prow_clamped, axis=1)  # (B, K)
    wp = jnp.where(is_pivot, wperm, 0.0)
    const_piv = jnp.sum(wp * base_piv, axis=1)                   # (B,)
    wrow = jnp.zeros((B, s_red.shape[1]), jnp.float32).at[
        jnp.arange(B)[:, None], prow_clamped].add(
        wp * (1.0 - 2.0 * base_piv))                             # (B, m)
    delta_piv = jnp.einsum("bmc,bm->bc", par_rows.astype(jnp.float32), wrow)
    wtest = jnp.take_along_axis(wperm, slot_of_rank, axis=1)     # (B, T)
    delta_flip = wtest @ combos.T.astype(jnp.float32)            # (B, C)
    metric_c = base_metric[:, None] + const_piv[:, None] + delta_piv \
        + delta_flip                                             # (B, C)

    # OSD-0 candidate first (its metric), then combos; first minimum wins
    e0_delta = jnp.sum(e0_perm.astype(jnp.float32) * wperm, axis=1)
    unsat0 = jnp.sum(jnp.where(~used, s_red, 0), axis=1)
    all_llr = jnp.concatenate([(base_metric + e0_delta)[:, None], metric_c], 1)
    all_unsat = jnp.concatenate([unsat0[:, None], unsat], axis=1)
    min_unsat = jnp.min(all_unsat, axis=1, keepdims=True)
    eligible = all_unsat == min_unsat
    best = jnp.argmin(jnp.where(eligible, all_llr, jnp.inf), axis=1)  # (B,)

    # materialize the correction for the selected combo only
    pick_combo = jnp.maximum(best - 1, 0)
    par_best_rows = jnp.take_along_axis(
        par_rows, pick_combo[:, None, None], axis=2)[:, :, 0]    # (B, m)
    par_best_piv = jnp.take_along_axis(par_best_rows, prow_clamped, axis=1)
    e_best = jnp.where(is_pivot, base_piv ^ par_best_piv, 0)     # (B, K)
    combo_best = jnp.take(combos, pick_combo, axis=0)            # (B, T)
    e_best = e_best.at[jnp.arange(B)[:, None], slot_of_rank].max(combo_best)
    e_perm = jnp.where((best == 0)[:, None], e0_perm, e_best)
    unsat_best = jnp.where(best == 0, unsat0,
                           jnp.take_along_axis(unsat, pick_combo[:, None],
                                               axis=1)[:, 0])
    # reference returns OSD-0 straight away when it is valid
    e_perm = jnp.where(valid0[:, None], e0_perm, e_perm)
    valid = jnp.where(valid0, True, unsat_best == 0)
    return e_perm.astype(jnp.int32), valid


def choose_K(m: int, n: int, margin: int = 512) -> int:
    """Static elimination column budget: rank bound + margin, capped at n.

    Rounded up to a multiple of 256 so the packed word count lands on the
    Mosaic 8-word sublane tile exactly: the padding words exist either way,
    so the extra columns are free robustness against per-shot rank
    deficiency (the early exit stops at full rank regardless; deeper
    columns cost steps only for the rare shots that need them)."""
    K = -(-(m + margin) // 256) * 256
    return min(n, K)
