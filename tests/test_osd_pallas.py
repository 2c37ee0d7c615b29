"""Pallas elimination kernel vs the XLA fori_loop path (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qldpc_tpu.ops.osd import _eliminate_xla, _gather_pack
from qldpc_tpu.ops.osd_pallas import eliminate_blocks


def test_eliminate_blocks_matches_xla():
    rng = np.random.default_rng(4)
    m, n, K, B = 24, 60, 60, 8
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    errors = (rng.random((B, n)) < 0.15).astype(np.int8)
    residual = jnp.asarray((errors @ H.T) % 2).astype(jnp.int32)
    cols = jnp.asarray(np.stack([rng.permutation(n)[:K] for _ in range(B)]))
    Kp = -(-K // 32) * 32
    Hp = _gather_pack(jnp.asarray(H), cols, Kp)          # (B, m, W)

    xHp, xs, xused, xprow = _eliminate_xla(Hp, residual, K, m, B,
                                       exit_on_valid=False)

    M_pad = 128
    HpT = jnp.pad(jnp.transpose(Hp, (0, 2, 1)),
                  ((0, 0), (0, 0), (0, M_pad - m)))
    s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))
    pHp, ps, pprow, pused, pcf = eliminate_blocks(HpT, s_pad, K, m,
                                             block_shots=4, interpret=True,
                                             exit_on_valid=False)
    assert np.array_equal(np.asarray(pprow), np.asarray(xprow))
    # colofrow must invert prow_of_col exactly
    cf = np.asarray(pcf)
    want_cf = np.full_like(cf, -1)
    for b in range(B):
        for c in range(K):
            if xprow[b, c] >= 0:
                want_cf[b, int(xprow[b, c])] = c
    assert np.array_equal(cf, want_cf)
    assert np.array_equal(np.asarray(ps)[:, :m], np.asarray(xs))
    assert np.array_equal(
        np.asarray(jnp.transpose(pHp, (0, 2, 1))[:, :m, :]), np.asarray(xHp))
    assert np.array_equal(np.asarray(pused)[:, :m], np.asarray(xused))


def test_kernel_versions_match_v1():
    """The alternative eliminator generations (v2 fused multi-column, v3
    dual-block interleave) must reproduce v1 exactly on every output."""
    import qldpc_tpu.ops.osd_pallas as op
    rng = np.random.default_rng(6)
    m, n, K, B = 24, 96, 96, 8
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    errors = (rng.random((B, n)) < 0.12).astype(np.int8)
    residual = jnp.asarray((errors @ H.T) % 2).astype(jnp.int32)
    cols = jnp.asarray(np.stack([rng.permutation(n)[:K] for _ in range(B)]))
    Kp = -(-K // 32) * 32
    Hp = _gather_pack(jnp.asarray(H), cols, Kp)
    M_pad = 128
    HpT = jnp.pad(jnp.transpose(Hp, (0, 2, 1)),
                  ((0, 0), (0, 0), (0, M_pad - m)))
    s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))

    orig = op._KERNEL_VERSION
    outs = {}
    try:
        for ver in (1, 2, 3):
            op._KERNEL_VERSION = ver
            jax.clear_caches()
            # exit_on_valid=False -> all versions scan every column, so
            # EVERY output must be bit-identical (v2 otherwise overruns its
            # exit by up to unroll-1 columns, which is allowed for the
            # consumed outputs but not raw-equal; that path is covered by
            # test_validity_exit_matches_full_scan and the hardware A/B)
            outs[ver] = eliminate_blocks(HpT, s_pad, K, m, block_shots=4,
                                         interpret=True, exit_on_valid=False)
    finally:
        op._KERNEL_VERSION = orig
        jax.clear_caches()
    for ver in (2, 3):
        for i, name in enumerate(["Hp", "s", "prow", "used", "colofrow"]):
            a, b = np.asarray(outs[1][i]), np.asarray(outs[ver][i])
            assert np.array_equal(a, b), (ver, name)


def test_osd_batch_pallas_end_to_end():
    from qldpc_tpu.ops.osd import osd_batch
    rng = np.random.default_rng(11)
    m, n = 24, 60
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    B = 4
    errors = (rng.random((B, n)) < 0.12).astype(np.int8)
    syn = (errors @ H.T) % 2
    llr = rng.normal(2.0, 1.0, (B, n)).astype(np.float32)
    hard = np.zeros((B, n), np.int8)
    import qldpc_tpu.ops.osd_pallas as op

    orig = op.eliminate_blocks
    # run the pallas path in interpreter mode on CPU
    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    op.eliminate_blocks = interp
    try:
        r_pallas = osd_batch(jnp.asarray(H),
                             jnp.asarray(H.T, dtype=jnp.bfloat16),
                             jnp.asarray(syn), jnp.asarray(llr),
                             jnp.asarray(hard), K=n, order=2, num_test=12,
                             use_pallas=True)
    finally:
        op.eliminate_blocks = orig
    r_xla = osd_batch(jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
                      jnp.asarray(syn), jnp.asarray(llr), jnp.asarray(hard),
                      K=n, order=2, num_test=12, use_pallas=False)
    assert np.array_equal(np.asarray(r_pallas["solution"]),
                          np.asarray(r_xla["solution"]))
    assert np.array_equal(np.asarray(r_pallas["valid"]),
                          np.asarray(r_xla["valid"]))


def test_left_skip_matches_xla_wide():
    """K > 256 engages the left-skipping word groups: s_red / pivots / used
    must still match full Gauss-Jordan exactly, pivot columns of the
    reduced matrix must match, and full_jordan=True must reproduce the XLA
    matrix bit-for-bit."""
    rng = np.random.default_rng(9)
    m, n, B = 40, 320, 4
    K = 288  # W = 9 words -> two groups of 8
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    errors = (rng.random((B, n)) < 0.1).astype(np.int8)
    residual = jnp.asarray((errors @ H.T) % 2).astype(jnp.int32)
    cols = jnp.asarray(np.stack([rng.permutation(n)[:K] for _ in range(B)]))
    Kp = -(-K // 32) * 32
    Hp = _gather_pack(jnp.asarray(H), cols, Kp)

    xHp, xs, xused, xprow = _eliminate_xla(Hp, residual, K, m, B,
                                       exit_on_valid=False)

    M_pad = 128
    HpT = jnp.pad(jnp.transpose(Hp, (0, 2, 1)),
                  ((0, 0), (0, 0), (0, M_pad - m)))
    s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))
    for full in (False, True):
        pHp, ps, pprow, pused, _ = eliminate_blocks(
            HpT, s_pad, K, m, block_shots=4, interpret=True,
            full_jordan=full, exit_on_valid=False)
        assert np.array_equal(np.asarray(pprow), np.asarray(xprow))
        assert np.array_equal(np.asarray(ps)[:, :m], np.asarray(xs))
        assert np.array_equal(np.asarray(pused)[:, :m], np.asarray(xused))
        got = np.asarray(jnp.transpose(pHp, (0, 2, 1))[:, :m, :])
        want = np.asarray(xHp)
        if full:
            assert np.array_equal(got, want)
        else:
            # pivot columns agree even without the full reduction
            prow = np.asarray(xprow)
            for b in range(B):
                for c in range(K):
                    if prow[b, c] >= 0:
                        w, bit = divmod(c, 32)
                        assert np.array_equal(
                            (got[b, :, w] >> bit) & 1,
                            (want[b, :, w] >> bit) & 1), (b, c)


def test_validity_exit_matches_full_scan():
    """exit_on_valid=True must leave every CONSUMED output identical to the
    full scan: s_red, per-shot validity (zero residual on unused rows), and
    the OSD-0 solution in original coordinates. prow_of_col may omit
    post-validity pivots — but only ones whose correction bit is zero."""
    rng = np.random.default_rng(21)
    m, n, B = 40, 320, 8
    K = 288
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    errors = (rng.random((B, n)) < 0.08).astype(np.int8)
    residual = jnp.asarray((errors @ H.T) % 2).astype(jnp.int32)
    # one all-zero residual: valid before any elimination (loop skipped)
    residual = residual.at[2].set(0)
    cols = jnp.asarray(np.stack([rng.permutation(n)[:K] for _ in range(B)]))
    Kp = -(-K // 32) * 32
    Hp = _gather_pack(jnp.asarray(H), cols, Kp)
    M_pad = 128
    HpT = jnp.pad(jnp.transpose(Hp, (0, 2, 1)),
                  ((0, 0), (0, 0), (0, M_pad - m)))
    s_pad = jnp.pad(residual, ((0, 0), (0, M_pad - m)))

    outs = {}
    for exit_valid in (False, True):
        _, ps, pprow, pused, _ = eliminate_blocks(
            HpT, s_pad, K, m, block_shots=4, interpret=True,
            exit_on_valid=exit_valid)
        ps, pprow, pused = (np.asarray(ps)[:, :m], np.asarray(pprow),
                            np.asarray(pused)[:, :m])
        e0 = np.zeros((B, n), np.int32)
        for b in range(B):
            for c in range(K):
                if pprow[b, c] >= 0:
                    e0[b, int(cols[b, c])] ^= int(ps[b, pprow[b, c]])
        unsat = np.array([int(ps[b][~pused[b]].sum()) for b in range(B)])
        outs[exit_valid] = (ps, e0, unsat == 0)
    for a, b in zip(outs[False], outs[True]):
        assert np.array_equal(a, b)
    assert outs[True][2].any()  # some shot did become valid


def test_pallas_basis_rerun_small_and_full():
    """The pallas path eliminates over the reliability prefix only and
    reruns uncovered shots through the rank-completing basis in a gathered
    small block (or the full batch when the block overflows). Both rerun
    shapes must reproduce the XLA path (which always eliminates prefix +
    basis for every shot) bit-for-bit on every consumed output."""
    import qldpc_tpu.ops.osd_pallas as op
    from qldpc_tpu.models.gf2 import column_basis
    from qldpc_tpu.ops.osd import osd_batch

    rng = np.random.default_rng(3)
    m, n, K, B = 8, 64, 32, 4
    H = np.zeros((m, n), np.uint8)
    for j in range(n - 1):
        H[rng.choice(7, 3, replace=False), j] = 1
    H[7, n - 1] = 1  # row 7 covered ONLY by the last column
    llr = rng.normal(2.0, 0.3, (B, n)).astype(np.float32)
    llr[:, n - 1] = 30.0  # ... which sorts beyond the K-prefix
    errors = np.zeros((B, n), np.int8)
    errors[0, n - 1] = 1  # shots 0 and 2 need the appended basis
    errors[1, 3] = 1
    errors[2, n - 1] = 1
    errors[2, 5] = 1
    syn = (errors @ H.T) % 2
    hard = np.zeros((B, n), np.int8)
    args = (jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
            jnp.asarray(syn), jnp.asarray(llr), jnp.asarray(hard))
    basis = jnp.asarray(column_basis(H))

    want = osd_batch(*args, K=K, order=0, num_test=0, use_pallas=False,
                     basis_cols=basis)
    assert np.asarray(want["valid"]).all()

    orig_elim, orig_pick = op.eliminate_blocks, op.pick_block_shots

    def interp(*a, **k):
        k["interpret"] = True
        return orig_elim(*a, **k)

    # pick_block_shots also sizes the rerun block S_r: large -> the two
    # uncovered shots take the gathered small-block rerun; 1 -> nbad > S_r
    # forces the full-batch fallback.
    for pick, path in ((orig_pick, "small"), (lambda *a, **k: 1, "full")):
        op.eliminate_blocks, op.pick_block_shots = interp, pick
        try:
            got = osd_batch(*args, K=K, order=0, num_test=0, use_pallas=True,
                            basis_cols=basis)
        finally:
            op.eliminate_blocks, op.pick_block_shots = orig_elim, orig_pick
        for key in ("solution", "valid", "rank_deficient"):
            assert np.array_equal(np.asarray(got[key]),
                                  np.asarray(want[key])), (path, key)


def test_staged_elimination_matches_single_stage():
    """stage1_cols engages the staged scan: narrow stage-1 prefix,
    coverage sort, and a chunk-gated full-width rerun of the uncovered
    tail. Every consumed output must match both the single-stage pallas
    path and the XLA path. The case is built so stage 1 covers most
    shots, a few need columns past stage1_cols (tail rerun), and one
    needs the appended basis (beyond K)."""
    import qldpc_tpu.ops.osd_pallas as op
    from qldpc_tpu.models.gf2 import column_basis
    from qldpc_tpu.ops.osd import osd_batch

    rng = np.random.default_rng(9)
    m, n, K, B = 24, 256, 96, 32
    H = np.zeros((m, n), np.uint8)
    for j in range(n - 5):
        H[rng.choice(20, 3, replace=False), j] = 1
    # rows 20/21 covered ONLY by "deep" columns sorted past stage1_cols=64
    deep = [n - 5, n - 4, n - 3, n - 2]
    H[20, deep[0]] = H[1, deep[0]] = 1
    H[21, deep[1]] = H[2, deep[1]] = 1
    H[20, deep[2]] = H[3, deep[2]] = 1
    H[21, deep[3]] = H[4, deep[3]] = 1
    H[22, n - 1] = 1          # row 22 covered only by the last column ...
    llr = np.full((B, n), 10.0, np.float32)
    pool = rng.choice(n - 5, 70, replace=False)
    llr[:, pool] = rng.uniform(1.0, 2.0, (B, 70))
    llr[:, deep] = rng.uniform(2.5, 3.0, (B, 4))   # sorted ~positions 70-73
    llr[:, n - 1] = 30.0      # ... which sorts beyond the K-prefix
    errors = np.zeros((B, n), np.int8)
    for b in range(28):
        errors[b, rng.choice(pool, 2, replace=False)] = 1
    errors[28, deep[0]] = 1   # syndrome on row 20: needs the tail rerun
    errors[29, deep[1]] = 1
    errors[30, n - 1] = 1     # needs the appended basis
    errors[31, deep[2]] = errors[31, int(pool[0])] = 1
    syn = (errors @ H.T) % 2
    hard = np.zeros((B, n), np.int8)
    args = (jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
            jnp.asarray(syn), jnp.asarray(llr), jnp.asarray(hard))
    basis = jnp.asarray(column_basis(H))

    want = osd_batch(*args, K=K, order=0, num_test=0, use_pallas=False,
                     basis_cols=basis)
    assert np.asarray(want["valid"]).all()

    orig = op.eliminate_blocks

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    got = {}
    op.eliminate_blocks = interp
    try:
        for s1 in (0, 64):
            got[s1] = osd_batch(*args, K=K, order=0, num_test=0,
                                use_pallas=True, basis_cols=basis,
                                stage1_cols=s1)
    finally:
        op.eliminate_blocks = orig
    for key in ("solution", "valid", "rank_deficient"):
        assert np.array_equal(np.asarray(got[64][key]),
                              np.asarray(want[key])), ("staged-vs-xla", key)
        assert np.array_equal(np.asarray(got[0][key]),
                              np.asarray(want[key])), ("single-vs-xla", key)
