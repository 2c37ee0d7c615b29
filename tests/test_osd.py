"""Batched OSD vs a full-width scalar oracle.

The oracle performs reliability-ordered GF(2) Gauss-Jordan over ALL n
columns (no truncation) and the order-w flip search with the penalized
metric — the algorithm the reference implements. Agreement validates both
the truncated batched elimination and the reprocessing path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, channel_llrs, get_code
from qldpc_tpu.ops.bp import TannerGraph, alpha_schedule, decode_batch
from qldpc_tpu.ops.osd import choose_K, osd_batch
from itertools import combinations


def osd_oracle(H, syndrome, llr, hard, order=0):
    """Scalar OSD over all n columns, reference algorithm semantics."""
    H = (np.asarray(H) % 2).astype(np.int64)
    m, n = H.shape
    residual = (syndrome + hard @ H.T) % 2
    order_idx = np.argsort(np.abs(llr), kind="stable")
    Hp = H[:, order_idx].copy()
    s = residual.copy()
    used = np.zeros(m, bool)
    prow_of_col = np.full(n, -1)
    for col in range(n):
        rows = np.nonzero(Hp[:, col] & ~used)[0]
        if rows.size == 0:
            continue
        piv = rows[0]
        others = np.nonzero(Hp[:, col])[0]
        others = others[others != piv]
        Hp[others] ^= Hp[piv]
        s[others] ^= s[piv]
        used[piv] = True
        prow_of_col[col] = piv
    e_perm = np.zeros(n, np.int64)
    piv_cols = np.nonzero(prow_of_col >= 0)[0]
    e_perm[piv_cols] = s[prow_of_col[piv_cols]]

    def metric(e_p):
        corr = np.zeros(n, np.int64)
        corr[order_idx] = e_p
        sol = (hard + corr) % 2
        syn = (sol @ H.T) % 2
        unsat = int((syn != syndrome).sum())
        pen = 1e10 + unsat * 1e8 if unsat else 0.0
        return pen + float(np.sum(sol * np.abs(llr))), sol, unsat == 0

    m0, sol0, valid0 = metric(e_perm)
    if valid0 or order == 0:
        return sol0, valid0
    nonpiv = [c for c in range(n) if prow_of_col[c] < 0]
    test = nonpiv[:order + 10]
    best_m, best_sol, best_valid = m0, sol0, valid0
    for w in range(1, order + 1):
        for combo in combinations(range(len(test)), w):
            e = e_perm.copy()
            for t in combo:
                e[test[t]] = 1
            # re-solve pivots given flipped non-pivot assignment
            for c in piv_cols:
                r = prow_of_col[c]
                acc = s[r]
                for t in combo:
                    acc ^= Hp[r, test[t]]
                e[c] = acc
            mm, sol, valid = metric(e)
            if mm < best_m:
                best_m, best_sol, best_valid = mm, sol, valid
    return best_sol, best_valid


def test_osd0_matches_oracle_small():
    rng = np.random.default_rng(5)
    m, n = 40, 90
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    B = 16
    errors = (rng.random((B, n)) < 0.1).astype(np.int8)
    syn = (errors @ H.T) % 2
    llr = rng.normal(2.0, 1.5, (B, n)).astype(np.float32)
    hard = (rng.random((B, n)) < 0.05).astype(np.int8)
    out = osd_batch(jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
                    jnp.asarray(syn), jnp.asarray(llr), jnp.asarray(hard),
                    K=n, order=0)
    sols = np.asarray(out["solution"])
    valid = np.asarray(out["valid"])
    for b in range(B):
        osol, ovalid = osd_oracle(H, syn[b], llr[b], hard[b], order=0)
        assert valid[b] == ovalid
        assert ovalid  # consistent syndromes must be solvable
        assert np.array_equal((sols[b] @ H.T) % 2, syn[b]), b
        # same metric class: both valid solutions reproduce the syndrome;
        # with full-width K the pivot sets coincide so solutions match
        assert np.array_equal(sols[b], osol), b


def test_osd_on_real_decoding_graph_after_bp():
    """End-to-end: failed-BP shots on [[72]] get valid OSD solutions with
    zero rank-deficiency at the default K margin."""
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=6)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.006)
    H = (M["HdecZ"] != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"]).astype(np.float32)
    graph = TannerGraph.from_dense(H)
    rng = np.random.default_rng(2)
    B = 32
    errors = (rng.random((B, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syn = (errors @ H.T) % 2
    dec = decode_batch(graph, jnp.asarray(syn), jnp.asarray(prior),
                       jnp.asarray(alpha_schedule("dynamical", 20)), 20)
    K = choose_K(*H.shape)
    out = osd_batch(jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
                    jnp.asarray(syn), dec["values"], dec["hard"],
                    K=K, order=2, num_test=12)
    sols = np.asarray(out["solution"])
    assert not np.asarray(out["rank_deficient"]).any()
    assert np.asarray(out["valid"]).all()
    for b in range(B):
        assert np.array_equal((sols[b] @ H.T) % 2, syn[b]), b


def test_osd_order2_reprocessing_inconsistent_syndrome():
    """Force inconsistent syndromes (outside the column space) so the flip
    search runs; the batched result must match the oracle's best metric."""
    rng = np.random.default_rng(9)
    m, n = 24, 40
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m - 4, 3, replace=False), j] = 1  # last 4 rows all-zero
    B = 8
    syn = (rng.random((B, m)) < 0.3).astype(np.int8)
    syn[:, -4:] = 1  # unsatisfiable rows -> OSD-0 invalid
    llr = rng.normal(1.5, 1.0, (B, n)).astype(np.float32)
    hard = np.zeros((B, n), np.int8)
    out = osd_batch(jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
                    jnp.asarray(syn), jnp.asarray(llr), jnp.asarray(hard),
                    K=n, order=2, num_test=12)
    sols = np.asarray(out["solution"])
    assert not np.asarray(out["valid"]).any()
    for b in range(B):
        osol, ovalid = osd_oracle(H, syn[b], llr[b], hard[b], order=2)
        assert not ovalid
        # compare penalized metrics (solutions may tie)
        def met(sol):
            unsat = int(((sol @ H.T) % 2 != syn[b]).sum())
            return (1e10 + unsat * 1e8 if unsat else 0.0) + float(
                np.sum(sol * np.abs(llr[b])))
        assert met(sols[b]) <= met(osol) + 1e-3, b


def test_truncation_deficiency_basis_completion():
    """When the K least-reliable columns don't span a needed check, the
    appended rank-completing basis must still produce a syndrome-reproducing
    solution (reference semantics eliminate over all n columns), with
    rank_deficient False. Without the basis, the same input must be flagged
    rank_deficient."""
    import jax.numpy as jnp
    from qldpc_tpu.models.gf2 import column_basis
    from qldpc_tpu.ops.osd import osd_batch

    rng = np.random.default_rng(3)
    m, n, K = 8, 64, 32
    H = np.zeros((m, n), np.uint8)
    # rows 0..6 covered densely by the first 32 columns
    for j in range(n - 1):
        H[rng.choice(7, 3, replace=False), j] = 1
    # row 7 covered ONLY by the last column
    H[7, n - 1] = 1
    # reliability: last column has by far the largest |LLR| -> sorts last
    llr = rng.normal(2.0, 0.3, (4, n)).astype(np.float32)
    llr[:, n - 1] = 30.0
    errors = np.zeros((4, n), np.int8)
    errors[0, n - 1] = 1          # needs the excluded column
    errors[1, 3] = 1
    errors[2, n - 1] = 1
    errors[2, 5] = 1
    syn = (errors @ H.T) % 2
    hard = np.zeros((4, n), np.int8)
    args = (jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
            jnp.asarray(syn), jnp.asarray(llr), jnp.asarray(hard))
    basis = column_basis(H)
    assert n - 1 in basis  # the only column covering row 7
    out = osd_batch(*args, K=K, order=0, num_test=0, use_pallas=False,
                    basis_cols=jnp.asarray(basis))
    sol = np.asarray(out["solution"])
    assert np.asarray(out["valid"]).all()
    assert not np.asarray(out["rank_deficient"]).any()
    assert np.array_equal((sol @ H.T) % 2, syn)
    # without the basis: shots 0 and 2 cannot be completed within K columns
    out2 = osd_batch(*args, K=K, order=0, num_test=0, use_pallas=False)
    rdef = np.asarray(out2["rank_deficient"])
    assert rdef[0] and rdef[2] and not rdef[1] and not rdef[3]


def test_logical_delta_packed_matches_solution():
    """logical_delta_packed must equal (solution ^ hard) @ L^T mod 2, packed
    — on valid, reprocessed-invalid, and basis-completed shots alike."""
    rng = np.random.default_rng(17)
    m, n, k = 24, 64, 5
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    L = (rng.random((k, n)) < 0.3).astype(np.uint8)
    pack = jnp.asarray((L.astype(np.int64)
                        << np.arange(k, dtype=np.int64)[:, None]).sum(0),
                       jnp.int32)
    B = 8
    errors = (rng.random((B, n)) < 0.12).astype(np.int8)
    syn = (errors @ H.T) % 2
    syn[5] ^= 1  # likely-inconsistent shot exercises the reprocess branch
    llr = rng.normal(2.0, 1.0, (B, n)).astype(np.float32)
    hard = (rng.random((B, n)) < 0.05).astype(np.int8)
    from qldpc_tpu.models.gf2 import column_basis
    for kwargs in ({"K": n}, {"K": 32, "basis_cols":
                              jnp.asarray(column_basis(H))}):
        out = osd_batch(jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
                        jnp.asarray(syn), jnp.asarray(llr), jnp.asarray(hard),
                        order=2, num_test=12, logical_pack=pack, **kwargs)
        corr = (np.asarray(out["solution"]) ^ hard) % 2
        want = ((corr @ L.T) % 2).astype(np.int64)
        want_packed = (want << np.arange(k)).sum(1)
        assert np.array_equal(np.asarray(out["logical_delta_packed"]),
                              want_packed), kwargs
