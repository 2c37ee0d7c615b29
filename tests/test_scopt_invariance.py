"""SCOPT beta consumption: the rigorous negative (VERDICT r3 item 8).

The reference estimates a SCOPT beta but never consumes it (reference
src/simulation/engine.py:389 TODO: scale posterior LLRs by beta before
OSD). In THIS decoder that consumption is provably a no-op for any scalar
beta > 0 — every posterior consumer is scale-invariant:

  1. OSD column ordering: argsort(|beta*x|) == argsort(|x|);
  2. hard decisions: sign(beta*x) == sign(x);
  3. the residual-weight OSD presort: a function of hard decisions only;
  4. the order-w reprocess metric: lexicographic (unsat, sum|llr| terms)
     per reference kernels.py:195-204 — a uniform positive scaling of the
     second key preserves every argmin.

So "consume beta" cannot change any decoded bit here; an effect would
require a NONLINEAR consumer (e.g. posterior/prior mixing), which neither
the reference nor this framework defines. These tests pin the invariance
bit-for-bit so the claim stays checked as the decoder evolves.
"""
import numpy as np

import jax.numpy as jnp

from qldpc_tpu.models.gf2 import column_basis
from qldpc_tpu.ops.osd import osd_batch


def _case(seed=2, m=24, n=96, B=8):
    rng = np.random.default_rng(seed)
    H = np.zeros((m, n), np.uint8)
    for j in range(n):
        H[rng.choice(m, 3, replace=False), j] = 1
    errors = (rng.random((B, n)) < 0.12).astype(np.int8)
    syn = (errors @ H.T) % 2
    llr = rng.normal(2.0, 1.0, (B, n)).astype(np.float32)
    hard = np.zeros((B, n), np.int8)
    return H, syn, llr, hard


def test_beta_scaling_is_decision_invariant():
    H, syn, llr, hard = _case()
    basis = jnp.asarray(column_basis(H))
    logical_pack = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, H.shape[1], np.int32))
    outs = []
    for beta in (1.0, 0.37, 8.5):
        r = osd_batch(jnp.asarray(H), jnp.asarray(H.T, dtype=jnp.bfloat16),
                      jnp.asarray(syn), jnp.asarray(beta * llr),
                      jnp.asarray(hard), K=64, order=2, num_test=12,
                      use_pallas=False, basis_cols=basis,
                      logical_pack=logical_pack)
        outs.append({k: np.asarray(v) for k, v in r.items()})
    for r in outs[1:]:
        for k in ("solution", "valid", "rank_deficient",
                  "logical_delta_packed"):
            assert np.array_equal(outs[0][k], r[k]), (k, "beta changed it")


def test_beta_scaling_preserves_bp_feed():
    """The engine feeds OSD with BP hard decisions + posteriors; scaling
    posteriors cannot change the ordering or the residual presort key."""
    rng = np.random.default_rng(1)
    vals = rng.normal(0, 3, (4, 50)).astype(np.float32)
    assert np.array_equal(np.argsort(np.abs(vals), axis=1),
                          np.argsort(np.abs(0.42 * vals), axis=1))
    assert np.array_equal(vals < 0, (0.42 * vals) < 0)
