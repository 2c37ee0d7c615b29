"""Native single-core baseline decoder: correctness vs the JAX decoder.

The C++ trial decoder (native/gf2kernels.cc baseline_decode_trials) is the
measured denominator of bench.py's vs_baseline; these tests pin that it
implements the same decode semantics as the production path (reference
per-trial structure: src/decoding/kernels.py:234-366 + osd.py:5-77).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.models.builder import channel_llrs
from qldpc_tpu.native.build import baseline_decode_native
from qldpc_tpu.ops.bp import TannerGraph, alpha_schedule, decode_batch


@pytest.fixture(scope="module")
def problem():
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=6)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.006)
    H = (np.asarray(M["HdecZ"]) != 0).astype(np.uint8)
    prior = channel_llrs(M["channel_probsZ"])
    rng = np.random.default_rng(3)
    errs = (rng.random((48, H.shape[1])) < M["channel_probsZ"]).astype(np.int8)
    syns = ((errs @ H.T) % 2).astype(np.uint8)
    return H, prior, syns


def test_native_baseline_matches_jax_decoder(problem):
    H, prior, syns = problem
    maxIter = 8
    seq = np.asarray(alpha_schedule("dynamical", maxIter), np.float32)
    out = baseline_decode_native(H, prior, syns, maxIter, seq, order=2,
                                 num_test=12, return_solutions=True)
    if out is None:
        pytest.skip("native toolchain unavailable")
    elapsed, conv, sol = out
    assert elapsed > 0
    # every decoded pattern must reproduce its syndrome (BP-converged shots
    # by the convergence criterion, OSD shots by construction)
    resid = (sol.astype(np.int64) @ H.T.astype(np.int64)) % 2
    np.testing.assert_array_equal(resid.astype(np.uint8), syns)
    # convergence decisions agree exactly with the production JAX decoder
    g = TannerGraph.from_dense(H)
    dec = decode_batch(g, jnp.asarray(syns), jnp.asarray(prior, jnp.float32),
                       jnp.asarray(seq), maxIter)
    np.testing.assert_array_equal(np.asarray(dec["converged"]),
                                  conv.astype(bool))
    # the workload must exercise BOTH paths for the timing to mean anything
    assert 0 < conv.sum() < len(conv)


def test_native_baseline_osd_order_improves_weight(problem):
    """Order-2 reprocessing must never pick a heavier solution than OSD-0
    (it searches a superset of candidates, scored by total |LLR| weight)."""
    H, prior, syns = problem
    maxIter = 4  # fail more shots into OSD
    seq = np.asarray(alpha_schedule("dynamical", maxIter), np.float32)
    r0 = baseline_decode_native(H, prior, syns, maxIter, seq, order=0,
                                num_test=0, return_solutions=True)
    r2 = baseline_decode_native(H, prior, syns, maxIter, seq, order=2,
                                num_test=12, return_solutions=True)
    if r0 is None:
        pytest.skip("native toolchain unavailable")
    _, conv0, sol0 = r0
    _, conv2, sol2 = r2
    np.testing.assert_array_equal(conv0, conv2)  # BP identical
    w = np.abs(prior)
    w0 = (sol0 * w).sum(axis=1)
    w2 = (sol2 * w).sum(axis=1)
    assert (w2 <= w0 + 1e-4).all()
    # both orders still satisfy every syndrome
    resid = (sol2.astype(np.int64) @ H.T.astype(np.int64)) % 2
    np.testing.assert_array_equal(resid.astype(np.uint8), syns)
