"""Public BatchDecoder API: externally-supplied syndrome decoding."""
import numpy as np
import pytest

import jax.numpy as jnp

from qldpc_tpu import (BatchDecoder, SyndromeCircuit,
                       build_decoding_matrices, get_code)


@pytest.fixture(scope="module")
def setup72():
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=3)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.004)
    return code, circ, M


def _class_errors_and_syndromes(M, rng, N, scale=1.0):
    probs = np.minimum(M["channel_probsZ"] * scale, 0.5)
    e = (rng.random((N, len(probs))) < probs).astype(np.uint8)
    H = (np.asarray(M["HdecZ"]) != 0).astype(np.uint8)
    k = M["k"]
    first = M["first_logical_rowZ"]
    L = (np.asarray(M["HZ_full"])[first:first + k] != 0).astype(np.uint8)
    syn = (e @ H.T) % 2
    true_log = (e @ L.T) % 2
    return syn, true_log


def test_decode_matches_internal_path(setup72):
    """BatchDecoder.decode == the engine's _decode_logicals on the same
    syndromes, including the padding path (N not a multiple of B)."""
    from qldpc_tpu.parallel.engine import _decode_logicals
    code, circ, M = setup72
    rng = np.random.default_rng(8)
    syn, _ = _class_errors_and_syndromes(M, rng, 21)
    dec = BatchDecoder(code.Hx, code.Hz, code.Lx, code.Lz, 0.004,
                       num_cycles=3, maxIter=10, osd_order=1,
                       precomputed_matrices=M, ell=code.ell, m=code.m,
                       a_x_powers=code.a_x_powers, a_y_powers=code.a_y_powers,
                       b_y_powers=code.b_y_powers, b_x_powers=code.b_x_powers)
    out = dec.decode(syn, basis="Z", batch_size=8)
    assert out["logicals"].shape == (21, M["k"])
    want_lg, want_cv, _ = _decode_logicals(
        jnp.asarray(syn[:8]), dec.bases["Z"], 10, 1, 1.0, 20.0,
        dec.use_pallas, dec.msg_dtype)
    assert np.array_equal(out["logicals"][:8], np.asarray(want_lg))
    assert np.array_equal(out["converged"][:8], np.asarray(want_cv))


def test_decode_recovers_true_logicals_at_low_p(setup72):
    """At the builder's own channel, the decoded logical action matches the
    injected errors' true logical action for the vast majority of shots."""
    code, circ, M = setup72
    rng = np.random.default_rng(5)
    syn, true_log = _class_errors_and_syndromes(M, rng, 64)
    dec = BatchDecoder(code.Hx, code.Hz, code.Lx, code.Lz, 0.004,
                       num_cycles=3, maxIter=20, osd_order=2,
                       precomputed_matrices=M, ell=code.ell, m=code.m,
                       a_x_powers=code.a_x_powers, a_y_powers=code.a_y_powers,
                       b_y_powers=code.b_y_powers, b_x_powers=code.b_x_powers)
    out = dec.decode(syn, basis="Z", batch_size=64)
    match = np.all(out["logicals"] == true_log, axis=1)
    assert match.mean() > 0.9, match.mean()


def test_decode_rejects_wrong_shape(setup72):
    code, circ, M = setup72
    dec = BatchDecoder(code.Hx, code.Hz, code.Lx, code.Lz, 0.004,
                       num_cycles=3, maxIter=5, osd_order=0,
                       precomputed_matrices=M, ell=code.ell, m=code.m,
                       a_x_powers=code.a_x_powers, a_y_powers=code.a_y_powers,
                       b_y_powers=code.b_y_powers, b_x_powers=code.b_x_powers)
    with pytest.raises(ValueError, match="syndromes"):
        dec.decode(np.zeros((4, 7), np.uint8), basis="Z")
