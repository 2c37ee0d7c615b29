"""[[4,2,2]] hand-checkable goldens (reference toy_example.ipynb cells
10-15; SURVEY.md §4 "the natural seed for golden unit tests").

Every expected value below is derived by hand in examples/toy_422.py's
docstring — these are true goldens, independent of any implementation.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from toy_422 import (DATA, X0, Lx, decoding_matrix_z, enumerate_z_faults,
                     z_syndromes)


def test_data_error_syndrome_golden():
    """Z on data 0 between cycles: the X check re-detects it every cycle."""
    raw, sparse, logical = z_syndromes([12], [DATA[0]])
    assert np.array_equal(raw, [0, 1, 1, 1])
    assert np.array_equal(sparse, [0, 1, 0, 0])
    assert np.array_equal(logical, [1, 1])


def test_measurement_error_syndrome_golden():
    """Z on the ancilla right before a MeasX flips ONE readout: raw and
    sparse signatures are distinguishable from a data error (notebook
    cell 14's narrative)."""
    raw, sparse, logical = z_syndromes([22], [X0])
    assert np.array_equal(raw, [0, 1, 0, 0])
    assert np.array_equal(sparse, [0, 1, 1, 0])
    assert np.array_equal(logical, [0, 0])


def test_every_data_qubit_error_logical_golden():
    """Final-cycle data errors: logical effect is Lx @ e_q exactly."""
    for q in range(4):
        # inject after everything (trailing injection)
        _, _, logical = z_syndromes([48], [DATA[q]])
        e = np.zeros(4, dtype=int)
        e[q] = 1
        assert np.array_equal(logical, (Lx @ e) % 2), q


def test_decoding_matrix_shape_and_probs():
    Hfull, probs = decoding_matrix_z(error_rate=0.01)
    assert Hfull.shape[0] == 4 + 2  # 4 syndrome rounds + k=2 logical rows
    n_classes = Hfull.shape[1]
    assert n_classes == len(probs) == 16
    # total probability mass = sum over the 52 enumerated faults
    specs = enumerate_z_faults()
    assert len(specs) == 52
    want = 0.01 * sum(f for _, _, f in specs)
    assert np.isclose(probs.sum(), want)


def test_decode_recovers_hand_placed_error():
    """End to end: the production OSD decodes example (a)'s syndrome to a
    correction whose logical action equals the hand-derived [1, 1]."""
    import jax.numpy as jnp
    from qldpc_tpu.models.builder import channel_llrs
    from qldpc_tpu.ops.osd import osd_batch
    raw, sparse, logical = z_syndromes([12], [DATA[0]])
    Hfull, probs = decoding_matrix_z(error_rate=0.01)
    HdecZ = Hfull[:4]
    llr = channel_llrs(probs)
    out = osd_batch(jnp.asarray(HdecZ), jnp.asarray(HdecZ.T, jnp.bfloat16),
                    jnp.asarray(sparse[None].astype(np.int8)),
                    jnp.asarray(np.broadcast_to(llr, (1, len(llr)))
                                .astype(np.float32)),
                    jnp.asarray(np.zeros((1, len(llr)), np.int8)),
                    K=len(llr), order=0)
    assert bool(out["valid"][0])
    sol = np.asarray(out["solution"][0])
    assert np.array_equal((Hfull[4:] @ sol) % 2, logical)
