"""Circuit + decoding-matrix builder: structure checks and goldens.

The golden tests compare the vectorized bit-packed builder byte-for-byte
against the reference's archived matrix_cache npz files (SURVEY.md §7 step 2).
"""
import numpy as np
import pytest

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.models.builder import ROLE_BOTH, channel_llrs
from qldpc_tpu.models.circuit import OP_CNOT, OP_IDLE, OP_MEAS_X, OP_MEAS_Z

from conftest import requires_reference


@pytest.fixture(scope="module")
def circ72():
    return SyndromeCircuit(get_code("[[72, 12, 6]]"), num_cycles=6)


def test_circuit_structure(circ72):
    c = circ72
    # depth-8 cycle for [[72]]: 36 of each prep/meas, 432 CNOT, 144 IDLE
    assert c.cycle_len == 720
    assert (c.cycle_ops == OP_CNOT).sum() == 432
    assert (c.cycle_ops == OP_IDLE).sum() == 144
    assert (c.cycle_ops == OP_MEAS_X).sum() == 36
    assert (c.cycle_ops == OP_MEAS_Z).sum() == 36
    assert c.num_error_locs == 6 * 720  # every cycle op is an error location
    assert c.num_syndrome_x == 36 * (6 + 2)
    # every X check measured once per cycle, in check order
    assert np.array_equal(c.x_syn_positions[:, 0], np.arange(36))


def test_builder_shapes_and_sampler_metadata(circ72):
    code = get_code("[[72, 12, 6]]")
    M = build_decoding_matrices(circ72, code.Lx, code.Lz, 0.006)
    num_syn = 36 * 8
    assert M["HdecZ"].shape[0] == num_syn
    assert M["HZ_full"].shape[0] == num_syn + 12
    # elementary sampled locations: meas + prep + idle + 2 per CNOT, per basis
    n_elem = (36 + 36 + 144 + 2 * 432) * 6
    assert M["z_loc_class"].shape == (n_elem,)
    assert M["x_loc_class"].shape == (n_elem,)
    assert (M["z_loc_role"] != ROLE_BOTH).all()
    assert M["z_loc_class"].max() < M["HdecZ"].shape[1]
    # class probabilities: sum over classes == sum over locations
    per_cycle = 36 + 36 + 144 * 2 / 3 + 432 * 3 * 4 / 15
    assert np.isclose(M["channel_probsZ"].sum(), 0.006 * per_cycle * 6)


def test_channel_llrs_handles_extreme_probs():
    p = np.array([1e-4, 0.5, 0.9, 1.0, 4.1])
    llr = channel_llrs(p)
    assert np.isfinite(llr).all()
    assert llr[0] > 0 and llr[2] < 0
    # p > 1 -> log of negative -> NaN -> 0 (reference engine.py:211)
    assert llr[4] == 0.0


@requires_reference
@pytest.mark.parametrize("name,cycles,p", [
    ("[[72, 12, 6]]", 6, 0.006),
    ("[[90, 8, 10]]", 10, 0.004),
    ("[[108, 8, 10]]", 10, 0.004),
    ("[[144, 12, 12]]", 12, 0.004),
    pytest.param("[[288, 12, 18]]", 18, 0.0035, marks=pytest.mark.slow),
])
def test_golden_decoding_matrices(name, cycles, p, ref_code_npz,
                                  ref_matrix_cache):
    ref = ref_code_npz(name)
    golden = ref_matrix_cache(ref["Hx"], ref["Hz"], ref["Lx"], ref["Lz"],
                              cycles, p)
    if golden is None:
        pytest.skip("no golden for this config")
    circ = SyndromeCircuit(get_code(name), num_cycles=cycles)
    M = build_decoding_matrices(circ, ref["Lx"], ref["Lz"], p)
    for key in ["HdecZ", "HdecX", "HZ_full", "HX_full"]:
        assert np.array_equal(M[key], golden[key]), key
    for key in ["channel_probsZ", "channel_probsX"]:
        assert np.allclose(M[key], golden[key], atol=1e-12), key
