"""Utils tier: cache format compatibility, plotting, results persistence."""
import os

import numpy as np
import pytest

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.utils.caching import (compute_cache_key, load_matrices,
                                     save_matrices)
from qldpc_tpu.utils.plotting import (plot_alpha_comparison,
                                      plot_alpha_linearity,
                                      plot_simulation_results)
from qldpc_tpu.utils.results import (collect_calibration, load_results,
                                     make_run_dir, save_results)

from conftest import requires_reference


@pytest.fixture(scope="module")
def matrices72():
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=2)
    return build_decoding_matrices(circ, code.Lx, code.Lz, 0.01)


def test_cache_roundtrip(tmp_path, matrices72):
    code = get_code("[[72, 12, 6]]")
    key = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, 2, 0.01)
    save_matrices(str(tmp_path), key, matrices72)
    loaded = load_matrices(str(tmp_path), key)
    assert loaded is not None
    for k, v in matrices72.items():
        if isinstance(v, np.ndarray):
            assert np.array_equal(loaded[k], v), k
        else:
            assert loaded[k] == v, k
    assert load_matrices(str(tmp_path), "deadbeef00000000") is None


@requires_reference
def test_reference_cache_files_load(ref_code_npz):
    """A cache file written by the REFERENCE loads through our loader and
    is accepted by the engine's metadata backfill."""
    import glob
    ref = ref_code_npz("[[72, 12, 6]]")
    key = compute_cache_key(ref["Hx"], ref["Hz"], ref["Lx"], ref["Lz"],
                            6, 0.006)
    loaded = load_matrices("/root/reference/matrix_cache", key)
    assert loaded is not None
    assert loaded["HdecZ"].shape == (288, 2233)
    assert loaded["first_logical_rowZ"] == 288


def test_cache_key_matches_reference_derivation():
    code = get_code("[[72, 12, 6]]")
    k1 = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, 6, 0.006)
    k2 = compute_cache_key(code.Hx, code.Hz, code.Lx, code.Lz, 6, 0.0061)
    assert len(k1) == 16 and k1 != k2


def test_plots_and_results_roundtrip(tmp_path):
    results = {
        "72": {
            0.006: {"logical_error_rate": 0.5, "num_trials": 60,
                    "logical_errors": 30,
                    "alpha_values_z": [0.5, 0.7, 0.8],
                    "alpha_values_x": [0.55, 0.72, 0.81],
                    "alpha_r2_values_z": [0.9, 0.92, 0.93],
                    "alpha_r2_values_x": [0.9, 0.9, 0.9],
                    "beta_z": -0.4, "beta_x": -0.5},
            0.004: {"logical_error_rate": 0.17, "num_trials": 1000,
                    "logical_errors": 170},
        }
    }
    p1 = plot_simulation_results(results, str(tmp_path / "ler.png"))
    p2 = plot_alpha_comparison(results, str(tmp_path / "cmp.png"))
    r2 = plot_alpha_linearity(results, str(tmp_path / "lin.png"))
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0
    assert "72" in r2 and 0.006 in r2["72"]

    run_dir, est_dir = make_run_dir(str(tmp_path / "out"))
    assert os.path.isdir(est_dir)
    path = save_results(run_dir, results, r2)
    loaded = load_results(path)
    assert loaded["results"]["72"][0.006]["logical_errors"] == 30
    alpha_values, beta_values, est = collect_calibration(results)
    assert alpha_values["72"][0.006]["z"] == [0.5, 0.7, 0.8]
    assert beta_values["72"][0.006]["x"] == -0.5
