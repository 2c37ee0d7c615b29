"""Code-capacity path: Steane code sanity (known pseudo-threshold behavior)."""
import numpy as np

from qldpc_tpu.parallel.code_capacity import run_code_capacity, steane_code


def test_steane_low_p_corrects_single_errors():
    Hx, Hz, Lx, Lz = steane_code()
    assert Lx.shape == (1, 7)
    res = run_code_capacity(Hz, 0.01, num_shots=4000, L=Lx, maxIter=30,
                            osd_order=1, batch_size=500, base_seed=1)
    # distance-3: LER ~ 21 p^2 ~ 2e-3 at p=0.01; well below p
    assert res["logical_error_rate"] < 0.01
    assert res["converged_rate"] > 0.9


def test_block_error_without_logicals():
    Hx, Hz, Lx, Lz = steane_code()
    res = run_code_capacity(Hz, 0.02, num_shots=2000, maxIter=20,
                            batch_size=250, base_seed=2)
    # block error rate (any miscorrection) >= logical error rate
    res_l = run_code_capacity(Hz, 0.02, num_shots=2000, L=Lx, maxIter=20,
                              batch_size=250, base_seed=2)
    assert res["logical_error_rate"] >= res_l["logical_error_rate"]
