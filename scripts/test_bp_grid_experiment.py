"""Cycle-periodic BP layout vs the generic padded-CSR decoder.

decode_batch_grid must be bit-identical to decode_batch in float32 on CPU
(same algebra, same summation order). On TPU, reduction reassociation can
introduce ulp-level differences; perf there is traffic-bound so the grid
layout is currently experimental/unwired (see bp_grid.py docstring).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax.numpy as jnp

from qldpc_tpu import (SyndromeCircuit, build_decoding_matrices,
                       channel_llrs, get_code)
from qldpc_tpu.ops.bp import TannerGraph, alpha_schedule, decode_batch
from bp_grid_experiment import PeriodicGraph, decode_batch_grid


def test_grid_detection_and_bitexact_equivalence():
    code = get_code("[[72, 12, 6]]")
    cycles = 4
    circ = SyndromeCircuit(code, num_cycles=cycles)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.005)
    for basis in ("Z", "X"):
        H = (M[f"Hdec{basis}"] != 0).astype(np.uint8)
        prior = channel_llrs(M[f"channel_probs{basis}"])
        n2 = H.shape[0] // (cycles + 2)
        g = PeriodicGraph.try_from_dense(H, n2, prior)
        assert g is not None, "BB circuit graphs must be cycle-periodic"
        assert g.T == cycles + 2
        # every real column lands in exactly one grid slot
        nz_cols = int((np.asarray(M[f"Hdec{basis}"]) != 0).any(0).sum())
        assert int((~np.asarray(g.residual)).sum()) == nz_cols

        graph = TannerGraph.from_dense(H)
        rng = np.random.default_rng(7)
        B = 32
        errs = (rng.random((B, H.shape[1]))
                < M[f"channel_probs{basis}"]).astype(np.int8)
        syn = (errs @ H.T) % 2
        seq = jnp.asarray(alpha_schedule("dynamical", 12))
        pr = jnp.asarray(prior, jnp.float32)
        a = decode_batch(graph, jnp.asarray(syn), pr, seq, 12)
        b = decode_batch_grid(g, jnp.asarray(syn), pr, seq, 12)
        for k in ("hard", "converged", "iterations"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k
        assert np.array_equal(np.asarray(a["values"]),
                              np.asarray(b["values"]))


def test_grid_rejects_aperiodic():
    rng = np.random.default_rng(0)
    H = (rng.random((24, 60)) < 0.15).astype(np.uint8)
    prior = np.ones(60, np.float32)
    # random matrices have ~unique column patterns -> grid is rejected as
    # too sparse (or structurally inconsistent), never built wrong
    g = PeriodicGraph.try_from_dense(H, 6, prior)
    if g is not None:  # if accepted, it must still decode identically
        graph = TannerGraph.from_dense(H)
        syn = (rng.integers(0, 2, (4, 24))).astype(np.int8)
        seq = jnp.asarray(alpha_schedule("dynamical", 5))
        a = decode_batch(graph, jnp.asarray(syn),
                         jnp.asarray(prior), seq, 5)
        b = decode_batch_grid(g, jnp.asarray(syn),
                              jnp.asarray(prior), seq, 5)
        assert np.array_equal(np.asarray(a["hard"]), np.asarray(b["hard"]))
