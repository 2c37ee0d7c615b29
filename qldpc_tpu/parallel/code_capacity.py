"""Code-capacity Monte-Carlo decoding: iid errors on a raw parity-check
matrix, no syndrome-extraction circuit.

Covers the simplest benchmark tier (a Steane [[7,1,3]] or any CSS code under
iid bit-flip noise, decoded with batched min-sum BP + OSD) and doubles as
the calibration channel's Monte-Carlo counterpart. The circuit-level engine
is parallel/engine.py; this path shares all its device kernels.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models import gf2
from ..ops.bp import TannerGraph, alpha_schedule, decode_batch
from ..ops.osd import choose_K, osd_batch
from .engine import make_key
from .mesh import make_flag_gather, shard_rounds, shot_mesh


def run_code_capacity(
    H,
    error_rate: float,
    num_shots: int = 10000,
    L: Optional[np.ndarray] = None,
    maxIter: int = 50,
    osd_order: int = 0,
    alpha_mode: str = "dynamical",
    alpha=1.0,
    batch_size: int = 1024,
    base_seed: int = 0,
    mesh=None,
    use_pallas: Optional[bool] = None,
) -> Dict:
    """Estimate the block/logical error rate of a code under iid errors.

    Args:
      H: (m, n) parity-check matrix (0/1).
      error_rate: iid flip probability per bit.
      L: optional (k, n) logical-operator matrix. With L, a decoding failure
        is a residual error with nontrivial logical action; without, any
        miscorrection counts (block error rate).

    Returns dict with logical_error_rate, converged_rate, shots, shots/s.
    """
    H = (np.asarray(H) % 2).astype(np.uint8)
    m, n = H.shape
    graph = TannerGraph.from_dense(H)
    HT = jnp.asarray(H.T.astype(np.float32), dtype=jnp.bfloat16)
    Hj = jnp.asarray(H)
    prior_val = float(np.log((1 - error_rate) / error_rate))
    prior = jnp.full((n,), prior_val, jnp.float32)
    seq = jnp.asarray(alpha_schedule(alpha_mode, maxIter, alpha))
    K = choose_K(m, n)
    rank = gf2.rank_fast(H)
    basis_cols = jnp.asarray(gf2.column_basis(H))
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    L_j = None if L is None else jnp.asarray(
        (np.asarray(L) % 2).T.astype(np.float32), dtype=jnp.bfloat16)

    def round_fn(key):
        e = jax.random.uniform(key, (batch_size, n)) < error_rate
        syn = (jnp.dot(e.astype(jnp.bfloat16), HT,
                       preferred_element_type=jnp.float32)
               .astype(jnp.int32) & 1).astype(jnp.int8)
        bp = decode_batch(graph, syn, prior, seq, maxIter)
        osd = osd_batch(Hj, HT, syn, bp["values"], bp["hard"], K=K,
                        order=osd_order,
                        num_test=(osd_order + 10) if osd_order else 0,
                        use_pallas=use_pallas, rank=rank,
                        basis_cols=basis_cols)
        sol = jnp.where(bp["converged"][:, None], bp["hard"],
                        osd["solution"])
        resid = sol.astype(jnp.int32) ^ e.astype(jnp.int32)
        if L_j is None:
            fail = jnp.any(resid != 0, axis=1)
        else:
            act = (jnp.dot(resid.astype(jnp.bfloat16), L_j,
                           preferred_element_type=jnp.float32)
                   .astype(jnp.int32) & 1)
            fail = jnp.any(act != 0, axis=1)
        return dict(fail=fail, conv=bp["converged"])

    mesh = mesh if mesh is not None else (
        shot_mesh() if len(jax.devices()) > 1 else None)
    n_dev = len(mesh.devices.ravel()) if mesh is not None else 1
    sharded = shard_rounds(jax.jit(round_fn), mesh)
    gather = make_flag_gather(mesh)
    key = make_key(base_seed)
    fails = conv = shots = 0
    t0 = time.time()
    rnd = 0
    while shots < num_shots:
        out = sharded(jax.random.fold_in(key, rnd))
        rnd += 1
        take = min(batch_size * n_dev, num_shots - shots)
        if take < batch_size * n_dev:
            # truncated final round: per-shot prefix via replicated gather
            # (multi-host safe); full rounds use the psum scalar counts
            g = jax.device_get(gather(
                {k: out[k] for k in ("fail", "conv")}))
            fails += int(g["fail"][:take].sum())
            conv += int(g["conv"][:take].sum())
        else:
            counts = jax.device_get({k: out[k] for k in
                                     ("fail_count", "conv_count")})
            fails += int(counts["fail_count"])
            conv += int(counts["conv_count"])
        shots += take
    dt = time.time() - t0
    return dict(logical_error_rate=fails / shots,
                converged_rate=conv / shots, num_shots=shots,
                shots_per_sec=shots / dt)


def steane_code():
    """The [[7,1,3]] Steane code (Hx = Hz = Hamming(7,4) checks)."""
    Hs = np.array([[0, 0, 0, 1, 1, 1, 1],
                   [0, 1, 1, 0, 0, 1, 1],
                   [1, 0, 1, 0, 1, 0, 1]], dtype=np.uint8)
    Lx, Lz = gf2.css_logical_ops(Hs, Hs)
    return Hs, Hs.copy(), Lx, Lz
