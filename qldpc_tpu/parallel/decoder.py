"""Public batched decode API for externally-supplied syndromes.

``run_simulation`` samples its own noise; real deployments have measured
syndromes. ``BatchDecoder`` exposes the exact production decode path
(batched BP + chunked OSD + logical readout, engine._decode_logicals) for
syndrome streams: build once per (code, p, cycles) — the decoding matrices
come from the cache or the builder — then call ``decode`` on (N, num_syn)
sparsified syndrome batches in either basis.

The reference has no counterpart (its decoding is reachable only through
its Monte-Carlo trial loop); the syndrome/row convention is identical to
the reference's decoding matrices, so reference-sampled syndromes decode
bit-identically (verified trial-for-trial by scripts/ler_oracle.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.bb import make_code
from ..models.builder import build_decoding_matrices
from ..models.circuit import SyndromeCircuit
from ..ops.bp import alpha_schedule
from .engine import (BasisDecoder, _decode_logicals, _make_basis,
                     ensure_sampler_metadata)


class BatchDecoder:
    """Batched BP+OSD decoder over a fixed code / error-rate configuration.

    Args mirror ``run_simulation`` (reference engine.py:193-203) minus the
    Monte-Carlo controls. ``alpha`` follows the alpha_mode: None for
    "dynamical", a scalar for "alvarado", a per-iteration sequence for
    "alvarado-autoregressive" (e.g. from ops.calibrate).
    """

    def __init__(self, Hx, Hz, Lx, Lz, error_rate, num_cycles=12,
                 maxIter=20, osd_order=2, alpha_mode="dynamical", alpha=None,
                 precomputed_matrices: Optional[Dict] = None,
                 damping: float = 1.0, clip_llr: float = 20.0,
                 use_pallas: Optional[bool] = None, msg_dtype=None,
                 bp_variant: str = "minsum", **bb_params):
        code = make_code(Hx, Hz, Lx, Lz, **bb_params)
        self.circ = SyndromeCircuit(code, num_cycles=num_cycles)
        matrices = precomputed_matrices or build_decoding_matrices(
            self.circ, code.Lx, code.Lz, error_rate)
        matrices = ensure_sampler_metadata(matrices, self.circ, code.Lx,
                                           code.Lz, error_rate)
        seq = alpha_schedule(alpha_mode, maxIter,
                             1.0 if alpha is None else alpha)
        self.maxIter = maxIter
        self.osd_order = osd_order
        self.damping = damping
        self.clip_llr = clip_llr
        self.bp_variant = bp_variant
        self.use_pallas = (jax.default_backend() != "cpu"
                           if use_pallas is None else use_pallas)
        self.msg_dtype = msg_dtype or (
            jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32)
        self.bases = {
            "Z": _make_basis(self.circ, matrices, "Z", seq,
                             osd_order=osd_order),
            "X": _make_basis(self.circ, matrices, "X", seq,
                             osd_order=osd_order),
        }
        self.num_syn = {b: self.bases[b].H.shape[0] for b in "ZX"}
        self._jitted = jax.jit(
            lambda s, d: _decode_logicals(
                s, d, self.maxIter, self.osd_order, self.damping,
                self.clip_llr, self.use_pallas, self.msg_dtype,
                self.bp_variant))

    def decode(self, syndrome, basis: str = "Z",
               batch_size: int = 256) -> Dict[str, np.ndarray]:
        """Decode (N, num_syn) sparsified syndromes.

        Returns dict: ``logicals`` (N, k) int32 — the decoded correction's
        logical action (compare against the true logical effect to score a
        logical error, reference engine.py:118-121), ``converged`` (N,)
        bool (BP converged; False means the OSD fallback produced the
        answer), ``rank_deficient`` (N,) bool.
        """
        b = basis.upper()
        dec = self.bases[b]
        syn = np.asarray(syndrome, dtype=np.uint8)
        if syn.ndim != 2 or syn.shape[1] != self.num_syn[b]:
            raise ValueError(
                f"expected (N, {self.num_syn[b]}) {b}-basis syndromes, "
                f"got {syn.shape}")
        N = syn.shape[0]
        if N == 0:
            k = self.bases[b].H_logical.shape[1]
            return dict(logicals=np.zeros((0, k), np.int32),
                        converged=np.zeros(0, bool),
                        rank_deficient=np.zeros(0, bool))
        B = min(batch_size, max(1, N))
        pad = (-N) % B
        if pad:
            syn = np.concatenate([syn, np.zeros((pad, syn.shape[1]),
                                                np.uint8)])
        logs, convs, rdefs = [], [], []
        for c0 in range(0, len(syn), B):
            lg, cv, rd = self._jitted(jnp.asarray(syn[c0:c0 + B]), dec)
            logs.append(np.asarray(lg))
            convs.append(np.asarray(cv))
            rdefs.append(np.asarray(rd))
        return dict(logicals=np.concatenate(logs)[:N],
                    converged=np.concatenate(convs)[:N],
                    rank_deficient=np.concatenate(rdefs)[:N])
