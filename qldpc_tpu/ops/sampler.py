"""Vectorized circuit-level Pauli sampling + linear-map syndrome extraction.

TPU-first trial path: because Pauli-frame propagation is linear over GF(2),
a Monte-Carlo trial never walks the circuit on device. The decoding-matrix
builder precomputes, for every elementary fault location, its augmented
signature (sparsified syndrome ++ logical effect). A batch of trials is then:

    1. sample per-gate-location randoms (uniform + Pauli category) with
       jax.random — B x n_locs, fully vectorized;
    2. derive per-elementary-location fault bits with small lookup tables
       (Y errors contribute to both the Z- and X-frames, two-qubit Paulis
       decompose into control/target legs — correlations preserved exactly);
    3. augmented = fault_bits @ A_loc^T mod 2 — one bf16 MXU matmul with
       f32 accumulation (exact: counts are small integers).

This replaces the reference's per-trial noisy-circuit interpreter
(reference src/noise/kernels.py:176-353 error insertion +
src/noise/kernels.py:13-172 opcode-walk propagation +
src/noise/kernels.py:356-380 sparsification) with sampling whose joint error
distribution is identical: error before Meas / after Prep, IDLE uniform
X/Y/Z at p (reference kernels.py:260-272), CNOT uniform over the 15
two-qubit Paulis at p (reference kernels.py:274-344).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.builder import ROLE_CTRL, ROLE_SINGLE, ROLE_TGT
from ..models.circuit import LOC_IDLE, SyndromeCircuit

# --- two-qubit Pauli decomposition tables -------------------------------
# The 15 non-identity two-qubit Paulis, indexed as the reference samples
# them (reference src/noise/model.py:46-53): 0-2 = X/Y/Z on control,
# 3-5 = X/Y/Z on target, 6-8 = XX/YY/ZZ, 9-14 = XY,YX,YZ,ZY,XZ,ZX.
# A leg carries a Z-frame flip iff its Pauli is Y or Z, an X-frame flip iff
# its Pauli is X or Y.
_CTRL_PAULI = "XYZIIIXYZXYYZXZ"  # control-leg Pauli per category
_TGT_PAULI = "IIIXYZXYZYXZYZX"  # target-leg Pauli per category

Z_CTRL_LUT = np.array([c in "YZ" for c in _CTRL_PAULI], dtype=np.bool_)
Z_TGT_LUT = np.array([c in "YZ" for c in _TGT_PAULI], dtype=np.bool_)
X_CTRL_LUT = np.array([c in "XY" for c in _CTRL_PAULI], dtype=np.bool_)
X_TGT_LUT = np.array([c in "XY" for c in _TGT_PAULI], dtype=np.bool_)

# selector codes for per-elementary-location bit derivation
SEL_CONST = 0   # meas/prep location: error => frame flip
SEL_IDLE = 1    # idle: flip iff sampled single-qubit Pauli has the component
SEL_CTRL = 2    # CNOT control leg
SEL_TGT = 3     # CNOT target leg


@dataclasses.dataclass(frozen=True)
class TrialMaps:
    """Device-resident static data for the linear-map trial path (one basis)."""

    sel: jax.Array          # (L,) int32 selector per elementary location
    gate_loc: jax.Array     # (L,) int32 gate-location index
    A_loc: jax.Array        # (L, R) bf16 per-location augmented signature
    num_syn: int            # syndrome rows (first num_syn rows of R axis)
    k: int                  # logical rows (last k rows)

    @property
    def num_locations(self) -> int:
        return self.A_loc.shape[0]


def make_trial_maps(circ: SyndromeCircuit, matrices: dict, basis: str
                    ) -> TrialMaps:
    """Assemble TrialMaps from builder output for basis 'Z' or 'X'."""
    b = basis.lower()
    role = matrices[f"{b}_loc_role"]
    gate_loc = matrices[f"{b}_loc_gate_loc"]
    cls = matrices[f"{b}_loc_class"]
    full = matrices["HZ_full"] if b == "z" else matrices["HX_full"]
    num_syn = matrices[f"first_logical_row{basis.upper()}"]
    k = matrices["k"]
    kind = circ.loc_kind[gate_loc]
    sel = np.where(role == ROLE_CTRL, SEL_CTRL,
                   np.where(role == ROLE_TGT, SEL_TGT,
                            np.where(kind == LOC_IDLE, SEL_IDLE, SEL_CONST)))
    assert (role[sel == SEL_CONST] == ROLE_SINGLE).all()
    A_loc = full[:, cls].T.astype(np.float32)  # (L, R)
    return TrialMaps(
        sel=jnp.asarray(sel, dtype=jnp.int32),
        gate_loc=jnp.asarray(gate_loc, dtype=jnp.int32),
        A_loc=jnp.asarray(A_loc, dtype=jnp.bfloat16),
        num_syn=int(num_syn), k=int(k),
    )


def sample_gate_randoms(key: jax.Array, batch: int, n_locs: int,
                        error_rate) -> tuple:
    """Per-gate-location randoms for a batch of trials.

    Returns (err, pauli, cat2): err (B, n_locs) bool — an error occurred;
    pauli (B, n_locs) int32 in [0,3) — X/Y/Z choice for IDLE locations;
    cat2 (B, n_locs) int32 in [0,15) — two-qubit Pauli category for CNOTs.

    Draws two raw 32-bit words per location: one 32-bit uniform for the
    error indicator, one split 16/16 for the two categoricals via modular
    reduction (bias <= 3/2^16 relative — orders of magnitude below any
    Monte-Carlo error bar; exact rejection sampling is not worth the extra
    device passes).
    """
    ke, kc = jax.random.split(key, 2)
    w = jax.random.bits(ke, (batch, n_locs), dtype=jnp.uint32)
    thresh = jnp.uint32(jnp.clip(error_rate * 4294967296.0, 0, 4294967295.0))
    err = w < thresh
    c = jax.random.bits(kc, (batch, n_locs), dtype=jnp.uint32)
    pauli = ((c & jnp.uint32(0xFFFF)) % 3).astype(jnp.int32)
    cat2 = ((c >> 16) % 15).astype(jnp.int32)
    return err, pauli, cat2


def fault_bits(err, pauli, cat2, maps: TrialMaps, basis: str) -> jax.Array:
    """(L, B) bool fault-bit matrix for one frame basis.

    Location-major layout: the per-location expansion gathers along the
    major axis of the transposed random draws (minor-axis gathers are slow
    lane shuffles on TPU), and the signature matmul consumes (L, B)
    directly."""
    gl = maps.gate_loc
    e = err.T[gl]                   # (L, B)
    p = pauli.T[gl]
    t = cat2.T[gl]
    if basis.upper() == "Z":
        idle_hit = p != 0           # Y or Z has a Z component
        ctrl_lut, tgt_lut = Z_CTRL_LUT, Z_TGT_LUT
    else:
        idle_hit = p != 2           # X or Y has an X component
        ctrl_lut, tgt_lut = X_CTRL_LUT, X_TGT_LUT
    ctrl_hit = jnp.asarray(ctrl_lut)[t]
    tgt_hit = jnp.asarray(tgt_lut)[t]
    sel = maps.sel[:, None]
    hit = jnp.where(sel == SEL_CONST, True,
                    jnp.where(sel == SEL_IDLE, idle_hit,
                              jnp.where(sel == SEL_CTRL, ctrl_hit, tgt_hit)))
    return e & hit


def augmented_bits(bits_T: jax.Array, maps: TrialMaps) -> jax.Array:
    """(B, R) int8 augmented signature = (A_loc^T @ bits) mod 2 (MXU)."""
    counts = jnp.dot(maps.A_loc.T, bits_T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)      # (R, B)
    return (counts.astype(jnp.int32) & 1).astype(jnp.int8).T


@partial(jax.jit, static_argnames=("batch", "n_locs"))
def trial_batch(key: jax.Array, error_rate, maps_z: TrialMaps,
                maps_x: TrialMaps, n_locs: int, batch: int):
    """One batch of Monte-Carlo trials up to (but excluding) decoding.

    Returns dict with per-shot sparse syndromes and true logical effects:
    syndrome_z/true_z from the Z-frame (decoded against HdecZ), and x
    counterparts. Correlations between the two frames (Y errors, two-qubit
    Paulis) are exact because both derive from the same gate randoms.
    """
    err, pauli, cat2 = sample_gate_randoms(key, batch, n_locs, error_rate)
    out = {}
    for basis, maps in (("Z", maps_z), ("X", maps_x)):
        bits = fault_bits(err, pauli, cat2, maps, basis)
        aug = augmented_bits(bits, maps)
        out[f"syndrome_{basis.lower()}"] = aug[:, :maps.num_syn]
        out[f"true_{basis.lower()}"] = aug[:, maps.num_syn:]
    return out


jax.tree_util.register_pytree_node(
    TrialMaps,
    lambda m: ((m.sel, m.gate_loc, m.A_loc), (m.num_syn, m.k)),
    lambda aux, ch: TrialMaps(ch[0], ch[1], ch[2], aux[0], aux[1]),
)
