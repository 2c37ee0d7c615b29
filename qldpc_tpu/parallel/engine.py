"""Monte-Carlo logical-error-rate engine: batched, jitted, mesh-sharded.

API-compatible superset of the reference's orchestrator
(``run_simulation``, reference src/simulation/engine.py:193-488): same
signature and result dict, but one decode round = thousands of shots as a
single jitted SPMD computation (sample -> syndrome matmul -> batched BP ->
batched OSD for failed shots -> logical comparison) instead of one process
per trial. Adaptive stopping reproduces the reference's sequential rule
exactly: per-shot error flags stream back in global shot order and the run
truncates at the precise trial where the target error count is reached.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.bb import make_code
from ..models import gf2
from ..models.builder import build_decoding_matrices, channel_llrs
from ..models.circuit import SyndromeCircuit
from ..ops import calibrate
from ..ops.bp import (TannerGraph, alpha_schedule, decode_batch,
                      decode_batch_tanh)
from ..ops.bp_lift import (LiftedGraph, decode_batch_lift,
                           decode_batch_lift_layered)
from ..ops.bp_lift_pallas import decode_batch_lift_pallas, viable_block_b
from ..ops.osd import choose_K, osd_batch
from ..ops.sampler import (TrialMaps, augmented_bits, fault_bits,
                           make_trial_maps, sample_gate_randoms)
from .mesh import make_flag_gather, replicate, shard_rounds, shot_mesh

logger = logging.getLogger(__name__)


def _pallas_bp_viable(lifted, B: int, schedule: str = "flooding") -> bool:
    """True when the VMEM-resident BP kernel has a Mosaic-legal batch block
    whose state fits VMEM for this graph, batch, and schedule. Since the
    round-4 packed-mask diet [[288,12,18]] fits the FLOODING kernel
    (~100MB single-step; B > 128 runs 128-wide blocks under lax.map); the
    layered schedule's register spills (+32.5MB measured) keep it
    [[144]]-scale only. Rejected graphs take the XLA lift path."""
    return viable_block_b(lifted, B=B, schedule=schedule) is not None


def make_key(seed: int, impl: str = "rbg") -> jax.Array:
    """PRNG key for the Monte-Carlo streams. Default 'rbg' (hardware
    counter-based generator): several-fold faster than threefry on TPU for
    the ~1e8 random words a large round draws, with quality that is ample
    for Monte-Carlo sampling. Pass impl='threefry2x32' for the strict
    default stream."""
    try:
        return jax.random.key(seed, impl=impl)
    except (TypeError, ValueError):  # pragma: no cover - older JAX
        return jax.random.key(seed)

_SAMPLER_KEYS = ("z_loc_gate_loc", "z_loc_role", "z_loc_class",
                 "x_loc_gate_loc", "x_loc_role", "x_loc_class")


def ensure_sampler_metadata(matrices: Dict, circ: SyndromeCircuit, Lx, Lz,
                            error_rate: float) -> Dict:
    """Reference-format matrix dicts (e.g. loaded from a reference cache)
    lack the per-location sampler tables; rebuild them and cross-check the
    decoding matrices agree before merging."""
    if all(k in matrices for k in _SAMPLER_KEYS):
        return matrices
    rebuilt = build_decoding_matrices(circ, Lx, Lz, error_rate)
    for key in ("HdecZ", "HdecX"):
        if key in matrices and not np.array_equal(
                np.asarray(matrices[key]) % 2, rebuilt[key] % 2):
            raise ValueError(
                f"precomputed {key} disagrees with this circuit's fault "
                "enumeration — wrong code/cycles/schedule for these matrices?")
    merged = dict(rebuilt)
    merged.update({k: v for k, v in matrices.items() if k not in merged})
    return merged


@dataclasses.dataclass(frozen=True)
class BasisDecoder:
    """Static per-basis decode bundle (device arrays)."""

    maps: TrialMaps
    graph: TannerGraph
    lifted: object        # LiftedGraph | None — circulant-structured BP
                          # layout (ops/bp_lift.py), used when the decoding
                          # graph is an exact Z_ell x Z_m lift
    H: jax.Array          # (m, n) uint8 decoding matrix
    HT_bf16: jax.Array    # (n, m)
    H_logical: jax.Array  # (n, k) bf16 — logical action of each fault class
    logical_pack: jax.Array  # (n,) int32 — the same action bit-packed
    prior: jax.Array      # (n,) f32
    alpha_seq: jax.Array  # (maxIter,) f32
    basis_cols: jax.Array  # (rank,) int32 — fixed rank-completing basis
    K: int
    num_test: int
    rank: int             # GF(2) rank of H (OSD early-exit target)


def _make_basis(circ, matrices, basis: str, alpha_seq, clip_channel=50.0,
                osd_margin: int = 128, osd_order: int = 0) -> BasisDecoder:
    """osd_margin: reliability-ordered column budget beyond the GF(2) rank
    for the OSD elimination (K = m + margin). 128 is ~25% faster than the
    original 512 with zero observed rank deficiency on the BB workloads;
    deficiency is monitored per shot (``rank_deficient``) and surfaced as
    an engine warning, never silent."""
    b = basis.upper()
    H = (np.asarray(matrices[f"Hdec{b}"]) != 0).astype(np.uint8)
    probs = matrices[f"channel_probs{b}"]
    full = np.asarray(matrices[f"H{b}_full"])
    k = matrices["k"]
    first = matrices[f"first_logical_row{b}"]
    H_logical = (full[first:first + k] != 0).astype(np.float32)  # (k, n)
    prior_np = channel_llrs(probs, clip_channel)
    # circulant-lift BP layout (needs the BB polynomial dims; raw CSS codes
    # without them fall back to the generic padded-CSR layout)
    ell = getattr(circ.code, "ell", None)
    mmm = getattr(circ.code, "m", None)
    lifted = (LiftedGraph.try_from_dense(H, ell, mmm, prior_np)
              if ell and mmm else None)
    return BasisDecoder(
        maps=make_trial_maps(circ, matrices, b),
        graph=TannerGraph.from_dense(H),
        lifted=lifted,
        H=jnp.asarray(H),
        HT_bf16=jnp.asarray(H.T.astype(np.float32), dtype=jnp.bfloat16),
        H_logical=jnp.asarray(H_logical.T, dtype=jnp.bfloat16),  # (n, k)
        logical_pack=jnp.asarray(
            (H_logical.astype(np.int64)
             << np.arange(k, dtype=np.int64)[:, None]).sum(0).astype(np.int32)),
        prior=jnp.asarray(prior_np, dtype=jnp.float32),
        alpha_seq=jnp.asarray(alpha_seq, dtype=jnp.float32),
        basis_cols=jnp.asarray(gf2.column_basis(H)),
        K=choose_K(*H.shape, margin=osd_margin),
        num_test=(osd_order + 10) if osd_order > 0 else 0,
        rank=gf2.rank_fast(H),
    )


jax.tree_util.register_pytree_node(
    BasisDecoder,
    lambda d: ((d.maps, d.graph, d.lifted, d.H, d.HT_bf16, d.H_logical,
                d.logical_pack, d.prior, d.alpha_seq, d.basis_cols),
               (d.K, d.num_test, d.rank)),
    lambda aux, ch: BasisDecoder(*ch, *aux),
)


def _bp_one_basis(syndrome, dec: BasisDecoder, maxIter: int, damping: float,
                  clip_llr: float, use_pallas: bool = False,
                  msg_dtype=jnp.float32, bp_variant: str = "minsum"):
    """BP only — the variant/kernel dispatch half of _decode_logicals.

    Returns the BP result dict (values (B, n) f32, hard (B, n) int8,
    converged (B,) bool).

    bp_variant="tanh" selects the true-BP tanh decoder (reference
    performBeliefPropagationFast, dense.py:75-96) instead of normalized
    min-sum; alpha/damping/clip_llr are ignored in that variant, matching
    the reference function's signature. bp_variant="layered" selects the
    beyond-reference time-layered (serial) min-sum schedule
    (ops/bp_lift.decode_batch_lift_layered): ~10-12 points more shots
    converge at equal maxIter on the BB workloads, starving the expensive
    OSD fallback; it requires a lifted graph and damping == 1 (non-lifted
    graphs fall back to flooding with a warning)."""
    B = syndrome.shape[0]
    if bp_variant == "tanh":
        bp = decode_batch_tanh(dec.graph, syndrome, dec.prior, maxIter)
    elif bp_variant == "layered" and dec.lifted is not None \
            and damping == 1.0:
        if use_pallas and _pallas_bp_viable(dec.lifted, B, "layered"):
            bp = decode_batch_lift_pallas(
                dec.lifted, syndrome, dec.prior, dec.alpha_seq, maxIter,
                clip_llr=clip_llr, msg_dtype=jnp.float32, schedule="layered")
        else:
            bp = decode_batch_lift_layered(
                dec.lifted, syndrome, dec.prior, dec.alpha_seq, maxIter,
                clip_llr=clip_llr, msg_dtype=jnp.float32)
    elif dec.lifted is not None and use_pallas and damping == 1.0 \
            and _pallas_bp_viable(dec.lifted, B):
        # VMEM-resident kernel: entire BP state on-chip for all iterations.
        # Messages stay float32 in-kernel: Mosaic miscompiles bf16 in this
        # kernel's composition (verified elementwise-correct in isolation,
        # wrong composed — see bp_lift_pallas.py docstring), and the
        # VMEM-resident iteration is compute-bound, so bf16 buys nothing
        # (measured 36.5ms vs f32 34.5ms on [[144]] B=512).
        bp = decode_batch_lift_pallas(dec.lifted, syndrome, dec.prior,
                                      dec.alpha_seq, maxIter,
                                      clip_llr=clip_llr,
                                      msg_dtype=jnp.float32)
    elif dec.lifted is not None:
        bp = decode_batch_lift(dec.lifted, syndrome, dec.prior,
                               dec.alpha_seq, maxIter, damping=damping,
                               clip_llr=clip_llr, msg_dtype=msg_dtype)
    else:
        bp = decode_batch(dec.graph, syndrome, dec.prior, dec.alpha_seq,
                          maxIter, damping=damping, clip_llr=clip_llr,
                          msg_dtype=msg_dtype)
    return bp


def _osd_fallback(syndrome, values, hard, conv, dec: BasisDecoder,
                  osd_order: int, use_pallas: bool, chunk: int):
    """OSD for the BP-failed shots of a (possibly pooled) batch.

    Returns (delta (B,) int32 packed logical delta of the OSD correction
    relative to the BP hard decision, rank_deficient (B,) bool).

    OSD applies only to BP-failed shots (reference engine.py:96-97). Under
    SPMD the batch is sorted unconverged-first and OSD runs chunk-wise, each
    chunk wrapped in lax.cond so fully-converged chunks cost nothing — the
    expensive elimination is paid only for ~the unconverged fraction.

    Per-shot outputs are independent of how shots are grouped into chunks:
    the elimination's validity early exit and the cond gating change COST
    only, never a consumed output bit (tests/test_osd.py pins this). That
    grouping-independence is what licenses cross-round compaction — pooling
    the shots of several fused rounds into one sorted chunk sequence so
    elimination cost tracks the POOLED failure count instead of each
    round's own worst chunk quantization (make_pooled_round_fn)."""
    B = syndrome.shape[0]
    # Sort unconverged-first AND by BP-residual weight within unconverged:
    # the OSD elimination's validity exit stops a whole shot-block at the
    # depth its HARDEST shot needs, so grouping shots of similar difficulty
    # lets easy blocks exit early (total scan ~ B x mean exit depth instead
    # of B x E[max over a mixed block]). The weight of syndrome ^ H@hard is
    # a strong proxy for exit depth and costs one bf16 matmul.
    res_wt = jnp.sum(
        syndrome.astype(jnp.int32)
        ^ (jnp.dot(hard.astype(jnp.bfloat16), dec.HT_bf16,
                   preferred_element_type=jnp.float32).astype(jnp.int32) & 1),
        axis=1)
    m_checks = syndrome.shape[1]
    order = jnp.argsort(jnp.where(conv, m_checks + 1, res_wt))
    syn_s = jnp.take(syndrome, order, axis=0)
    vals_s = jnp.take(values, order, axis=0)
    hard_s = jnp.take(hard, order, axis=0)
    conv_s = jnp.take(conv, order, axis=0)

    deltas, rdefs = [], []
    for c0 in range(0, B, chunk):
        c1 = min(c0 + chunk, B)
        args = (syn_s[c0:c1], vals_s[c0:c1], hard_s[c0:c1])

        def run_osd(a):
            s, v, h = a
            out = osd_batch(dec.H, dec.HT_bf16, s, v, h, K=dec.K,
                            order=osd_order, num_test=dec.num_test,
                            use_pallas=use_pallas,
                            rank=dec.rank, basis_cols=dec.basis_cols,
                            logical_pack=dec.logical_pack,
                            return_solution=False)
            return out["logical_delta_packed"], out["rank_deficient"]

        delta, rdef = jax.lax.cond(
            jnp.any(~conv_s[c0:c1]), run_osd,
            lambda a: (jnp.zeros(a[2].shape[0], jnp.int32),
                       jnp.zeros(a[2].shape[0], bool)), args)
        deltas.append(delta)
        rdefs.append(rdef)
    delta_s = jnp.concatenate(deltas, axis=0)
    rdef_s = jnp.concatenate(rdefs, axis=0)
    # undo the sort; the OSD correction's logical action travels as one
    # packed int32 per shot (see _logical_readout)
    delta = jnp.zeros_like(delta_s).at[order].set(delta_s)
    rdef = jnp.zeros_like(rdef_s).at[order].set(rdef_s) & ~conv
    return delta, rdef


def _logical_readout(hard, conv, delta, dec: BasisDecoder):
    """Decoded logical action (B, k) int32 from the BP hard decision and
    the packed OSD logical delta (the (B, n) OSD solution is never
    materialized — the decoded logical is linear in GF(2):
    osd_sol@L = hard@L ^ delta)."""
    bp_log = (jnp.dot(hard.astype(jnp.bfloat16), dec.H_logical,
                      preferred_element_type=jnp.float32)
              .astype(jnp.int32) & 1)                            # (B, k)
    k = bp_log.shape[1]
    delta_bits = (delta[:, None] >> jnp.arange(k, dtype=jnp.int32)) & 1
    return bp_log ^ jnp.where(conv[:, None], 0, delta_bits)


def _decode_logicals(syndrome, dec: BasisDecoder, maxIter: int,
                     osd_order: int, damping: float, clip_llr: float,
                     use_pallas: bool = False, msg_dtype=jnp.float32,
                     bp_variant: str = "minsum"):
    """BP, OSD fallback for unconverged shots, logical readout.

    Returns (dec_log (B, k) int32 — the decoded correction's logical
    action, converged (B,) bool, rank_deficient (B,) bool)."""
    B = syndrome.shape[0]
    bp = _bp_one_basis(syndrome, dec, maxIter, damping, clip_llr,
                       use_pallas, msg_dtype, bp_variant)
    conv = bp["converged"]
    chunk = B if B <= 64 else max(64, B // 8)
    delta, rdef = _osd_fallback(syndrome, bp["values"], bp["hard"], conv,
                                dec, osd_order, use_pallas, chunk)
    dec_log = _logical_readout(bp["hard"], conv, delta, dec)
    return dec_log, conv, rdef


def _decode_one_basis(syndrome, true_log, dec: BasisDecoder, maxIter: int,
                      osd_order: int, damping: float, clip_llr: float,
                      use_pallas: bool = False, msg_dtype=jnp.float32,
                      bp_variant: str = "minsum"):
    """_decode_logicals + comparison against the true logical effect."""
    dec_log, conv, rdef = _decode_logicals(
        syndrome, dec, maxIter, osd_order, damping, clip_llr, use_pallas,
        msg_dtype, bp_variant)
    err = jnp.any(dec_log != true_log.astype(jnp.int32), axis=1)
    return err, conv, rdef


def _round_defaults(dec_z: BasisDecoder, damping: float, use_pallas,
                    msg_dtype, bp_variant: str):
    """Resolve the backend-dependent round-fn defaults shared by
    make_round_fn and make_pooled_round_fn."""
    if use_pallas is None:  # VMEM elimination kernel on real TPU only
        # (the TPU platform may be named 'tpu' or a plugin name like 'axon')
        use_pallas = jax.default_backend() != "cpu"
    if bp_variant == "layered" and (dec_z.lifted is None or damping != 1.0):
        logger.warning(
            "bp_variant='layered' needs a lifted decoding graph and "
            "damping == 1; falling back to the flooding schedule")
        bp_variant = "minsum"
    if msg_dtype is None:
        # bf16 BP messages on real TPU (halves the gather traffic that
        # dominates BP cost; LER-validated), exact f32 on CPU/test meshes
        msg_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" \
            else jnp.float32
    return use_pallas, msg_dtype, bp_variant


def make_round_fn(dec_z: BasisDecoder, dec_x: BasisDecoder, n_locs: int,
                  error_rate: float, batch: int, maxIter: int,
                  osd_order: int, damping: float = 1.0,
                  clip_llr: float = 20.0, use_pallas: bool = None,
                  msg_dtype=None, bp_variant: str = "minsum"):
    """Build the per-device decode-round function:
    (key, dec_z, dec_x) -> per-shot flags.

    The decoder bundles are call-boundary ARGUMENTS, not closure captures —
    closure arrays get baked into the HLO as constants, which bloats the
    program by hundreds of MB for the large codes (the [[288]] signature
    matrix alone is ~450MB) and can exceed compile-service request limits.
    """
    use_pallas, msg_dtype, bp_variant = _round_defaults(
        dec_z, damping, use_pallas, msg_dtype, bp_variant)

    def round_fn(key, dec_z=dec_z, dec_x=dec_x, error_rate=error_rate):
        # error_rate may be passed as a traced 0-d array: a p-sweep then
        # reuses ONE compiled round program across its points (everything
        # else p-dependent — priors, alpha sequences, channel tables —
        # already travels inside the decoder-bundle arguments), instead of
        # paying a multi-minute remote compile per p
        err, pauli, cat2 = sample_gate_randoms(key, batch, n_locs, error_rate)
        out = {}
        for name, dec in (("z", dec_z), ("x", dec_x)):
            bits = fault_bits(err, pauli, cat2, dec.maps, name.upper())
            aug = augmented_bits(bits, dec.maps)
            syndrome = aug[:, :dec.maps.num_syn]
            true_log = aug[:, dec.maps.num_syn:]
            e, conv, rdef = _decode_one_basis(syndrome, true_log, dec,
                                              maxIter, osd_order, damping,
                                              clip_llr, use_pallas, msg_dtype,
                                              bp_variant)
            out[f"{name}_err"] = e
            out[f"{name}_conv"] = conv
            out[f"{name}_rankdef"] = rdef
        out["any_err"] = out["z_err"] | out["x_err"]
        return out

    return round_fn


def make_scanned_round_fn(round_fn, n_rounds: int):
    """Fuse ``n_rounds`` decode rounds into ONE dispatch via lax.scan.

    Every dispatch over the TPU transport pays a fixed ~30ms floor that
    pipelining does NOT hide (measured: a 6ms sample-only round still takes
    ~34ms/dispatch with 2 in flight — the limit is dispatch rate, not
    latency; scripts/round_breakdown.py). Scanning k rounds inside the
    program amortizes that floor k-fold while compiling the round body
    once. Per-round RNG decorrelation via fold_in of the scan index; the
    stacked (k, B) flag arrays are flattened so callers see one (k*B,)
    round."""
    idx = jnp.arange(n_rounds, dtype=jnp.uint32)

    def scanned(key, *rest):
        def body(carry, i):
            return carry, round_fn(jax.random.fold_in(key, i), *rest)

        _, outs = jax.lax.scan(body, (), idx)
        # flatten the stacked round axis on every leaf (works for the
        # single-code dict and the multi-code list-of-dicts alike)
        return jax.tree.map(lambda v: v.reshape((-1,) + v.shape[2:]), outs)

    return scanned


def make_pooled_round_fn(dec_z: BasisDecoder, dec_x: BasisDecoder,
                         n_locs: int, error_rate: float, batch: int,
                         maxIter: int, osd_order: int, n_rounds: int,
                         damping: float = 1.0, clip_llr: float = 20.0,
                         use_pallas: bool = None, msg_dtype=None,
                         bp_variant: str = "minsum",
                         osd_chunk: int = None):
    """``n_rounds`` fused decode rounds with CROSS-ROUND OSD compaction.

    Same observable contract as
    ``make_scanned_round_fn(make_round_fn(...), n_rounds)`` — one dispatch,
    flattened ``(n_rounds * batch,)`` per-shot flags, per-round RNG via
    ``fold_in`` of the round index, and BIT-IDENTICAL per-shot results
    (pinned by tests/test_engine.py) — but a different internal schedule:
    the scan body does sampling + BP only, stacking each round's BP
    outputs, and ONE pooled OSD phase then sorts all ``n_rounds * batch``
    shots unconverged-first and eliminates in chunks. The per-round
    schedule quantizes elimination cost to each round's own worst case
    (``ceil`` of its failed count per round, per basis); pooling quantizes
    once across the whole dispatch, so elimination cost tracks the ACTUAL
    pooled failure count and the residual-weight sort sees the full
    population (more uniform difficulty per chunk -> earlier validity
    exits). OSD grouping-independence (see _osd_fallback) is what makes
    the two schedules bit-equivalent.

    Cost: the stacked BP posteriors/hard decisions live in HBM between the
    phases — (n_rounds*batch, n) f32+int8 per basis (~0.6GB at the [[144]]
    bench shape, well under the 16GB v5e HBM).

    Reference anchor: OSD only on unconverged trials (reference
    engine.py:96-97); the reference's per-trial loop has no analogue of
    chunk quantization — this recovers its exact-count property inside a
    fixed-shape SPMD program."""
    use_pallas, msg_dtype, bp_variant = _round_defaults(
        dec_z, damping, use_pallas, msg_dtype, bp_variant)
    idx = jnp.arange(n_rounds, dtype=jnp.uint32)

    def pooled(key, dec_z=dec_z, dec_x=dec_x, error_rate=error_rate):
        def body(carry, i):
            return carry, _sample_bp_phase(
                jax.random.fold_in(key, i), dec_z, dec_x, n_locs,
                error_rate, batch, maxIter, damping, clip_llr, use_pallas,
                msg_dtype, bp_variant)

        _, stacked = jax.lax.scan(body, (), idx)
        # flatten the round axis: (n_rounds, B, ...) -> (n_rounds*B, ...)
        flat = jax.tree.map(lambda v: v.reshape((-1,) + v.shape[2:]),
                            stacked)
        return _pooled_osd_phase(flat, dec_z, dec_x, osd_order,
                                 use_pallas, chunk=osd_chunk)

    return pooled


def _sample_bp_phase(key, dec_z, dec_x, n_locs, error_rate, batch, maxIter,
                     damping, clip_llr, use_pallas, msg_dtype, bp_variant):
    """One round's sampling + both-basis BP: the scan-body half of a pooled
    round. Returns the stackable [z, x] per-basis state dicts consumed by
    _pooled_osd_phase."""
    err, pauli, cat2 = sample_gate_randoms(key, batch, n_locs, error_rate)
    per_basis = []
    for name, dec in (("z", dec_z), ("x", dec_x)):
        bits = fault_bits(err, pauli, cat2, dec.maps, name.upper())
        aug = augmented_bits(bits, dec.maps)
        syndrome = aug[:, :dec.maps.num_syn]
        bp = _bp_one_basis(syndrome, dec, maxIter, damping, clip_llr,
                           use_pallas, msg_dtype, bp_variant)
        per_basis.append(dict(
            syn=syndrome, true_log=aug[:, dec.maps.num_syn:],
            values=bp["values"], hard=bp["hard"], conv=bp["converged"]))
    return per_basis


def _pooled_osd_phase(flat, dec_z, dec_x, osd_order, use_pallas,
                      chunk: int = None):
    """Pooled OSD + readout over the flattened multi-round BP state: the
    post-scan half of a pooled round.

    The default chunk is POOL_WIDTH/8 (not the per-round batch/8): the
    same-session [[144]] B=1024 rpd4 sweep measured 32: 7.3k, 64: 10.8k,
    128: 12.3k, 256: 13.1k, 512: 13.6k, 1024: 12.7k, 2048: 12.0k,
    4096: 10.1k shots/s (scripts/pooled_ab.py --configs pooled@cN,
    2026-08-21) — finer chunks multiply per-chunk fixed cost (gather/
    pack + call-site overhead) while converged shots inside a coarse
    chunk are already ~free (all-zero-residual eliminator blocks exit
    before scanning); beyond the knee the ungated gather/pack volume and
    extra block launches win out. Fewer call sites also shrink the
    unrolled program (compile-time bonus). Pass ``chunk`` to override."""
    if chunk is None:
        pool = flat[0]["syn"].shape[0]
        chunk = pool if pool <= 64 else max(64, pool // 8)
    out = {}
    for name, dec, st in (("z", dec_z, flat[0]), ("x", dec_x, flat[1])):
        delta, rdef = _osd_fallback(st["syn"], st["values"], st["hard"],
                                    st["conv"], dec, osd_order, use_pallas,
                                    chunk)
        dec_log = _logical_readout(st["hard"], st["conv"], delta, dec)
        out[f"{name}_err"] = jnp.any(
            dec_log != st["true_log"].astype(jnp.int32), axis=1)
        out[f"{name}_conv"] = st["conv"]
        out[f"{name}_rankdef"] = rdef
    out["any_err"] = out["z_err"] | out["x_err"]
    return out


def make_multi_code_round_fn(specs):
    """One jitted launch decoding several codes' batches back to back
    (BASELINE.json config: "[[90,8,10]] and [[108,8,10]], batched
    multi-code decode in one kernel launch").

    ``specs``: list of dicts with keys dec_z, dec_x, n_locs, error_rate,
    batch, maxIter, osd_order. Returns fn(key, [(dec_z, dec_x), ...]) ->
    list of per-code flag dicts.
    """
    fns = [make_round_fn(sp["dec_z"], sp["dec_x"], sp["n_locs"],
                         sp["error_rate"], sp["batch"], sp["maxIter"],
                         sp["osd_order"]) for sp in specs]

    def multi_round(key, decs):
        return [fn(jax.random.fold_in(key, i), dz, dx)
                for i, (fn, (dz, dx)) in enumerate(zip(fns, decs))]

    return multi_round


def make_multi_code_pooled_round_fn(specs, n_rounds: int):
    """Multi-code fused rounds with per-code cross-round OSD compaction —
    the pooled analogue of
    ``make_scanned_round_fn(make_multi_code_round_fn(specs), n_rounds)``,
    with the same flattened list-of-dicts output, the same per-round/
    per-code RNG derivation, and bit-identical per-shot flags (see
    make_pooled_round_fn; pinned by tests/test_engine.py). Pooling is per
    code — codes have different shapes — but each code's elimination cost
    now tracks its pooled failure count across all fused rounds."""
    defaults = [_round_defaults(sp["dec_z"], 1.0, None, None, "minsum")
                for sp in specs]
    idx = jnp.arange(n_rounds, dtype=jnp.uint32)

    def pooled(key, decs):
        def body(carry, r):
            kr = jax.random.fold_in(key, r)
            return carry, [
                _sample_bp_phase(
                    jax.random.fold_in(kr, i), dz, dx, sp["n_locs"],
                    sp["error_rate"], sp["batch"], sp["maxIter"], 1.0, 20.0,
                    up, md, bv)
                for i, (sp, (dz, dx), (up, md, bv))
                in enumerate(zip(specs, decs, defaults))]

        _, stacked = jax.lax.scan(body, (), idx)
        flat = jax.tree.map(lambda v: v.reshape((-1,) + v.shape[2:]),
                            stacked)
        return [
            _pooled_osd_phase(flat[i], dz, dx, sp["osd_order"], up)
            for i, (sp, (dz, dx), (up, _md, _bv))
            in enumerate(zip(specs, decs, defaults))]

    return pooled


def _calibrate_basis_sequences(matrices, error_rate, alpha_mode,
                               alvarado_alpha, maxIter,
                               alpha_estimation_trials=None,
                               alpha_estimation_bins=50, base_seed=0,
                               estimation_plot_dir=None, plot_tag=""):
    """Per-basis min-sum alpha sequences for one code: the calibration
    dispatch of the reference engine (engine.py:228-344), shared by
    run_simulation and run_multi_code_simulation so the data-driven modes
    exist once. Returns (seq_z, seq_x, result_extra).

    On a multi-process runtime the fitted sequences are broadcast from
    process 0 (mesh replicate() requires bit-identical decoder bundles on
    every process; per-process curve_fit numerics are not trusted)."""
    llrs_z = channel_llrs(matrices["channel_probsZ"])
    llrs_x = channel_llrs(matrices["channel_probsX"])
    result_extra: Dict[str, Any] = {}
    tag = f"{plot_tag}_" if plot_tag else ""
    alpha_z = alpha_x = 1.0
    if alpha_mode == "alvarado":
        if alvarado_alpha is None:
            trials_z = _calib_trials(alpha_estimation_trials,
                                     matrices["HdecZ"].shape[1], error_rate)
            trials_x = _calib_trials(alpha_estimation_trials,
                                     matrices["HdecX"].shape[1], error_rate)
            alpha_z, r2z = calibrate.estimate_alpha_alvarado(
                matrices["HdecZ"], error_rate, trials=trials_z,
                bins=alpha_estimation_bins, llrs=llrs_z,
                key=jax.random.key(base_seed + 1),
                plot_path=_plot_path(estimation_plot_dir, error_rate,
                                     tag + "alvarado", "z"))
            alpha_x, r2x = calibrate.estimate_alpha_alvarado(
                matrices["HdecX"], error_rate, trials=trials_x,
                bins=alpha_estimation_bins, llrs=llrs_x,
                key=jax.random.key(base_seed + 2),
                plot_path=_plot_path(estimation_plot_dir, error_rate,
                                     tag + "alvarado", "x"))
            result_extra.update(alpha_r2_z=r2z, alpha_r2_x=r2x)
        elif isinstance(alvarado_alpha, (list, tuple, np.ndarray)) and \
                len(alvarado_alpha) == 2:
            alpha_z, alpha_x = float(alvarado_alpha[0]), float(alvarado_alpha[1])
            result_extra.update(alpha_r2_z=None, alpha_r2_x=None)
        else:
            alpha_z = alpha_x = float(alvarado_alpha)
            result_extra.update(alpha_r2_z=None, alpha_r2_x=None)
        seq_z = alpha_schedule("alvarado", maxIter, alpha_z)
        seq_x = alpha_schedule("alvarado", maxIter, alpha_x)
    elif alpha_mode == "alvarado-autoregressive":
        if alvarado_alpha is not None:
            raise ValueError(
                "alvarado_alpha must be None for alvarado-autoregressive")
        trials_z = _calib_trials(alpha_estimation_trials,
                                 matrices["HdecZ"].shape[1], error_rate)
        trials_x = _calib_trials(alpha_estimation_trials,
                                 matrices["HdecX"].shape[1], error_rate)
        av_z, r2v_z, fb_z = calibrate.estimate_alpha_alvarado_autoregressive(
            matrices["HdecZ"], error_rate, maxIter, trials=trials_z,
            bins=alpha_estimation_bins, llrs=llrs_z,
            key=jax.random.key(base_seed + 1),
            plot_dir=estimation_plot_dir,
            plot_prefix=f"{tag}autoregressive_{_fmt(error_rate)}_z",
            return_fallbacks=True)
        av_x, r2v_x, fb_x = calibrate.estimate_alpha_alvarado_autoregressive(
            matrices["HdecX"], error_rate, maxIter, trials=trials_x,
            bins=alpha_estimation_bins, llrs=llrs_x,
            key=jax.random.key(base_seed + 2),
            plot_dir=estimation_plot_dir,
            plot_prefix=f"{tag}autoregressive_{_fmt(error_rate)}_x",
            return_fallbacks=True)
        result_extra.update(alpha_values_z=av_z, alpha_values_x=av_x,
                            alpha_r2_values_z=r2v_z, alpha_r2_values_x=r2v_x,
                            n_alpha_fallbacks_z=fb_z, n_alpha_fallbacks_x=fb_x,
                            n_alpha_fallbacks=fb_z + fb_x)
        seq_z = alpha_schedule("alvarado-autoregressive", maxIter, av_z)
        seq_x = alpha_schedule("alvarado-autoregressive", maxIter, av_x)
    elif alpha_mode == "dynamical":
        seq_z = seq_x = alpha_schedule("dynamical", maxIter)
    else:
        raise ValueError(f"Unsupported alpha_mode: {alpha_mode}")

    if getattr(jax, "process_count", lambda: 1)() > 1 and \
            alpha_mode != "dynamical":
        from jax.experimental import multihost_utils
        seq_z, seq_x = (np.asarray(a) for a in
                        multihost_utils.broadcast_one_to_all(
                            (np.asarray(seq_z, np.float32),
                             np.asarray(seq_x, np.float32))))
    if alpha_mode != "dynamical":
        # the POST-broadcast per-iteration sequences the decoder actually
        # consumes — lets multi-process validation assert bit-identity
        # across processes (scripts/multihost_smoke.py)
        result_extra["alpha_seq_z"] = np.asarray(seq_z, np.float32).tolist()
        result_extra["alpha_seq_x"] = np.asarray(seq_x, np.float32).tolist()
    result_extra["alpha_z"] = alpha_z
    result_extra["alpha_x"] = alpha_x
    return seq_z, seq_x, result_extra


def _crossing_take(a: np.ndarray, remaining: int) -> int:
    """The reference's exact sequential stopping rule within one round:
    number of trials up to AND including the one where the
    ``remaining``-th logical error occurs (reference engine.py:442-464
    processes trials strictly in order and terminates at the crossing
    trial). ``a`` must contain at least ``remaining`` errors."""
    cum = np.cumsum(a)
    return int(np.searchsorted(cum, remaining)) + 1


_GATHER_KEYS = ("z_err", "x_err", "any_err", "z_rankdef", "x_rankdef")


def _drive_stopping_rounds(dispatch, gather_flags, n_streams: int,
                           round_shots: int, max_trials: int,
                           target_logical_errors, verbose: bool,
                           names, on_progress=None, pipeline_depth: int = 2):
    """THE sequential-stopping round loop, shared by ``run_simulation``
    (one stream) and ``run_multi_code_simulation`` (one stream per code).
    Reference anchor: the single ``pool.imap`` consume loop of
    reference src/simulation/engine.py:433-464 — trials are accounted in
    global shot order, each stream truncates at the exact trial where its
    ``target_logical_errors``-th error occurs, and the run ends when every
    stream is done (multi-code launches keep decoding finished codes and
    discard their results until the slowest finishes; the engine logs it).

    ``dispatch(round_idx)`` -> list of per-stream device-resident flag
    dicts (psum ``*_count`` scalars + shot-sharded flag vectors). Steady-
    state rounds consume ONLY the replicated 4-byte counts; per-shot flag
    vectors are all-gathered solely in a stream's crossing (or truncated
    final) round — the multi-host contract (see mesh.shard_rounds).
    Up to ``pipeline_depth`` rounds stay in flight so the fixed dispatch
    latency of the TPU transport overlaps host accounting.

    Returns per-stream tallies + wall timing: dict with lists ``trials``,
    ``z_errs``, ``x_errs``, ``tot_errs``, ``rankdef``, ``steady_trials``
    and scalars ``elapsed``, ``steady_elapsed``."""
    stop_on_errors = (target_logical_errors is not None
                      and target_logical_errors > 0)
    trials = [0] * n_streams
    z_errs, x_errs, tot = [0] * n_streams, [0] * n_streams, [0] * n_streams
    rankdef = [0] * n_streams
    done = [False] * n_streams
    t_start = time.time()
    t_steady = None
    steady = [0] * n_streams
    round_idx = 0
    from collections import deque
    inflight: deque = deque()
    while not all(done):
        while len(inflight) < pipeline_depth:
            inflight.append(dispatch(round_idx))
            round_idx += 1
        outs = inflight.popleft()
        # one host transfer for every live stream's psum scalar counts
        counts = jax.device_get([
            {k: v for k, v in o.items() if k.endswith("_count")}
            for o in outs])
        for i, o in enumerate(outs):
            if done[i]:
                continue
            take = min(round_shots, max_trials - trials[i])
            a_cnt = int(counts[i]["any_err_count"])
            crossing = (stop_on_errors
                        and tot[i] + a_cnt >= target_logical_errors)
            if crossing or take < round_shots:
                # the crossing (or truncated final) round needs per-shot
                # flags in global shot order for the exact sequential rule
                g = jax.device_get(gather_flags(
                    {k: o[k] for k in _GATHER_KEYS if k in o}))
                z = np.asarray(g["z_err"][:take])
                x = np.asarray(g["x_err"][:take])
                a = np.asarray(g["any_err"][:take])
                if stop_on_errors and a.size and \
                        tot[i] + int(a.sum()) >= target_logical_errors:
                    take = _crossing_take(a, tot_errs_target(
                        target_logical_errors, tot[i]))
                    z, x, a = z[:take], x[:take], a[:take]
                z_inc, x_inc, a_inc = int(z.sum()), int(x.sum()), int(a.sum())
                rd = sum(int(np.asarray(g[k][:take]).sum())
                         for k in ("z_rankdef", "x_rankdef") if k in g)
            else:
                z_inc = int(counts[i]["z_err_count"])
                x_inc = int(counts[i]["x_err_count"])
                a_inc = a_cnt
                rd = (int(counts[i].get("z_rankdef_count", 0))
                      + int(counts[i].get("x_rankdef_count", 0)))
            trials[i] += take
            z_errs[i] += z_inc
            x_errs[i] += x_inc
            tot[i] += a_inc
            if rd:
                rankdef[i] += rd
                logger.warning(
                    "OSD rank deficiency on %d shot-bases this round — the "
                    "K=m+margin column truncation fell short of full rank; "
                    "re-run with a larger osd_margin for these settings", rd)
            if (stop_on_errors and tot[i] >= target_logical_errors) or \
                    trials[i] >= max_trials:
                done[i] = True
                if verbose and n_streams > 1 and not all(done):
                    logger.info(
                        "multi-code: %s reached its target after %d trials; "
                        "its share of each remaining launch is discarded "
                        "until the slowest code finishes",
                        names[i], trials[i])
            if on_progress is not None:
                on_progress(i, trials[i], tot[i])
        if t_steady is None:  # first round carries the compile cost
            t_steady = time.time()
            steady = list(trials)
        if verbose:
            logger.info("round %d: %s", round_idx,
                        {nm: (trials[i], tot[i])
                         for i, nm in enumerate(names)})
    elapsed = time.time() - t_start
    steady_elapsed = (time.time() - t_steady) if t_steady else elapsed
    return dict(trials=trials, z_errs=z_errs, x_errs=x_errs, tot_errs=tot,
                rankdef=rankdef, steady_trials=steady, elapsed=elapsed,
                steady_elapsed=steady_elapsed)


def run_multi_code_simulation(
    codes, error_rate, num_cycles=None, maxIter=50, osd_order=0,
    alpha_mode="dynamical", alvarado_alpha=None,
    target_logical_errors=None, max_trials=None,
    batch_size: Optional[int] = None,
    rounds_per_dispatch: Optional[int] = None,
    precomputed_matrices=None, base_seed=None, verbose: bool = True,
    mesh=None, alpha_estimation_trials=None, alpha_estimation_bins=50,
    estimation_plot_dir=None,
) -> Dict[str, Dict[str, Any]]:
    """Several codes' Monte-Carlo LER estimates from ONE jitted launch per
    round (BASELINE config 3 as a public API, not just a bench script).

    Every round decodes a batch for EVERY code back to back inside a
    single dispatch, amortizing the fixed per-dispatch transport floor
    across codes; the run continues until every code has reached
    ``target_logical_errors`` (or ``max_trials``), and each finished
    code's tally is truncated at its exact crossing trial (the same
    sequential rule as run_simulation, applied per code).

    Args:
      codes: list of code objects (e.g. ``get_code(name)``) or registry
        names.
      num_cycles: per-code cycles; None uses each code's distance.
      precomputed_matrices: optional list, aligned with ``codes``.
      alpha_mode: any run_simulation mode — "dynamical", "alvarado" (an
        explicit ``alvarado_alpha`` or data-driven per-code fits), or
        "alvarado-autoregressive" (per-code fitted sequences).
      mesh: optional shot mesh; by default the launch is sharded over all
        devices like run_simulation (steady-state stopping consumes only
        per-code psum scalar counts; per-shot flags are gathered solely in
        each code's crossing round).

    Returns {code.name: result dict} with the run_simulation keys;
    ``shots_per_sec`` is that code's own decoded-trial rate, and
    ``combined_shots_per_sec`` the launch-level aggregate across codes.

    Cost note: every launch decodes a batch for EVERY code (one compiled
    program), so a code that reaches its target early keeps being decoded
    — and its results discarded — until the slowest code finishes. Pairing
    codes with very different LERs wastes a corresponding share of late
    rounds; the engine logs when a code finishes early.
    """
    if base_seed is None:
        base_seed = int(np.random.randint(0, 2**31))
    if getattr(jax, "process_count", lambda: 1)() > 1:
        from jax.experimental import multihost_utils
        base_seed = int(multihost_utils.broadcast_one_to_all(
            np.int64(base_seed)))
    if max_trials is None:
        max_trials = 1_000_000 if target_logical_errors else 10_000
    stop_on_errors = (target_logical_errors is not None
                      and target_logical_errors > 0)
    if batch_size is None:
        batch_size = 512 if jax.default_backend() != "cpu" else 64
    if rounds_per_dispatch is None:
        rounds_per_dispatch = 4 if jax.default_backend() != "cpu" else 1

    from ..models.bb import get_code
    resolved = [get_code(c) if isinstance(c, str) else c for c in codes]

    specs, decs, names, extras = [], [], [], []
    for i, c in enumerate(resolved):
        cycles = num_cycles or c.distance or 12
        circ = SyndromeCircuit(c, num_cycles=cycles)
        M = (precomputed_matrices[i] if precomputed_matrices else
             build_decoding_matrices(circ, c.Lx, c.Lz, error_rate))
        M = ensure_sampler_metadata(M, circ, c.Lx, c.Lz, error_rate)
        name = getattr(c, "name", f"code{i}")
        seq_z, seq_x, extra = _calibrate_basis_sequences(
            M, error_rate, alpha_mode, alvarado_alpha, maxIter,
            alpha_estimation_trials, alpha_estimation_bins,
            base_seed + 101 * i, estimation_plot_dir,
            plot_tag=name.replace(" ", ""))
        dz = _make_basis(circ, M, "Z", seq_z, osd_order=osd_order)
        dx = _make_basis(circ, M, "X", seq_x, osd_order=osd_order)
        specs.append(dict(dec_z=dz, dec_x=dx, n_locs=circ.num_error_locs,
                          error_rate=error_rate, batch=batch_size,
                          maxIter=maxIter, osd_order=osd_order))
        decs.append((dz, dx))
        names.append(name)
        extras.append(extra)

    # rpd>1 uses per-code cross-round OSD compaction (bit-identical to the
    # scanned per-round schedule, cost-only — see make_pooled_round_fn)
    fn = make_multi_code_round_fn(specs) if rounds_per_dispatch == 1 else \
        make_multi_code_pooled_round_fn(specs, rounds_per_dispatch)

    mesh = mesh if mesh is not None else (
        shot_mesh() if len(jax.devices()) > 1 else None)
    n_dev = len(mesh.devices.ravel()) if mesh is not None else 1
    sharded = shard_rounds(jax.jit(fn), mesh)
    gather_flags = make_flag_gather(mesh)
    decs = replicate(decs, mesh)
    round_shots = batch_size * n_dev * rounds_per_dispatch
    key = make_key(base_seed)

    st = _drive_stopping_rounds(
        lambda ri: sharded(jax.random.fold_in(key, ri), decs),
        gather_flags, len(resolved), round_shots, max_trials,
        target_logical_errors if stop_on_errors else None, verbose, names)

    trials, steady = st["trials"], st["steady_trials"]
    elapsed, steady_elapsed = st["elapsed"], st["steady_elapsed"]
    steady_done = sum(trials) - sum(steady)
    combined_rate = (steady_done / steady_elapsed if steady_done
                     else sum(trials) / max(elapsed, 1e-9))
    results = {}
    for i, nm in enumerate(names):
        code_steady = trials[i] - steady[i]
        results[nm] = {
            "logical_error_rate": st["tot_errs"][i] / max(1, trials[i]),
            "z_logical_error_rate": st["z_errs"][i] / max(1, trials[i]),
            "x_logical_error_rate": st["x_errs"][i] / max(1, trials[i]),
            "num_trials": trials[i],
            "logical_errors": st["tot_errs"][i],
            # this code's own decoded-trial rate; the launch-level aggregate
            # across all codes is combined_shots_per_sec
            "shots_per_sec": (code_steady / steady_elapsed if code_steady
                              else trials[i] / max(elapsed, 1e-9)),
            "combined_shots_per_sec": combined_rate,
            "elapsed_sec": elapsed,
            "num_devices": n_dev,
            "osd_rank_deficient_shots": st["rankdef"][i],
        }
        results[nm].update(extras[i])
    return results


def run_simulation(
    Hx, Hz, Lx, Lz, error_rate, num_trials=1000, num_cycles=12,
    maxIter=50, osd_order=0, use_dynamic_alpha=True,
    alpha_mode=None, alvarado_alpha=None,
    alpha_estimation_trials=None, alpha_estimation_bins=50,
    precomputed_matrices=None, num_workers=None, base_seed=None,
    use_jit=True,
    target_logical_errors=None, max_trials=None, scopt=False,
    estimation_plot_dir=None,
    batch_size: Optional[int] = None, mesh=None, damping: float = 1.0,
    rounds_per_dispatch: Optional[int] = None,
    verbose: bool = True, bp_variant: str = "minsum",
    osd_cross_round: Optional[bool] = None,
    osd_chunk: Optional[int] = None,
    **bb_params,
) -> Dict[str, Any]:
    """Reference-compatible Monte-Carlo LER estimation (engine.py:193-203
    signature; num_workers/use_jit accepted for compatibility and ignored —
    parallelism is the device mesh, the jitted path is the only path)."""
    del num_workers, use_jit
    if base_seed is None:
        base_seed = int(np.random.randint(0, 2**31))
    if getattr(jax, "process_count", lambda: 1)() > 1:
        # multi-host: every process must trace the identical computation, so
        # the seed (and hence calibration and round RNG) comes from proc 0
        from jax.experimental import multihost_utils
        base_seed = int(multihost_utils.broadcast_one_to_all(
            np.int64(base_seed)))

    code = make_code(Hx, Hz, Lx, Lz, **bb_params)
    circ = SyndromeCircuit(code, num_cycles=num_cycles)
    matrices = precomputed_matrices or build_decoding_matrices(
        circ, code.Lx, code.Lz, error_rate)
    matrices = ensure_sampler_metadata(matrices, circ, code.Lx, code.Lz,
                                       error_rate)
    llrs_z = channel_llrs(matrices["channel_probsZ"])
    llrs_x = channel_llrs(matrices["channel_probsX"])

    if alpha_mode is None:
        alpha_mode = "dynamical" if use_dynamic_alpha else "alvarado"

    seq_z, seq_x, result_extra = _calibrate_basis_sequences(
        matrices, error_rate, alpha_mode, alvarado_alpha, maxIter,
        alpha_estimation_trials, alpha_estimation_bins, base_seed,
        estimation_plot_dir)
    alpha_z = result_extra.pop("alpha_z")
    alpha_x = result_extra.pop("alpha_x")

    if scopt:
        trials_z = _calib_trials(None, matrices["HdecZ"].shape[1], error_rate)
        trials_x = _calib_trials(None, matrices["HdecX"].shape[1], error_rate)
        beta_z, br2z = calibrate.estimate_scopt_beta(
            matrices["HdecZ"], error_rate, trials=trials_z,
            bins=alpha_estimation_bins,
            alpha=(result_extra.get("alpha_values_z", alpha_z)
                   if alpha_mode == "alvarado-autoregressive" else alpha_z),
            alpha_mode=alpha_mode, maxIter=maxIter, llrs=llrs_z,
            key=jax.random.key(base_seed + 3),
            plot_path=_plot_path(estimation_plot_dir, error_rate, "scopt", "z"))
        beta_x, br2x = calibrate.estimate_scopt_beta(
            matrices["HdecX"], error_rate, trials=trials_x,
            bins=alpha_estimation_bins,
            alpha=(result_extra.get("alpha_values_x", alpha_x)
                   if alpha_mode == "alvarado-autoregressive" else alpha_x),
            alpha_mode=alpha_mode, maxIter=maxIter, llrs=llrs_x,
            key=jax.random.key(base_seed + 4),
            plot_path=_plot_path(estimation_plot_dir, error_rate, "scopt", "x"))
        # beta is estimated and reported but (like the reference,
        # engine.py:389 TODO) not yet consumed by the decoder
        result_extra.update(beta_z=beta_z, beta_x=beta_x,
                            beta_r2_z=br2z, beta_r2_x=br2x)

    dec_z = _make_basis(circ, matrices, "Z", seq_z, osd_order=osd_order)
    dec_x = _make_basis(circ, matrices, "X", seq_x, osd_order=osd_order)

    if max_trials is None:
        max_trials = num_trials if num_trials is not None else 1_000_000
    stop_on_errors = (target_logical_errors is not None
                      and target_logical_errors > 0)

    mesh = mesh if mesh is not None else (
        shot_mesh() if len(jax.devices()) > 1 else None)
    n_dev = len(mesh.devices.ravel()) if mesh is not None else 1
    if batch_size is None:
        # per-device shot batch: the decode round has a ~19ms fixed cost on
        # v5e (dispatch share + in-program per-round overhead) that larger
        # batches amortize (512 -> 1024 measured +17% on [[144]]; 2048 is
        # flat at twice the working set). CPU test meshes keep the smaller
        # round for stopping granularity and suite runtime.
        cap = 1024 if jax.default_backend() != "cpu" else 512
        batch_size = min(cap, max(128, -(-max_trials // n_dev)))
    if rounds_per_dispatch is None:
        # fused rounds amortize the fixed per-dispatch transport floor on
        # real TPU; on CPU test meshes dispatch is cheap and stopping
        # granularity matters more
        rounds_per_dispatch = 4 if jax.default_backend() != "cpu" else 1
        # don't overshoot small trial budgets with a huge fused round
        while (rounds_per_dispatch > 1
               and batch_size * n_dev * rounds_per_dispatch > max_trials * 2):
            rounds_per_dispatch //= 2
    if osd_cross_round is None:
        # pooled elimination is bit-identical and never slower; auto unless
        # there is nothing to pool
        osd_cross_round = rounds_per_dispatch > 1
    if osd_cross_round and rounds_per_dispatch > 1:
        round_fn = make_pooled_round_fn(
            dec_z, dec_x, circ.num_error_locs, error_rate, batch_size,
            maxIter, osd_order, rounds_per_dispatch, damping,
            bp_variant=bp_variant, osd_chunk=osd_chunk)
    else:
        round_fn = make_round_fn(dec_z, dec_x, circ.num_error_locs,
                                 error_rate, batch_size, maxIter, osd_order,
                                 damping, bp_variant=bp_variant)
        if rounds_per_dispatch > 1:
            round_fn = make_scanned_round_fn(round_fn, rounds_per_dispatch)
    sharded = shard_rounds(jax.jit(round_fn), mesh)
    gather_flags = make_flag_gather(mesh)
    round_shots = batch_size * n_dev * rounds_per_dispatch
    # commit the decode bundles to a replicated mesh layout once: avoids
    # per-dispatch transfers, and on a multi-host mesh it is the only legal
    # way to feed them (per-process arrays are not globally addressable)
    # p travels as a traced replicated scalar so every point of a p-sweep
    # shares one compiled round program (see make_round_fn)
    dec_z, dec_x, p_arg = replicate(
        (dec_z, dec_x, jnp.float32(error_rate)), mesh)

    key = make_key(base_seed)
    progress = None
    if verbose:
        try:  # live progress like the reference's rich bar (engine.py:436)
            from tqdm import tqdm
            progress = tqdm(
                total=(target_logical_errors if stop_on_errors
                       else max_trials),
                unit="err" if stop_on_errors else "trial",
                desc=f"p={error_rate:g}", leave=False)
        except ImportError:  # pragma: no cover
            pass

    def on_progress(_i, trials_now, errs_now):
        if progress is not None:
            done_units = errs_now if stop_on_errors else trials_now
            progress.update(done_units - progress.n)
            progress.set_postfix(trials=trials_now, ler=(
                f"{errs_now / max(1, trials_now):.3g}"))

    # Up to 2 rounds stay in flight inside the driver: device dispatch over
    # the TPU transport has tens of ms of fixed latency per call, which
    # pipelining hides (results stream back in order; an unused final
    # in-flight round is the only waste).
    st = _drive_stopping_rounds(
        lambda ri: [sharded(jax.random.fold_in(key, ri),
                            dec_z, dec_x, p_arg)],
        gather_flags, 1, round_shots, max_trials,
        target_logical_errors if stop_on_errors else None, verbose,
        [f"p={error_rate:g}"], on_progress=on_progress)
    if progress is not None:
        progress.close()
    trials_run, tot_errs = st["trials"][0], st["tot_errs"][0]
    elapsed, steady_elapsed = st["elapsed"], st["steady_elapsed"]
    # steady-state throughput excludes the first round's compile time
    steady_done = trials_run - st["steady_trials"][0]

    result = {
        "logical_error_rate": tot_errs / max(1, trials_run),
        "z_logical_error_rate": st["z_errs"][0] / max(1, trials_run),
        "x_logical_error_rate": st["x_errs"][0] / max(1, trials_run),
        "num_trials": trials_run,
        "logical_errors": tot_errs,
        "shots_per_sec": (steady_done / steady_elapsed if steady_done
                          else trials_run / max(elapsed, 1e-9)),
        "elapsed_sec": elapsed,
        "num_devices": n_dev,
        "osd_rank_deficient_shots": st["rankdef"][0],
    }
    result.update(result_extra)
    return result


def tot_errs_target(target: int, already: int) -> int:
    """Remaining errors needed within the current round."""
    return max(0, target - already)


def _calib_trials(requested: Optional[int], n: int, p: float) -> int:
    """Reference's dynamic trial-count rule (engine.py:236-244):
    alpha_estimation_trials=None (the default) selects
    max(500, min(50000, 2000/(n*p))); an explicit integer is honored
    verbatim."""
    if requested is not None:
        return requested
    return max(500, min(50000, int(2000 / (n * p))))


def _fmt(rate: float) -> str:
    return f"{rate:.6g}".replace(".", "p")


def _plot_path(plot_dir: Optional[str], rate: float, kind: str,
               basis: str) -> Optional[str]:
    if plot_dir is None:
        return None
    os.makedirs(plot_dir, exist_ok=True)
    return os.path.join(plot_dir, f"{kind}_{_fmt(rate)}_{basis}_fit.png")
