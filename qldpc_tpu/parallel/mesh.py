"""Device-mesh utilities: shot-axis data parallelism for Monte-Carlo decoding.

The reference's parallelism surface is a single-node multiprocessing pool
fanning out one trial per task (reference src/simulation/engine.py:433-464).
The TPU-native equivalent is SPMD: a 1-D ``Mesh`` over all devices with the
Monte-Carlo shot axis sharded across it via ``shard_map``; each device
samples and decodes its own shard with a decorrelated RNG stream
(``fold_in`` of the mesh axis index).

Multi-host contract (how the engine actually scales past one process):

- ``distributed_init_from_env()`` runs a guarded
  ``jax.distributed.initialize()`` when the ``QLDPC_COORDINATOR`` /
  ``QLDPC_NUM_PROCESSES`` / ``QLDPC_PROCESS_ID`` environment variables are
  set (drivers call it before touching any device). After that,
  ``jax.devices()`` spans every host and ``shot_mesh()`` covers them all.
- ``shard_rounds`` emits, alongside the shot-sharded per-shot flag arrays,
  ``psum``-reduced REPLICATED scalar counts (``*_count``) for every flag.
  Replicated scalars are addressable from every process, so the engine's
  steady-state stopping loop consumes ONLY these 4-byte counts per round.
- The per-shot flag vectors are globally sharded and therefore NOT
  addressable from a single process on a multi-host mesh; the engine
  touches them only in the round that crosses the stopping target (or a
  truncated final round), through ``make_flag_gather`` — a jitted
  all-gather to a fully-replicated layout, which every process can read.
- Per-process host state (trial/error counters, RNG round indices) stays
  identical across processes because every process executes the same loop
  on the same replicated counts; the base seed is broadcast from process 0
  by the engine so the jitted computation is identical everywhere.

Validated under a real 2-process ``jax.distributed`` CPU cluster
(scripts/multihost_smoke.py): exact stopping equivalence with the
single-process 8-device mesh.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map  # type: ignore

SHOT_AXIS = "shots"

# flag arrays whose whole-round totals ride the mesh as psum scalars
# (the engine's steady-state loop reads ONLY these)
COUNT_KEYS = ("any_err", "z_err", "x_err", "z_rankdef", "x_rankdef",
              "fail", "conv")


def distributed_init_from_env() -> bool:
    """Initialize ``jax.distributed`` from the environment, if configured.

    Reads ``QLDPC_COORDINATOR`` (host:port), ``QLDPC_NUM_PROCESSES`` and
    ``QLDPC_PROCESS_ID``; returns True when a multi-process runtime was
    initialized. Must be called before any JAX device/backend use. A no-op
    (returning False) when the variables are unset, so single-process runs
    need no configuration. The reference's analogue is the
    multiprocessing-pool spawn (reference src/simulation/engine.py:433) —
    here the "pool" is the set of JAX processes spanning the DCN-connected
    mesh."""
    coord = os.environ.get("QLDPC_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["QLDPC_NUM_PROCESSES"]),
        process_id=int(os.environ["QLDPC_PROCESS_ID"]))
    return True


def shot_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, shot-axis data parallel.
    Under ``jax.distributed`` this spans every host's devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (SHOT_AXIS,))


def replicate(tree, mesh: Optional[Mesh]):
    """Commit a pytree of per-process arrays to a fully-replicated layout on
    the mesh (identical bytes on every process are required and assumed —
    the engine derives everything from a broadcast seed). Avoids per-
    dispatch host transfers and is the only legal way to feed large
    constants to a multi-host computation."""
    if mesh is None:
        return tree
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_flag_gather(mesh: Optional[Mesh]) -> Callable:
    """A jitted identity with fully-replicated output sharding: converts the
    round's globally-sharded per-shot flag arrays into replicated arrays
    that every process can ``device_get``. Used ONLY in the stopping-
    crossing round and in truncated final rounds — steady-state rounds
    move nothing but the psum scalar counts."""
    if mesh is None or len(mesh.devices.ravel()) == 1:
        return lambda flags: flags
    rep = NamedSharding(mesh, P())

    @jax.jit
    def gather(flags):
        return {k: jax.lax.with_sharding_constraint(v, rep)
                for k, v in flags.items()}

    return gather


def shard_rounds(round_fn: Callable, mesh: Optional[Mesh]) -> Callable:
    """Wrap a per-device decode round into an SPMD round over the mesh.

    ``round_fn(key, *replicated_args) -> dict of (B, ...) arrays`` becomes
    ``sharded(key, *replicated_args) -> dict of (D*B, ...) arrays`` with
    per-device RNG decorrelation; extra args (e.g. decoder bundles) are
    replicated across the mesh. For every flag array named in
    ``COUNT_KEYS`` the output dict gains ``<name>_count``: the round's
    whole-mesh total, psum-reduced on device and REPLICATED (reading one
    moves 4 bytes per round — and, on a multi-host mesh, is the only
    per-round output a single process may legally read). With mesh=None
    (single device) counts are computed locally and the wrapper is
    otherwise transparent.
    """
    def add_counts(out, reduce_fn):
        """Attach <flag>_count totals; recurses into the multi-code
        list-of-dicts round output."""
        if isinstance(out, (list, tuple)):
            return type(out)(add_counts(o, reduce_fn) for o in out)
        out = dict(out)
        for k in COUNT_KEYS:
            if k in out:
                out[k + "_count"] = reduce_fn(out[k])
        return out

    if mesh is None or len(mesh.devices.ravel()) == 1:
        def single(key, *rest):
            return add_counts(round_fn(key, *rest),
                              lambda v: jnp.sum(v.astype(jnp.int32)))

        # jit the wrapper: the counts must fuse into the round program, not
        # cost extra eager dispatches on the dispatch-rate-limited chip
        return jax.jit(single)

    def per_device(key, *rest):
        dev = jax.lax.axis_index(SHOT_AXIS)
        out = round_fn(jax.random.fold_in(key, dev), *rest)
        with_counts = add_counts(
            out, lambda v: jax.lax.psum(jnp.sum(v.astype(jnp.int32)),
                                        SHOT_AXIS))

        # split flags (shot-sharded) from counts (replicated) so the
        # out_specs prefix stays a 2-tuple regardless of nesting
        def split(o):
            if isinstance(o, (list, tuple)):
                fs, cs = zip(*(split(x) for x in o))
                return type(o)(fs), type(o)(cs)
            f = {k: v for k, v in o.items() if not k.endswith("_count")}
            c = {k: v for k, v in o.items() if k.endswith("_count")}
            return f, c

        return split(with_counts)

    # check_vma=False: decode loops initialize while_loop carries from
    # constants, which the varying-manual-axes checker would reject.
    # out_specs: every flag array is shot-sharded, the psum counts
    # replicated (pytree-prefix specs for the (dict, dict) output).
    kw = dict(mesh=mesh, in_specs=P(), out_specs=(P(SHOT_AXIS), P()))
    try:
        fn = shard_map(per_device, check_vma=False, **kw)
    except TypeError:  # older JAX: the kwarg was called check_rep
        fn = shard_map(per_device, check_rep=False, **kw)

    def merge(f, c):
        if isinstance(f, (list, tuple)):
            return type(f)(merge(a, b) for a, b in zip(f, c))
        f = dict(f)
        f.update(c)
        return f

    def sharded(key, *rest):
        flags, counts = fn(key, *rest)
        return merge(flags, counts)

    return jax.jit(sharded)
