"""Device-mesh utilities: shot-axis data parallelism for Monte-Carlo decoding.

The reference's parallelism surface is a single-node multiprocessing pool
fanning out one trial per task (reference src/simulation/engine.py:433-464).
The TPU-native equivalent is SPMD: a 1-D ``Mesh`` over all devices with the
Monte-Carlo shot axis sharded across it via ``shard_map``; each device
samples and decodes its own shard with a decorrelated RNG stream
(``fold_in`` of the mesh axis index), and per-shot error flags are gathered
so the host can apply the exact sequential stopping rule. The round's
total error count additionally rides a ``jax.lax.psum`` over ICI
(``any_err_count`` in the round output, replicated): the engine consults
this one on-device-reduced scalar every round and touches the per-shot
flag vectors only in the round where the stopping target is actually
crossed.

Scaling to multi-host pods requires no code change: ``jax.devices()``
spans all hosts under ``jax.distributed``, the same Mesh covers them, and
the shot axis shards across DCN-connected slices identically.
"""
from __future__ import annotations

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


def shot_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, shot-axis data parallel."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (SHOT_AXIS,))


def shard_rounds(round_fn: Callable, mesh: Optional[Mesh]) -> Callable:
    """Wrap a per-device decode round into an SPMD round over the mesh.

    ``round_fn(key, *replicated_args) -> dict of (B, ...) arrays`` becomes
    ``sharded(key, *replicated_args) -> dict of (D*B, ...) arrays`` with
    per-device RNG decorrelation; extra args (e.g. decoder bundles) are
    replicated across the mesh. The output dict gains ``any_err_count``:
    the round's total error count, psum-reduced across the mesh on device
    (replicated scalar — reading it moves 4 bytes per round instead of the
    flag vectors). With mesh=None (single device) the count is computed
    locally and the wrapper is otherwise transparent.
    """
    if mesh is None or len(mesh.devices.ravel()) == 1:
        def single(key, *rest):
            out = dict(round_fn(key, *rest))
            if "any_err" in out:  # round dicts without error flags (e.g.
                out["any_err_count"] = jnp.sum(  # code-capacity) pass through
                    out["any_err"].astype(jnp.int32))
            return out

        # jit the wrapper: the count must fuse into the round program, not
        # cost extra eager dispatches on the dispatch-rate-limited chip
        return jax.jit(single)

    def per_device(key, *rest):
        dev = jax.lax.axis_index(SHOT_AXIS)
        out = dict(round_fn(jax.random.fold_in(key, dev), *rest))
        if "any_err" not in out:
            return out, jnp.int32(-1)
        count = jax.lax.psum(jnp.sum(out["any_err"].astype(jnp.int32)),
                             SHOT_AXIS)
        return out, count

    # check_vma=False: decode loops initialize while_loop carries from
    # constants, which the varying-manual-axes checker would reject.
    # out_specs: every flag array is shot-sharded, the psum count replicated
    # (pytree-prefix specs for the (dict, scalar) output).
    kw = dict(mesh=mesh, in_specs=P(), out_specs=(P(SHOT_AXIS), P()))
    try:
        fn = shard_map(per_device, check_vma=False, **kw)
    except TypeError:  # older JAX: the kwarg was called check_rep
        fn = shard_map(per_device, check_rep=False, **kw)

    def sharded(key, *rest):
        flags, count = fn(key, *rest)
        flags = dict(flags)
        if "any_err" in flags:
            flags["any_err_count"] = count
        return flags

    return jax.jit(sharded)
