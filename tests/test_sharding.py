"""Mesh sharding: SPMD round equivalence and RNG decorrelation."""
import numpy as np
import pytest

import jax

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.parallel.engine import _make_basis, make_key, make_round_fn
from qldpc_tpu.parallel.mesh import (SHOT_AXIS, make_flag_gather,
                                     shard_rounds, shot_mesh)


@pytest.fixture(scope="module")
def round_setup():
    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=2)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.01)
    seq = alpha_schedule("dynamical", 5)
    dz = _make_basis(circ, M, "Z", seq, osd_order=0)
    dx = _make_basis(circ, M, "X", seq, osd_order=0)
    fn = make_round_fn(dz, dx, circ.num_error_locs, 0.01, 16, 5, 0)
    return fn


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices")


def test_sharded_round_shapes_and_decorrelation(round_setup):
    mesh = shot_mesh()
    sharded = shard_rounds(round_setup, mesh)
    out = jax.device_get(sharded(make_key(0)))
    n_dev = len(jax.devices())
    assert out["any_err"].shape == (16 * n_dev,)
    assert np.array_equal(out["any_err"], out["z_err"] | out["x_err"])
    # per-device shards must differ (fold_in decorrelation): compare the
    # error patterns of the 8 shards — identical shards would mean the RNG
    # stream is shared
    shards = out["any_err"].reshape(n_dev, 16)
    assert len({s.tobytes() for s in shards}) > 1


def test_psum_error_count_matches_flags(round_setup):
    """The on-device psum counts (mesh.py shard_rounds) must equal the sums
    of the gathered per-shot flags for EVERY counted key, on both the mesh
    and the single-device paths — the engine's multi-host steady-state
    stopping loop reads nothing but these scalars."""
    for mesh in (shot_mesh(), None):
        sharded = shard_rounds(round_setup, mesh)
        out = jax.device_get(sharded(make_key(3)))
        for k in ("any_err", "z_err", "x_err", "z_rankdef", "x_rankdef"):
            assert int(out[k + "_count"]) == int(out[k].sum()), k


def test_flag_gather_replicates_flags(round_setup):
    """make_flag_gather must return the identical per-shot flag vectors in
    a fully-replicated layout (the crossing-round path of the multi-host
    engine; on one process the values must simply round-trip)."""
    mesh = shot_mesh()
    sharded = shard_rounds(round_setup, mesh)
    out = sharded(make_key(5))
    flags = {k: v for k, v in out.items() if not k.endswith("_count")}
    gathered = make_flag_gather(mesh)(flags)
    for k in flags:
        assert gathered[k].sharding.is_fully_replicated, k
        np.testing.assert_array_equal(np.asarray(gathered[k]),
                                      np.asarray(flags[k]), err_msg=k)


def test_stopping_with_uneven_trials_and_fused_rounds():
    """Engine stopping with max_trials NOT a multiple of the fused round
    size (batch * n_dev * rounds_per_dispatch): the run must truncate at
    exactly max_trials, and a crossed error target must truncate at the
    crossing trial — under the scanned + sharded + psum-counted path."""
    from qldpc_tpu.parallel.engine import run_simulation
    code = get_code("[[72, 12, 6]]")
    bb = dict(ell=code.ell, m=code.m, a_x_powers=code.a_x_powers,
              a_y_powers=code.a_y_powers, b_y_powers=code.b_y_powers,
              b_x_powers=code.b_x_powers)
    # round size = 8 shots x 8 devices x 2 fused rounds = 128; 200 is uneven
    res = run_simulation(code.Hx, code.Hz, code.Lx, code.Lz, 0.008,
                         num_cycles=2, maxIter=5, osd_order=0,
                         alpha_mode="dynamical", max_trials=200,
                         batch_size=8, rounds_per_dispatch=2, base_seed=13,
                         verbose=False, **bb)
    assert res["num_trials"] == 200
    res2 = run_simulation(code.Hx, code.Hz, code.Lx, code.Lz, 0.008,
                          num_cycles=2, maxIter=5, osd_order=0,
                          alpha_mode="dynamical", max_trials=2000,
                          target_logical_errors=7, batch_size=8,
                          rounds_per_dispatch=2, base_seed=13,
                          verbose=False, **bb)
    assert res2["logical_errors"] == 7
    assert res2["num_trials"] < 2000


def test_sharded_matches_gathered_single_device(round_setup):
    """Each device's shard equals a single-device round run with that
    device's folded key — SPMD changes layout, not results."""
    mesh = shot_mesh()
    sharded = shard_rounds(round_setup, mesh)
    out = jax.device_get(sharded(make_key(7)))
    dev0 = jax.device_get(round_setup(
        jax.random.fold_in(make_key(7), 0)))
    assert np.array_equal(out["any_err"][:16], dev0["any_err"])


def test_mesh_axis_name():
    mesh = shot_mesh()
    assert mesh.axis_names == (SHOT_AXIS,)


def test_scanned_rounds_match_individual(round_setup):
    """make_scanned_round_fn(k) == k separate rounds with fold_in keys
    (the fused dispatch changes packaging, not results), and it composes
    with shard_rounds."""
    from qldpc_tpu.parallel.engine import make_scanned_round_fn
    key = make_key(3)
    scanned = jax.jit(make_scanned_round_fn(round_setup, 3))
    out = jax.device_get(scanned(key))
    assert out["any_err"].shape == (3 * 16,)
    for i in range(3):
        one = jax.device_get(round_setup(jax.random.fold_in(key, i)))
        for k in ("z_err", "x_err", "any_err", "z_conv", "x_conv"):
            assert np.array_equal(out[k][i * 16:(i + 1) * 16], one[k]), k
    sharded = shard_rounds(jax.jit(make_scanned_round_fn(round_setup, 2)),
                           shot_mesh())
    sout = jax.device_get(sharded(key))
    assert sout["any_err"].shape == (8 * 2 * 16,)


def test_pallas_engine_path_under_mesh(monkeypatch):
    """The full use_pallas=True engine path (VMEM lifted-BP kernel + Pallas
    OSD eliminator, interpret mode on CPU) under the 8-device shard_map mesh
    must reproduce the XLA path's per-shot flags exactly (both kernels are
    bit-exact vs their XLA counterparts at float32 — tests/test_osd_pallas,
    tests/test_bp_lift_pallas; this closes the gap that the CPU mesh tests
    previously only ever exercised the XLA branch, engine.py:278-280)."""
    import jax.numpy as jnp

    import qldpc_tpu.ops.osd_pallas as osd_pallas
    import qldpc_tpu.parallel.engine as eng

    code = get_code("[[72, 12, 6]]")
    circ = SyndromeCircuit(code, num_cycles=2)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.01)
    seq = alpha_schedule("dynamical", 5)
    dz = _make_basis(circ, M, "Z", seq, osd_order=2)
    dx = _make_basis(circ, M, "X", seq, osd_order=2)
    kw = dict(maxIter=5, osd_order=2, msg_dtype=jnp.float32)
    fn_xla = make_round_fn(dz, dx, circ.num_error_locs, 0.01, 16,
                           use_pallas=False, **kw)
    fn_pl = make_round_fn(dz, dx, circ.num_error_locs, 0.01, 16,
                          use_pallas=True, **kw)

    orig_eb = osd_pallas.eliminate_blocks
    monkeypatch.setattr(
        osd_pallas, "eliminate_blocks",
        lambda *a, **k: orig_eb(*a, **{**k, "interpret": True}))
    orig_bp = eng.decode_batch_lift_pallas
    monkeypatch.setattr(
        eng, "decode_batch_lift_pallas",
        lambda *a, **k: orig_bp(*a, **{**k, "interpret": True}))

    mesh = shot_mesh()
    out_pl = jax.device_get(shard_rounds(fn_pl, mesh)(make_key(5)))
    out_xla = jax.device_get(shard_rounds(fn_xla, mesh)(make_key(5)))
    for k in ("z_err", "x_err", "any_err", "z_conv", "x_conv"):
        assert np.array_equal(out_pl[k], out_xla[k]), k
    assert int(out_pl["any_err_count"]) == int(out_pl["any_err"].sum())


def test_distributed_init_noop_without_env(monkeypatch):
    """Without QLDPC_COORDINATOR the guarded jax.distributed entry must be
    a no-op returning False (single-process runs need no configuration)."""
    from qldpc_tpu.parallel.mesh import distributed_init_from_env
    monkeypatch.delenv("QLDPC_COORDINATOR", raising=False)
    assert distributed_init_from_env() is False
