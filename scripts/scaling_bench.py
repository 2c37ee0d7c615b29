"""Weak-scaling efficiency of the sharded decode round over a device mesh.

On a real pod this measures ICI/DCN scaling of the shot-sharded round
(target: >=90% to 2 hosts, BASELINE.md). Without multi-chip hardware it
runs on virtual CPU devices, which validates the mechanism (per-device RNG
decorrelation, shard_map lowering, flag gathering) but NOT interconnect
performance — shot-axis data parallelism has no inter-device communication
inside a round, so hardware scaling is expected to be near-linear.

Usage: python scripts/scaling_bench.py [--devices 1 2 4 8]
"""
import argparse
import os
import sys
import time

if ("--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS", "") in
        ("", "axon")) and os.environ.get("QLDPC_SCALE_REEXEC") != "1":
    # Virtual-device scaling needs the host platform, and the TPU plugin's
    # sitecustomize locks the device config at interpreter start — re-exec
    # with a clean environment (same trick as tests/conftest.py).
    env = dict(os.environ)
    env.update(QLDPC_SCALE_REEXEC="1", PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=(env.get("XLA_FLAGS", "") +
                          " --xla_force_host_platform_device_count=8"))
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from qldpc_tpu import SyndromeCircuit, build_decoding_matrices, get_code
from qldpc_tpu.ops.bp import alpha_schedule
from qldpc_tpu.parallel.engine import _make_basis, make_key, make_round_fn
from qldpc_tpu.parallel.mesh import shard_rounds, shot_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="*", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--code", default="[[72, 12, 6]]")
    ap.add_argument("--batch", type=int, default=64, help="shots per device")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    code = get_code(args.code)
    circ = SyndromeCircuit(code, num_cycles=code.distance)
    M = build_decoding_matrices(circ, code.Lx, code.Lz, 0.005)
    seq = alpha_schedule("dynamical", 10)
    dz = _make_basis(circ, M, "Z", seq, osd_order=1)
    dx = _make_basis(circ, M, "X", seq, osd_order=1)
    fn = make_round_fn(dz, dx, circ.num_error_locs, 0.005, args.batch,
                       10, 1)
    key = make_key(0)
    base_rate = None
    print(f"{args.code} batch/device={args.batch} "
          f"(platform={jax.default_backend()}, "
          f"{len(jax.devices())} devices visible)")
    for nd in args.devices:
        if nd > len(jax.devices()):
            break
        mesh = shot_mesh(jax.devices()[:nd]) if nd > 1 else None
        sharded = shard_rounds(jax.jit(fn), mesh)
        jax.block_until_ready(sharded(key))  # compile
        t0 = time.time()
        reps = 3
        for r in range(reps):
            jax.block_until_ready(sharded(jax.random.fold_in(key, r)))
        dt = (time.time() - t0) / reps
        rate = args.batch * nd / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(f"devices={nd}: {rate:10.1f} shots/s  "
              f"weak-scaling efficiency {eff:6.1%}")


if __name__ == "__main__":
    main()
