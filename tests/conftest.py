"""Test configuration: run all JAX tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use XLA's
host-platform device virtualization instead (SURVEY.md §4 test strategy).
Must be set before jax is imported anywhere.
"""
import os
import sys

# A TPU sitecustomize plugin (axon) may register JAX backends at interpreter
# start, locking the device configuration before conftest can set it. Re-exec
# pytest once with a clean environment: plugin disabled, CPU platform, 8
# virtual devices for the simulated mesh.
if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        os.environ.get("QLDPC_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env.update(
        QLDPC_TEST_REEXEC="1",
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(env.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8").strip(),
    )
    import subprocess
    sys.stdout.flush()
    sys.stderr.flush()
    ret = subprocess.call([sys.executable, "-m", "pytest"] + sys.argv[1:],
                          env=env)
    os._exit(ret)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "matrix_cache"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference goldens not mounted")


@pytest.fixture(scope="session")
def ref_code_npz():
    """Loader for the reference's code data files (golden comparisons)."""
    def load(name):
        return np.load(os.path.join(REFERENCE_DIR, "codes", f"{name}.npz"))
    return load


@pytest.fixture(scope="session")
def ref_matrix_cache():
    """Loader for a reference decoding-matrix golden, keyed like the
    reference cache (sha256 of matrices + cycles + rate, first 16 hex —
    reference src/utils/caching.py:6-11)."""
    import hashlib

    def load(Hx, Hz, Lx, Lz, num_cycles, error_rate):
        h = hashlib.sha256()
        for a in [Hx, Hz, Lx, Lz]:
            h.update(np.asarray(a).tobytes())
        h.update(str(num_cycles).encode())
        h.update(f"{error_rate:.6f}".encode())
        path = os.path.join(REFERENCE_DIR, "matrix_cache",
                            f"matrices_{h.hexdigest()[:16]}.npz")
        if not os.path.exists(path):
            return None
        return np.load(path)
    return load
