"""Install a no-op `numba` module so the reference code imports without numba.

The environment has no numba; the reference's @njit kernels are plain Python
under the decorator, so an identity `njit` lets them run (slowly) as a
ground-truth oracle. Used only by scripts/ler_oracle.py — never by the
framework itself.
"""
import sys
import types


def install():
    if "numba" in sys.modules:
        return sys.modules["numba"]
    numba = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        def deco(fn):
            return fn
        return deco

    numba.njit = njit
    numba.jit = njit
    numba.prange = range
    sys.modules["numba"] = numba
    return numba
