"""Content-hash decoding-matrix cache, file-compatible with the reference.

Same key derivation and npz layout as reference src/utils/caching.py:6-42
(sha256 over Hx|Hz|Lx|Lz bytes + num_cycles + rate, 16-hex key,
``matrices_<key>.npz``), extended with the sampler-metadata arrays this
framework adds. A cache file written by the reference loads fine — the
engine back-fills the missing metadata (parallel/engine.py
ensure_sampler_metadata).
"""
from __future__ import annotations

import hashlib
import os
from typing import Any, Dict, Optional

import numpy as np

_INT_KEYS = ("first_logical_rowZ", "first_logical_rowX", "num_cycles", "k")


def compute_cache_key(Hx, Hz, Lx, Lz, num_cycles, error_rate) -> str:
    hasher = hashlib.sha256()
    for arr in [Hx, Hz, Lx, Lz]:
        hasher.update(np.asarray(arr).tobytes())
    hasher.update(str(num_cycles).encode())
    hasher.update(f"{error_rate:.6f}".encode())
    return hasher.hexdigest()[:16]


def save_matrices(cache_dir: str, cache_key: str, matrices: Dict) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"matrices_{cache_key}.npz")
    payload = {}
    for k, v in matrices.items():
        payload[k] = np.asarray([v]) if k in _INT_KEYS else np.asarray(v)
    np.savez_compressed(path, **payload)
    return path


def load_matrices(cache_dir: str, cache_key: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(cache_dir, f"matrices_{cache_key}.npz")
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path)
        out: Dict[str, Any] = {}
        for k in data.files:
            out[k] = int(data[k][0]) if k in _INT_KEYS else data[k]
        return out
    except Exception:
        return None
