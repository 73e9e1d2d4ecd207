"""ctypes bindings for the native indexing library (auto-built, gated).

Loads libindexing.so if present (or buildable via `make`); callers fall
back to the vectorized-numpy path when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["native_create_indices", "native_window_rows", "NATIVE_AVAILABLE"]

_DIR = Path(__file__).resolve().parent
_LIB: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _DIR / "libindexing.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=60)
        except Exception:
            return None
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.count_indices.restype = ctypes.c_int64
    lib.count_indices.argtypes = [i64p] + [ctypes.c_int64] * 4
    lib.create_indices.restype = ctypes.c_int64
    lib.create_indices.argtypes = [i64p] + [ctypes.c_int64] * 4 + [i64p]
    lib.window_rows.restype = None
    lib.window_rows.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    _LIB = lib
    return lib


NATIVE_AVAILABLE = _load() is not None


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_create_indices(episode_ends: np.ndarray, sequence_length: int,
                          pad_before: int = 0, pad_after: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    ends = np.ascontiguousarray(episode_ends, np.int64)
    n = lib.count_indices(_i64p(ends), len(ends), sequence_length, pad_before, pad_after)
    out = np.empty((max(n, 0), 4), np.int64)
    if n > 0:
        lib.create_indices(_i64p(ends), len(ends), sequence_length, pad_before,
                           pad_after, _i64p(out))
    return out


def native_window_rows(indices: np.ndarray, sequence_length: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    idx = np.ascontiguousarray(indices, np.int64)
    out = np.empty((len(idx), sequence_length), np.int64)
    lib.window_rows(_i64p(idx), len(idx), sequence_length, _i64p(out))
    return out
