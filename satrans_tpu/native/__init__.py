"""Native (C++/OpenMP) host-side batch assembly, loaded via ctypes.

Builds ``batcher.cpp`` into a shared library on first import (cached next to
the source); falls back to numpy implementations when no compiler is
available.  Public API:

* :func:`gather_rows(src, idx)`            -> ``src[idx]`` (2-D, any dtype)
* :func:`gather_columns(cols, idx)`        -> packed ``[B, n_cols]`` batch
  from per-column 1-D arrays (the hot op of the input pipeline)
* :func:`shuffle_indices(n, seed)`         -> shuffled ``arange(n)``
* :data:`AVAILABLE`                         -> True when the native lib loaded
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batcher.cpp")
_LIB_PATH = os.path.join(_HERE, "_batcher.so")

_lib = None


def _build() -> str | None:
    if os.path.exists(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        try:  # without -march=native / openmp as a fallback
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC,
                            "-o", _LIB_PATH],
                           check=True, capture_output=True, timeout=120)
            return _LIB_PATH
        except Exception:
            return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.gather_rows.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_int64]
    lib.gather_columns_i32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64]
    lib.gather_columns_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64]
    lib.shuffle_indices.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_uint64]
    lib.omp_thread_count.restype = ctypes.c_int
    _lib = lib
    return lib


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Parallel ``src[idx]`` for a 2-D contiguous array."""
    lib = _load()
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None or src.ndim != 2:
        return src[idx]
    out = np.empty((len(idx), src.shape[1]), dtype=src.dtype)
    lib.gather_rows(src.ctypes.data, idx.ctypes.data, out.ctypes.data,
                    len(idx), src.shape[1] * src.itemsize)
    return out


def gather_columns(cols: list[np.ndarray], idx: np.ndarray,
                   dtype=np.int32) -> np.ndarray:
    """Packed ``[B, n_cols]`` gather from per-column 1-D arrays."""
    lib = _load()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    dtype = np.dtype(dtype)
    if dtype not in (np.dtype(np.int32), np.dtype(np.float32)):
        raise TypeError(f"gather_columns supports int32/float32, got {dtype}")
    if lib is None:
        return np.stack([np.asarray(c)[idx] for c in cols], axis=1
                        ).astype(dtype)
    arrs = [np.ascontiguousarray(c, dtype=dtype) for c in cols]
    ptrs = (ctypes.c_void_p * len(arrs))(
        *[a.ctypes.data for a in arrs])
    out = np.empty((len(idx), len(arrs)), dtype=dtype)
    fn = lib.gather_columns_i32 if dtype == np.int32 else \
        lib.gather_columns_f32
    fn(ptrs, len(arrs), idx.ctypes.data, out.ctypes.data, len(idx))
    return out


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    lib = _load()
    idx = np.arange(n, dtype=np.int64)
    if lib is None:
        return np.random.default_rng(seed).permutation(n)
    lib.shuffle_indices(idx.ctypes.data, n, ctypes.c_uint64(seed))
    return idx


def available() -> bool:
    return _load() is not None
