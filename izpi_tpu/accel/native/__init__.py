"""ctypes loader for the native BVH4 builder (bvh4.cc).

Compiles the shared library on demand with g++ (cached beside the source);
falls back silently to the numpy builder when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "bvh4.cc")
_LIB = os.path.join(_DIR, "libizpibvh.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB)
        fn = lib.izpi_build_bvh4
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build(bb_min: np.ndarray, bb_max: np.ndarray, seed: int,
          leaf_size: int = 4, method: str = "median"):
    """Native build. Returns (bounds, child, count, prim_order) numpy arrays
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = bb_min.shape[0]
    bb_min = np.ascontiguousarray(bb_min, np.float64)
    bb_max = np.ascontiguousarray(bb_max, np.float64)
    max_nodes = max(4, n)
    bounds = np.zeros((max_nodes, 24), np.float32)
    child = np.zeros((max_nodes, 4), np.int32)
    count = np.zeros((max_nodes, 4), np.int32)
    order = np.zeros(n, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n_nodes = lib.izpi_build_bvh4(
        ptr(bb_min, ctypes.c_double), ptr(bb_max, ctypes.c_double),
        n, seed,
        ptr(bounds, ctypes.c_float), ptr(child, ctypes.c_int32),
        ptr(count, ctypes.c_int32), ptr(order, ctypes.c_int32),
        max_nodes, leaf_size, 1 if method == "sah" else 0,
    )
    if n_nodes < 0:
        return None
    return (bounds[:n_nodes].copy(), child[:n_nodes].copy(),
            count[:n_nodes].copy(), order)
