"""Native (C++) host-side runtime pieces, loaded via ctypes.

The reference's native layer is its three CUDA submodules (SURVEY.md
C20-C22). The two rasterizers become Pallas TPU kernels here; simple-knn's
host-side counterpart lives in knn.cpp (grid-hash exact kNN, threaded) and
is built on demand with g++ — no pybind11/pip needed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "knn.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "libwheat3dgs_knn.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        if not os.path.exists(_OUT) or (
                os.path.getmtime(_OUT) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _OUT, _SRC,
                   "-pthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except Exception:
                _BUILD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_OUT)
            lib.knn_mean_sq_dist.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.knn_mean_sq_dist.restype = None
            _LIB = lib
        except OSError:
            _BUILD_FAILED = True
        return _LIB


def available() -> bool:
    return _load() is not None


def knn_mean_sq_dist(points: np.ndarray, k: int = 3,
                     n_threads: int = 0) -> np.ndarray:
    """Exact mean squared distance to the k nearest neighbours (native)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native knn library unavailable (g++ build failed)")
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    out = np.empty(n, np.float32)
    lib.knn_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return out
