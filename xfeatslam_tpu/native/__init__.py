"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime is C++ (map graph, extractor internals); the compute
path here is JAX/XLA, and the branchy host-side helpers that profile hot are
implemented in C++ with Python fallbacks. Built on first use with g++ (baked
into the image); no pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "quadtree.cpp")
    out = os.path.join(_HERE, "_native.so")
    # Always rebuild from source on first use of a fresh process unless the
    # artifact is demonstrably newer than the source AND was produced by this
    # checkout (a stamp file records the source mtime it was built from) —
    # a checked-out prebuilt .so would otherwise shadow the reviewable code.
    stamp = out + ".stamp"
    src_mtime = os.path.getmtime(src)
    if (os.path.exists(out) and os.path.exists(stamp)):
        try:
            if float(open(stamp).read().strip()) == src_mtime:
                return out
        except (ValueError, OSError):
            pass
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
        with open(stamp, "w") as f:
            f.write(str(src_mtime))
        return out
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.quadtree_select.restype = ctypes.c_int
            lib.quadtree_select.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def quadtree_select(kpts: np.ndarray, scores: np.ndarray, n_target: int,
                    bounds) -> Optional[np.ndarray]:
    """Native DistributeOctTree; returns None if the library is unavailable
    (callers fall back to the Python implementation)."""
    lib = get_lib()
    if lib is None:
        return None
    kpts = np.ascontiguousarray(kpts, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(kpts)
    out = np.empty(max(n_target * 4, 16), np.int32)
    x0, y0, x1, y1 = bounds
    m = lib.quadtree_select(
        kpts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, n_target,
        ctypes.c_float(x0), ctypes.c_float(y0),
        ctypes.c_float(x1), ctypes.c_float(y1),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(out),
    )
    return out[:m].astype(np.int64)
