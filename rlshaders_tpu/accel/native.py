"""ctypes binding for the native C++ BVH builder (accel/csrc/accel.cpp).

Compiled on demand into the package directory; the Python/NumPy builder in
accel/bvh.py is the behavioral reference and automatic fallback. Both emit
the identical flattened skip-link layout, so the traversal kernels don't
care which built the tree.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "accel.cpp")
_LIB = os.path.join(_HERE, "csrc", "libaccel.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.rls_build_bvh.restype = ctypes.c_int
        lib.rls_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float)] * 3 + [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_arrays(v0, e1, e2, leaf_size: int, n_bins: int):
    """Run the native builder; returns the flattened BVH arrays or None."""
    lib = _load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    t = v0.shape[0]
    max_nodes = 2 * t + 2
    bbox_min = np.empty((max_nodes, 3), np.float32)
    bbox_max = np.empty((max_nodes, 3), np.float32)
    first = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    miss = np.empty(max_nodes, np.int32)
    order = np.empty(t, np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n_nodes = lib.rls_build_bvh(
        v0.ctypes.data_as(fp), e1.ctypes.data_as(fp), e2.ctypes.data_as(fp),
        t, leaf_size, n_bins,
        bbox_min.ctypes.data_as(fp), bbox_max.ctypes.data_as(fp),
        first.ctypes.data_as(ip), count.ctypes.data_as(ip),
        miss.ctypes.data_as(ip), order.ctypes.data_as(ip),
        max_nodes,
    )
    if n_nodes <= 0:
        return None
    return (
        bbox_min[:n_nodes], bbox_max[:n_nodes], first[:n_nodes],
        count[:n_nodes], miss[:n_nodes], order,
    )
