"""ctypes bindings for native distortion metrics (pc_error equivalent)."""

from __future__ import annotations

import ctypes

import numpy as np

from scp_tpu.native.build import load_library

_CONFIGURED = False


def _lib():
    global _CONFIGURED
    lib = load_library()
    if lib is None:
        return None
    if not _CONFIGURED:
        lib.pc_mse_directional.restype = None
        lib.pc_mse_directional.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.pc_mean_nn_dist.restype = ctypes.c_double
        lib.pc_mean_nn_dist.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.pc_knn.restype = None
        lib.pc_knn.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        _CONFIGURED = True
    return lib


def available() -> bool:
    return _lib() is not None


def _c3(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


def mse_directional(a, b, normals=None, normal_of_nn=False):
    """(mse_d1, mse_d2) for direction a -> b."""
    lib = _lib()
    a, b = _c3(a), _c3(b)
    out = np.zeros(2, dtype=np.float64)
    nrm_ptr = None
    if normals is not None:
        normals = _c3(normals)
        nrm_ptr = normals.ctypes.data_as(ctypes.c_void_p)
    lib.pc_mse_directional(
        a.ctypes.data_as(ctypes.c_void_p),
        a.shape[0],
        b.ctypes.data_as(ctypes.c_void_p),
        b.shape[0],
        nrm_ptr,
        1 if normal_of_nn else 0,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return float(out[0]), float(out[1])


def mean_nn_dist(a, b) -> float:
    lib = _lib()
    a, b = _c3(a), _c3(b)
    return float(
        lib.pc_mean_nn_dist(
            a.ctypes.data_as(ctypes.c_void_p),
            a.shape[0],
            b.ctypes.data_as(ctypes.c_void_p),
            b.shape[0],
        )
    )


def knn(points, queries, k: int) -> np.ndarray:
    lib = _lib()
    points, queries = _c3(points), _c3(queries)
    out = np.empty((queries.shape[0], k), dtype=np.int64)
    lib.pc_knn(
        points.ctypes.data_as(ctypes.c_void_p),
        points.shape[0],
        queries.ctypes.data_as(ctypes.c_void_p),
        queries.shape[0],
        k,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
