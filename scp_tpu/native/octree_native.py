"""ctypes bindings for the native single-pass octree builder."""

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
        lib.octree_build.restype = ctypes.c_void_p
        lib.octree_build.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        lib.octree_num_nodes.restype = ctypes.c_int64
        lib.octree_num_nodes.argtypes = [ctypes.c_void_p]
        lib.octree_fill.restype = None
        lib.octree_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        lib.octree_free.restype = None
        lib.octree_free.argtypes = [ctypes.c_void_p]
        _CONFIGURED = True
    return lib


def available() -> bool:
    return _lib() is not None


def build_from_keys(keys: np.ndarray, bits: int):
    """Sorted unique uint64 Morton keys -> OctreeArrays (see core.octree)."""
    from scp_tpu.core.octree import OctreeArrays

    lib = _lib()
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    h = lib.octree_build(keys.ctypes.data_as(ctypes.c_void_p), keys.shape[0], bits)
    try:
        n = lib.octree_num_nodes(h)
        occ = np.empty(n, dtype=np.int32)
        level = np.empty(n, dtype=np.int32)
        octant = np.empty(n, dtype=np.int32)
        parent = np.empty(n, dtype=np.int64)
        pos = np.empty((n, 3), dtype=np.int64)
        level_starts = np.empty(bits + 1, dtype=np.int64)
        lib.octree_fill(
            h,
            occ.ctypes.data_as(ctypes.c_void_p),
            level.ctypes.data_as(ctypes.c_void_p),
            octant.ctypes.data_as(ctypes.c_void_p),
            parent.ctypes.data_as(ctypes.c_void_p),
            pos.ctypes.data_as(ctypes.c_void_p),
            level_starts.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.octree_free(h)
    return OctreeArrays(
        occupancy=occ,
        level=level,
        octant=octant,
        parent=parent,
        pos=pos,
        level_starts=level_starts,
        max_level=bits,
    )
