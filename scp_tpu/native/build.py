"""On-demand g++ build of the native runtime library.

The library is compiled once per source hash into
`~/.cache/scp_tpu/` (override with SCP_TPU_CACHE) and loaded via ctypes.
No torch / pybind11 dependency: plain C ABI.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_FAILED = False

_SOURCES = ["ac.cpp", "octree.cpp", "metrics.cpp"]
_CXXFLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-march=native", "-fopenmp"]


def _cache_dir() -> str:
    d = os.environ.get(
        "SCP_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu")
    )
    os.makedirs(d, exist_ok=True)
    return d


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _SOURCES:
        with open(os.path.join(_SRC_DIR, s), "rb") as f:
            h.update(f.read())
    h.update(" ".join(_CXXFLAGS).encode())
    return h.hexdigest()[:16]


def load_library() -> ctypes.CDLL | None:
    """Compile (if needed) and load the native library; None on failure."""
    global _LIB, _FAILED
    if _LIB is not None:
        return _LIB
    if _FAILED or os.environ.get("SCP_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so_path = os.path.join(_cache_dir(), f"libscp_native_{_source_hash()}.so")
        if not os.path.exists(so_path):
            srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
            tmp = so_path + ".tmp"
            cmd = ["g++", *_CXXFLAGS, "-o", tmp, *srcs]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=300)
                os.replace(tmp, so_path)
            except Exception as e:  # toolchain missing / compile error
                _FAILED = True
                import warnings

                msg = getattr(e, "stderr", b"")
                if isinstance(msg, bytes):
                    msg = msg.decode(errors="replace")[-2000:]
                warnings.warn(
                    f"scp_tpu native build failed, using Python fallbacks: {e}\n{msg}"
                )
                return None
        try:
            _LIB = ctypes.CDLL(so_path)
        except OSError as e:
            _FAILED = True
            import warnings

            warnings.warn(f"scp_tpu native load failed: {e}")
            return None
        return _LIB
