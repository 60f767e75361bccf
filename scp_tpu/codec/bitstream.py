"""Bitstream container: header + range-coder payload.

The reference smuggles decode metadata through the output FILENAME
(`_<levels>_<bin_num>_<z_offset>.bin`, reference encode.py:140-144) plus a
torch-saved `.dat` sidecar of per-level position extrema (encode.py:150).
Here the stream is self-contained: a small binary header carries everything
the decoder needs; the reference-compatible filename is still produced by
the CLI for drop-in workflows.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

_MAGIC = b"SCPT"
_VERSION = 4


@dataclasses.dataclass
class StreamHeader:
    n_sym: int  # arithmetic-coder steps (2 per node in "staged" mode)
    max_level: int
    system: str  # "cart" | "cylin" | "spher"
    bin_num: int
    z_offset: float
    lidar_clip: int
    qs_rho: float
    pos_mm: np.ndarray  # (L, 2) int64 per-level (min, max); empty for cart
    subtree_sizes: tuple = ()  # node counts per subtree (multi-level mode)
    coding_mode: str = "rans"  # entropy coding ("rans" | "staged" | "full")
    backend: str = ""  # XLA backend that produced the stream (determinism
    # contract: decoding must run the same compiled programs — see
    # scp_tpu/codec/ehem_codec.py module docstring)
    coding_params: str = ""  # every knob that changes the compiled phase
    # programs' float math (knn recall, pallas-attn, group batching);
    # decode refuses a mismatch the same way it refuses a backend change

    @property
    def angular(self) -> bool:
        return self.system in ("cylin", "spher")


_SYSTEMS = ["cart", "cylin", "spher"]
_MODES = ["full", "staged", "rans"]


def pack_stream(header: StreamHeader, payload: bytes) -> bytes:
    mm = np.asarray(header.pos_mm, dtype=np.int64).reshape(-1, 2)
    sub = np.asarray(header.subtree_sizes, dtype=np.int64)
    backend = header.backend.encode()[:12].ljust(12, b"\0")
    params = header.coding_params.encode()[:255]
    head = struct.pack(
        "<4sHQHBIdhdHHB12sB",
        _MAGIC,
        _VERSION,
        header.n_sym,
        header.max_level,
        _SYSTEMS.index(header.system),
        header.bin_num,
        header.z_offset,
        header.lidar_clip,
        header.qs_rho,
        mm.shape[0],
        sub.shape[0],
        _MODES.index(header.coding_mode),
        backend,
        len(params),
    )
    return head + params + mm.tobytes() + sub.tobytes() + payload


def unpack_stream(blob: bytes) -> tuple[StreamHeader, bytes]:
    fmt = "<4sHQHBIdhdHHB12sB"
    size = struct.calcsize(fmt)
    (
        magic, ver, n_sym, max_level, sys_i, bin_num, z_off, clip, qs_rho,
        n_mm, n_sub, mode_i, backend, n_params,
    ) = struct.unpack(fmt, blob[:size])
    if magic != _MAGIC:
        raise ValueError("not an scp_tpu bitstream")
    if ver != _VERSION:
        raise ValueError(f"unsupported stream version {ver}")
    off = size
    params = blob[off : off + n_params].decode()
    off += n_params
    mm = np.frombuffer(blob[off : off + 16 * n_mm], dtype=np.int64).reshape(n_mm, 2)
    off += 16 * n_mm
    sub = np.frombuffer(blob[off : off + 8 * n_sub], dtype=np.int64)
    off += 8 * n_sub
    header = StreamHeader(
        n_sym=n_sym,
        max_level=max_level,
        system=_SYSTEMS[sys_i],
        bin_num=bin_num,
        z_offset=z_off,
        lidar_clip=clip,
        qs_rho=qs_rho,
        pos_mm=mm.copy(),
        subtree_sizes=tuple(int(s) for s in sub),
        coding_mode=_MODES[mode_i],
        backend=backend.rstrip(b"\0").decode(),
        coding_params=params,
    )
    return header, blob[off:]


def reference_style_name(stem: str, system: str, max_level: int, bin_num: int, z_offset: int) -> str:
    """`<stem>[_spher|_cylin]_<levels>_<bin_num>_<z_offset>.bin`
    (reference encode.py:140-144)."""
    tag = {"spher": "_spher", "cylin": "_cylin", "cart": ""}[system]
    return f"{stem}{tag}_{max_level}_{bin_num}_{int(z_offset)}.bin"
