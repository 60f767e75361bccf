"""EHEM level-wavefront codec: chunked two-phase encode, batched decode.

Encode (reference compress_ehem, encode.py:85-160): per octree level, per
8192-node chunk, group-1 (even) probabilities then group-2 (odd); the
bitstream symbol order IS that emission order (the reference builds an
explicit coding_order permutation, encode.py:128-136 — here probabilities
are emitted directly in coding order).

Decode (reference decode_ehem.py:56-188): expand all children of the
previous level in vectorized form, chunk like the encoder, two-phase model
calls, and batched AC decode (one native call per phase instead of the
reference's per-symbol pybind loop, numpyAc.py:163-169).

Bit-exactness contract: the encoder runs the SAME two jitted programs
(phase 1, phase 2) as the decoder, on identically padded bucket-shaped
inputs, with one shared host-side softmax — so the CDFs the decoder derives
are bit-identical to the encoder's and the range coder stays in sync.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from scp_tpu import ac
from scp_tpu.codec.slices import (
    LevelSlices,
    bucket_for,
    normalize_positions,
    pad_rows,
    softmax_np,
    split_levels,
)
from scp_tpu.core.octree import occupancy_to_child_octants
from scp_tpu.models.ehem import EHEM


class EHEMCodec:
    def __init__(self, model: EHEM, variables: dict, context_size: int = 8192):
        self.model = model
        self.variables = variables
        self.context_size = context_size
        # Variables are runtime arguments (not closure constants) so the
        # params stay device-resident buffers instead of HLO constants.
        self._phase1_fn = jax.jit(
            lambda v, d, p: model.apply(v, d, p, method=EHEM.decode_phase1)
        )
        self._phase2_fn = jax.jit(
            lambda v, f1, f2, occ1: model.apply(
                v, f1, f2, occ1, False, method=EHEM.decode_phase2
            )
        )

    def _phase1(self, d, p):
        return self._phase1_fn(self.variables, d, p)

    def _phase2(self, f1, f2, occ1, trim):
        del trim
        return self._phase2_fn(self.variables, f1, f2, occ1)

    # -- shared per-chunk model driver -------------------------------------

    def _chunk_probs_phase1(self, data_c, pos_c, m):
        b = bucket_for(m, self.context_size)
        dpad, ppad = pad_rows(data_c, pos_c, b)
        logits1, f1, f2 = self._phase1(dpad[None], ppad[None])
        n1 = (m + 1) // 2
        p1 = softmax_np(np.asarray(logits1)[0, :n1])
        return p1, f1, f2, b

    def _chunk_probs_phase2(self, f1, f2, evens_occ, m, b):
        n2 = m // 2
        if n2 == 0:
            return np.zeros((0, 255))
        occ_pad = np.full(b // 2, 255, np.int32)
        occ_pad[: evens_occ.shape[0]] = evens_occ
        logits2 = self._phase2(f1, f2, occ_pad[None], False)
        return softmax_np(np.asarray(logits2)[0, :n2])

    # -- encode -------------------------------------------------------------

    def encode(self, slices: LevelSlices):
        """-> (pdf_rows list, sym_rows list, model_seconds). The caller
        range-codes the concatenated rows (they are in coding order)."""
        csz = self.context_size
        pdfs, syms = [], []
        elapsed = 0.0
        for li in range(slices.num_levels):
            d = slices.data[li]
            pos = slices.level_pos(li)
            occ = d[:, -1, 2].astype(np.int16)
            for start in range(0, d.shape[0], csz):
                dc = d[start : start + csz]
                pc = pos[start : start + csz]
                oc = occ[start : start + csz]
                m = dc.shape[0]
                t0 = time.time()
                p1, f1, f2, b = self._chunk_probs_phase1(dc, pc, m)
                p2 = self._chunk_probs_phase2(f1, f2, oc[::2].astype(np.int32), m, b)
                elapsed += time.time() - t0
                pdfs.append(p1)
                syms.append(oc[::2])
                if p2.shape[0]:
                    pdfs.append(p2)
                    syms.append(oc[1::2])
        return pdfs, syms, elapsed

    def encode_to_stream(self, slices: LevelSlices):
        pdfs, syms, elapsed = self.encode(slices)
        pdf = np.concatenate(pdfs, axis=0)
        sym = np.concatenate(syms, axis=0)
        stream, bits = ac.ArithmeticEncoder().encode(pdf, sym)
        return stream, bits, elapsed

    # -- decode -------------------------------------------------------------

    def decode(
        self,
        dec: ac.ArithmeticDecoder,
        max_level: int,
        pos_mm: np.ndarray,
        angular: bool,
        lidar_clip: int | None = None,
        ground_truth: np.ndarray | None = None,
    ) -> np.ndarray:
        """Wavefront decode one octree from an open AC decoder.

        pos_mm: (max_level, 2) per-level (min, max) of current-node grid
        positions (ignored when not angular). Returns occupancies 0..254 in
        BFS order.  `ground_truth` (0..254) enables the reference's
        decode-time assert (decode_ehem.py:184).
        """
        csz = self.context_size
        clip = lidar_clip if lidar_clip is not None else np.iinfo(np.int32).max

        # Root context: 3 missing-ancestor rows + self (level 1, octant 1).
        anc = np.zeros((1, 3, 3), np.int32)
        anc[:, :, 2] = 255
        root_row = np.array([[1, 1, 255]], np.int32)
        data = np.concatenate([anc, root_row[:, None]], axis=1)  # (1, 4, 3)
        pos_int = np.zeros((1, 3), np.int64)

        codes: list[np.ndarray] = []
        decoded = 0
        for level in range(1, max_level + 1):
            n = data.shape[0]
            mm = tuple(pos_mm[level - 1]) if angular else (0, 0)
            pos = normalize_positions(pos_int, mm, max_level, angular)
            level_occ = np.empty(n, np.int32)
            for start in range(0, n, csz):
                dc = data[start : start + csz].copy()
                dc[:, :, 0] = np.minimum(dc[:, :, 0], clip)  # level channel only
                pc = pos[start : start + csz]
                m = dc.shape[0]
                p1, f1, f2, b = self._chunk_probs_phase1(dc, pc, m)
                evens = dec.decode_batch(p1).astype(np.int32)
                p2 = self._chunk_probs_phase2(f1, f2, evens, m, b)
                if p2.shape[0]:
                    odds = dec.decode_batch(p2).astype(np.int32)
                else:
                    odds = np.zeros(0, np.int32)
                chunk_occ = np.empty(m, np.int32)
                chunk_occ[0::2] = evens
                chunk_occ[1::2] = odds
                level_occ[start : start + m] = chunk_occ
                if ground_truth is not None:
                    want = ground_truth[decoded : decoded + m]
                    got = chunk_occ.astype(np.int16)
                    assert (want == got).all(), (
                        f"decode mismatch at level {level} nodes "
                        f"{decoded}..{decoded + m}"
                    )
                decoded += m
            codes.append(level_occ.astype(np.int16))
            if level == max_level:
                break
            data, pos_int = _expand_children(data, pos_int, level_occ, level + 1, max_level)
        return np.concatenate(codes)


def _expand_children(data, pos_int, level_occ, child_level, max_level):
    """Vectorized wavefront expansion (reference decode_ehem.py:113-145).

    data: (n, 4, 3) current-level contexts with occ channel now filled;
    returns (m, 4, 3) child contexts (occ unknown) + (m, 3) grid positions.
    """
    filled = data.copy()
    filled[:, -1, 2] = level_occ
    pidx, octant = occupancy_to_child_octants(level_occ + 1)
    child_anc = filled[pidx][:, 1:, :]  # (m, 3, 3): [gp, p, self-as-parent]
    m = pidx.shape[0]
    self_row = np.zeros((m, 1, 3), np.int32)
    self_row[:, 0, 0] = child_level
    self_row[:, 0, 1] = octant + 1
    self_row[:, 0, 2] = 255
    child_data = np.concatenate([child_anc, self_row], axis=1)

    unit = np.int64(1) << np.int64(max_level - child_level + 1)
    bits = np.stack(
        [(octant >> 2) & 1, (octant >> 1) & 1, octant & 1], axis=1
    ).astype(np.int64)
    child_pos = pos_int[pidx] + bits * unit
    return child_data, child_pos


def encode_context_array(
    codec: EHEMCodec, ctx: np.ndarray, angular: bool, lidar_clip: int | None = None
):
    """Convenience: raw (N, 4, 6) shard -> (stream, bits, slices, seconds)."""
    slices = split_levels(ctx, angular=angular, lidar_level_clip=lidar_clip)
    stream, bits, elapsed = codec.encode_to_stream(slices)
    return stream, bits, slices, elapsed
