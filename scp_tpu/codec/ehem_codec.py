"""EHEM wavefront codec — TPU-first, level-major, batched.

What the reference does (compress_ehem encode.py:85-160, decode_ehem.py
:56-188): per octree level, per 8192-node chunk, run the model, emit
group-1 (even) then group-2 (odd) probabilities, with the decoder calling
the arithmetic coder once PER SYMBOL through Python.

What this does instead (same model semantics, bitstream order re-designed
for the hardware):

  * Coding order is LEVEL-MAJOR: all group-1 symbols of a level (chunk
    order), then all group-2 symbols.  This turns decoding into
      phase-1 for every chunk of the level (batched device calls)
      -> ONE batched AC decode of all group-1 symbols
      -> phase-2 for every chunk (batched, keyed by decoded group-1)
      -> ONE batched AC decode of all group-2 symbols,
    i.e. 2 device dispatches x ceil(chunks/G) and 2 native AC calls per
    level, instead of 2 dispatches + 2 Python AC loops per chunk.
  * Full 8192-node chunks are stacked on the batch axis (groups of
    `group_size`), so the MXU sees (G*8192, ...) matmuls.
  * Every shape is a power-of-two bucket -> a handful of XLA programs.
  * The encoder runs the SAME two jitted programs as the decoder on
    identically padded inputs, and those programs emit the quantized CDF
    rows themselves — CDF agreement is structural, the range coder never
    desyncs.

The chunk-local checkerboard (even/odd within a chunk) is preserved, so
per-symbol probabilities — and therefore bpp — are identical to the
per-chunk ordering; only the stream permutation differs.
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
    split_levels,
)
from scp_tpu.core.octree import occupancy_to_child_octants
from scp_tpu.models.ehem import EHEM


def logits_to_cdf(logits):
    """Device-side softmax + 16-bit CDF quantization.

    float32 softmax/cumsum/scale + round-half-even + index ramp, mod 2^16
    (same construction as ac.quantize_cdf, in f32 end-to-end since TPUs
    have no f64); the uint16 rows feed the native coder directly."""
    import jax.numpy as jnp

    x = logits.astype(jnp.float32)
    x = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x)
    pdf = e / jnp.sum(e, axis=-1, keepdims=True)
    c = jnp.cumsum(pdf, axis=-1)
    c = c / c[..., -1:]
    zeros = jnp.zeros((*c.shape[:-1], 1), c.dtype)
    cdf = jnp.concatenate([zeros, c], axis=-1)
    lp = cdf.shape[-1]
    # float32 scale (TPU has no f64): monotone -> the +ramp keeps the rows
    # strictly increasing; encoder and decoder run this same program so the
    # rows agree bit-for-bit.
    scaled = cdf * jnp.float32(65536 - (lp - 1))
    q = jnp.round(scaled).astype(jnp.int32) + jnp.arange(lp, dtype=jnp.int32)
    return (q & 0xFFFF).astype(jnp.uint16)


def _with_cdf(outs):
    logits1, f1, f2 = outs
    return logits_to_cdf(logits1), f1, f2


class EHEMCodec:
    def __init__(
        self,
        model: EHEM,
        variables: dict,
        context_size: int = 8192,
        group_size: int | None = None,
    ):
        self.model = model
        # Pin params on device once: checkpoint-loaded variables are host
        # numpy arrays, and passing those to jit re-transfers every weight
        # on every call (10x decode slowdown observed over the TPU tunnel).
        self.variables = jax.device_put(variables)
        self.context_size = context_size
        if group_size is None:
            import os

            group_size = int(os.environ.get("SCP_CODEC_GROUP", 4))
        self.group_size = group_size
        # Variables are runtime arguments (not closure constants) so params
        # stay device buffers instead of HLO constants.
        #
        # CDF quantization happens ON DEVICE: the phase functions return
        # ready uint16 CDF rows (half the bytes of a float32 pdf over the
        # host link, no host softmax/cumsum, and encoder/decoder share the
        # same compiled program so the rows are bit-identical by
        # construction).
        self._phase1_fn = jax.jit(
            lambda v, d, p: _with_cdf(model.apply(v, d, p, method=EHEM.decode_phase1))
        )
        self._phase2_fn = jax.jit(
            lambda v, f1, f2, occ1: logits_to_cdf(
                model.apply(v, f1, f2, occ1, False, method=EHEM.decode_phase2)
            )
        )

    # ---- batched chunk drivers ------------------------------------------

    def _level_chunks(self, d, pos):
        """Split one level into chunk index ranges [(start, m), ...]."""
        csz = self.context_size
        n = d.shape[0]
        return [(s, min(csz, n - s)) for s in range(0, n, csz)]

    def _phase1_level(self, d, pos):
        """Run phase 1 for every chunk of a level.

        Returns (p1_rows_per_chunk, handles) where handles carry the device
        residuals (f1, f2) per batched call for phase 2.  Device dispatch is
        async; logits are fetched lazily per chunk.
        """
        csz = self.context_size
        chunks = self._level_chunks(d, pos)
        full = [(s, m) for (s, m) in chunks if m == csz]
        partial = [(s, m) for (s, m) in chunks if m < csz]

        calls = []  # (chunk_list, logits_dev, f1_dev, f2_dev, bucket)
        g = self.group_size
        for i in range(0, len(full), g):
            batch = full[i : i + g]
            # pad short final groups with dummy chunks: one compiled program
            # per (group_size, bucket) instead of one per batch size
            padded = batch + [batch[0]] * (g - len(batch)) if len(full) > g else batch
            db = np.stack([d[s : s + m] for s, m in padded])
            pb = np.stack([pos[s : s + m] for s, m in padded])
            logits1, f1, f2 = self._phase1_fn(self.variables, db, pb)
            calls.append((batch, logits1, f1, f2, csz))
        for s, m in partial:
            b = bucket_for(m, csz)
            dp, pp = pad_rows(d[s : s + m], pos[s : s + m], b)
            logits1, f1, f2 = self._phase1_fn(
                self.variables, dp[None], pp[None]
            )
            calls.append(([(s, m)], logits1, f1, f2, b))
        return calls

    def _phase1_probs(self, calls):
        """Fetch per-chunk group-1 quantized CDF rows in chunk order."""
        rows = {}
        for batch, cdf1, _f1, _f2, _b in calls:
            host = np.asarray(cdf1)
            for bi, (s, m) in enumerate(batch):
                rows[s] = host[bi, : (m + 1) // 2]
        return [rows[k] for k in sorted(rows)]

    def _phase2_dispatch(self, calls, evens_by_chunk):
        """Dispatch phase 2 for every chunk group (async)."""
        out = []
        for batch, _cdf1, f1, f2, b in calls:
            occ = np.full((f1.shape[0], b // 2), 255, np.int32)  # padded batch
            for bi, (s, m) in enumerate(batch):
                e = evens_by_chunk[s]
                occ[bi, : e.shape[0]] = e
            out.append((batch, self._phase2_fn(self.variables, f1, f2, occ)))
        return out

    def _phase2_fetch(self, dispatched):
        rows = {}
        for batch, cdf2 in dispatched:
            host = np.asarray(cdf2)
            for bi, (s, m) in enumerate(batch):
                if m // 2:
                    rows[s] = host[bi, : m // 2]
        return [rows[k] for k in sorted(rows)]

    def _phase2_level(self, calls, evens_by_chunk):
        """Run phase 2 for every chunk given its group-1 occupancies."""
        return self._phase2_fetch(self._phase2_dispatch(calls, evens_by_chunk))

    def warmup(self, slices: LevelSlices) -> int:
        """Compile every (batch, bucket) program this cloud will use.
        Returns the number of distinct programs touched."""
        csz = self.context_size
        shapes = set()
        for li in range(slices.num_levels):
            n = slices.data[li].shape[0]
            n_full = n // csz
            if n_full:
                shapes.add((self.group_size if n_full > self.group_size else n_full, csz))
                if n_full > self.group_size:
                    shapes.add((self.group_size, csz))
            if n % csz:
                shapes.add((1, bucket_for(n % csz, csz)))
        for bsz, bucket in sorted(shapes):
            d = np.zeros((bsz, bucket, 4, 3), np.int32)
            d[:, :, :, 2] = 255
            p = np.zeros((bsz, bucket, 3), np.float32)
            cdf1, f1, f2 = self._phase1_fn(self.variables, d, p)
            occ = np.full((bsz, bucket // 2), 255, np.int32)
            cdf2 = self._phase2_fn(self.variables, f1, f2, occ)
            # fetch every output: initializes the device->host transfer path
            # for each shape too (first-fetch costs are large on remote TPU)
            np.asarray(cdf1), np.asarray(cdf2)
        return len(shapes)

    # ---- encode -----------------------------------------------------------

    def encode_chunks(self, slices: LevelSlices, timers: list | None = None):
        """Generator of (cdf_u16_rows, sym_rows) in coding order: per level,
        all group-1 rows (chunk order) then all group-2 rows.

        Encoding has no sequential data dependency (all occupancies are
        known), so EVERY phase-1 and phase-2 call of EVERY level is
        dispatched up front; the fetch/emission pass then streams results
        off the device while it is still computing deeper levels."""
        t_start = time.time()
        per_level = []
        for li in range(slices.num_levels):
            d = slices.data[li]
            pos = slices.level_pos(li)
            occ = d[:, -1, 2]
            chunks = self._level_chunks(d, pos)
            calls = self._phase1_level(d, pos)
            evens = {s: occ[s : s + m][0::2].astype(np.int32) for s, m in chunks}
            p2_calls = self._phase2_dispatch(calls, evens)
            per_level.append((chunks, calls, p2_calls, occ))

        for chunks, calls, p2_calls, occ in per_level:
            p1_rows = self._phase1_probs(calls)
            for (s, m), p1 in zip(chunks, p1_rows):
                yield p1, occ[s : s + m][0::2].astype(np.int16)
            p2_rows = self._phase2_fetch(p2_calls)
            odd_chunks = [(s, m) for s, m in chunks if m // 2]
            for (s, m), p2 in zip(odd_chunks, p2_rows):
                yield p2, occ[s : s + m][1::2].astype(np.int16)
        if timers is not None:
            timers[0] += time.time() - t_start

    def encode(self, slices: LevelSlices):
        """Materialized form: (cdf_u16 row blocks, sym blocks, model_seconds)."""
        timers = [0.0]
        pdfs, syms = [], []
        for p, s in self.encode_chunks(slices, timers):
            pdfs.append(p)
            syms.append(s)
        return pdfs, syms, timers[0]

    def encode_to_stream(self, slices: LevelSlices):
        """Streaming: CDF rows are range-coded as they are produced."""
        timers = [0.0]
        enc = ac.StreamingEncoder()
        for cdf, s in self.encode_chunks(slices, timers):
            enc.append_quantized(cdf, s)
        stream, bits = enc.finish()
        return stream, bits, timers[0]

    # ---- decode -----------------------------------------------------------

    def decode(
        self,
        dec: ac.ArithmeticDecoder,
        max_level: int,
        pos_mm: np.ndarray,
        angular: bool,
        lidar_clip: int | None = None,
        ground_truth: np.ndarray | None = None,
    ) -> np.ndarray:
        """Level-wavefront decode from an open AC decoder.

        pos_mm: (max_level, 2) per-level (min, max) of current-node grid
        positions (ignored when not angular).  Returns occupancies 0..254
        in BFS order.  `ground_truth` enables the reference's decode-time
        assert (reference decode_ehem.py:184).
        """
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
            dc = data.copy()
            dc[:, :, 0] = np.minimum(dc[:, :, 0], clip)  # level channel only

            chunks = self._level_chunks(dc, pos)
            calls = self._phase1_level(dc, pos)
            # Stream the level: as each group's CDF rows land on the host,
            # AC-decode its group-1 symbols (stream order == chunk order)
            # and dispatch its phase 2 right away — the arithmetic coder and
            # transfers overlap the device computing later groups.
            evens_by_chunk = {}
            p2_dispatched = []
            for batch, cdf1, f1, f2, b in calls:
                host = np.asarray(cdf1)
                for bi, (s, m) in enumerate(batch):
                    rows = host[bi, : (m + 1) // 2]
                    evens_by_chunk[s] = dec.decode_batch_quantized(rows).astype(
                        np.int32
                    )
                occ = np.full((f1.shape[0], b // 2), 255, np.int32)
                for bi, (s, m) in enumerate(batch):
                    e = evens_by_chunk[s]
                    occ[bi, : e.shape[0]] = e
                p2_dispatched.append(
                    (batch, self._phase2_fn(self.variables, f1, f2, occ))
                )

            p2_rows = self._phase2_fetch(p2_dispatched)
            odd_chunks = [(s, m) for s, m in chunks if m // 2]
            if p2_rows:
                odds_flat = dec.decode_batch_quantized(
                    np.concatenate(p2_rows)
                ).astype(np.int32)
            else:
                odds_flat = np.zeros(0, np.int32)

            level_occ = np.empty(n, np.int32)
            off = 0
            for s, m in chunks:
                level_occ[s : s + m : 2] = evens_by_chunk[s]
            for s, m in odd_chunks:
                cnt = m // 2
                level_occ[s + 1 : s + m : 2] = odds_flat[off : off + cnt]
                off += cnt

            if ground_truth is not None:
                want = ground_truth[decoded : decoded + n]
                assert (want == level_occ.astype(np.int16)).all(), (
                    f"decode mismatch at level {level}"
                )
            decoded += n
            codes.append(level_occ.astype(np.int16))
            if level == max_level:
                break
            data, pos_int = _expand_children(
                data, pos_int, level_occ, level + 1, max_level
            )
        return np.concatenate(codes)


def _expand_children(data, pos_int, level_occ, child_level, max_level):
    """Vectorized wavefront expansion (role of reference
    decode_ehem.py:113-145).

    data: (n, 4, 3) current-level contexts; returns (m, 4, 3) child
    contexts (occ unknown) + (m, 3) integer grid positions.
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
