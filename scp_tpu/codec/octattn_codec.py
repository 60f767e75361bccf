"""OctAttention codec: context-window entropy coding.

Encode (reference compress, encode.py:23-82): per octree level the node
rows are prefixed with context_size-1 pad rows; in the default fast mode
probabilities for a whole 1024-row window are produced by ONE forward
(causal + dual-stream masking makes position j's logits depend only on
rows <= j and exclude node j's own occupancy), windows stepping by the
context size.  In `sequential` mode the window slides by one node and only
the last position is kept (reference `--sequential`, encode.py:37-41).

Decode: mirrors whichever window schedule encoded the stream.  NOTE the
reference's decoder (decode.py:73-107) implements only the sliding-window
schedule, so its fast-encoded streams aren't decodable; here both paths
roundtrip, because the decoder rebuilds the exact window the encoder used
(future rows inside a window carry exactly-zero attention weight, so
replacing them with pad rows reproduces identical logits).
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import numpy as np

from scp_tpu import ac
from scp_tpu.codec.slices import softmax_np
from scp_tpu.core.octree import occupancy_to_child_octants
from scp_tpu.models.octattention import OctAttention

_PAD_OCC = 255


class OctAttentionCodec:
    def __init__(self, model: OctAttention, variables: dict, mode: str | None = None):
        """mode selects the INCREMENTAL schedule's entropy coder:
        "rans" (default) keeps the coder on device — the position loop is a
        pure async dispatch chain with one symbol fetch per level;
        "full" is the host arithmetic coder (one blocking 512 B/lane CDF
        fetch + host AC call per position — ~25-40 ms/position over a
        remote-TPU link, the entire round-3 decode wall).  The window
        (non-incremental) schedules always use the host coder."""
        self.model = model
        self.variables = jax.device_put(variables)  # pin params on device
        self.csz = model.context_size
        self.mode = mode or os.environ.get("SCP_OCTATTN_CODER", "rans")
        assert self.mode in ("rans", "full"), self.mode
        self._fwd_fn = jax.jit(lambda v, d, p: model.apply(v, d, p))

        # Batched incremental engine: all chunks of a level decode in
        # LOCKSTEP — one device dispatch per node-position over every chunk
        # (lane axis), not one per node.  The step emits device-quantized
        # uint16 CDF rows (512 B/lane) so one host fetch per position feeds
        # the arithmetic coder for all lanes.
        from scp_tpu.codec.ehem_codec import logits_to_cdf

        def step_b(v, d, p, cache, t):
            logits, qs = jax.vmap(
                lambda dd, pp, cc: model.apply(
                    v, dd, pp, cc, t, method=OctAttention.decode_step
                ),
                in_axes=(0, 0, 0),
            )(d, p, cache)
            return logits_to_cdf(logits), qs

        def insert_b(v, d, p, cache, t, qs):
            return jax.vmap(
                lambda dd, pp, cc, qq: model.apply(
                    v, dd, pp, cc, t, qq, method=OctAttention.decode_insert
                ),
                in_axes=(0, 0, 0, 0),
            )(d, p, cache, qs)

        self._step_fn_b = jax.jit(step_b)
        self._insert_fn_b = jax.jit(insert_b, donate_argnums=(3,))

        # Device-coder variants (incremental rANS mode): the decoded
        # symbols never leave the device inside a level — insert sets the
        # known-occupancy channel in-program (inactive lanes keep the pad
        # token, mirroring the encoder's host-built d_known), and per-step
        # results accumulate into donated device buffers so the level loop
        # is one async dispatch chain with a single fetch at the end.
        import jax.numpy as jnp

        def insert_b_sym(v, d, p, cache, t, qs, syms, n_active):
            lanes = d.shape[0]
            lane = jnp.arange(lanes, dtype=jnp.int32)
            occ = jnp.where(lane < n_active, syms[:lanes], _PAD_OCC)
            d = d.at[:, -1, 0].set(occ)
            return insert_b(v, d, p, cache, t, qs)

        self._insert_sym_fn = jax.jit(insert_b_sym, donate_argnums=(3,))
        self._buf_put_fn = jax.jit(
            lambda buf, val, j: buf.at[j].set(val[: buf.shape[1]]),
            donate_argnums=(0,),
        )

        # encode-side device lookup: true symbols -> (cdf_low, freq) pairs
        # accumulated into the per-level buffer OctRansEncoder consumes
        from scp_tpu.codec import rans

        def sf_put(buf, rows, syms, j):
            return buf.at[j].set(rans.gather_start_freq(rows, syms))

        self._sf_put_fn = jax.jit(sf_put, donate_argnums=(0,))

        # ---- fused level schedule (rans mode; default) -------------------
        #
        # The per-position loop above costs 3-4 tunnel RPCs per node
        # POSITION (~10 ms each on a remote-TPU link -> 129 s for a
        # 203k-node L12 scan, BUILDLOG round 4).  Here the WHOLE position
        # loop — context-row gather, model step, CDF quantization, rANS
        # decode, cache insert — is one lax.scan program dispatched ONCE
        # per level.  Both sides run the SAME compiled program: the
        # encoder passes a fixed-size dummy stream + is_decode=False and
        # the symbol source is a traced where(), so every input shape is
        # identical and CDF agreement stays structural (the contract the
        # per-position path establishes with its shared step program).
        # Reference contrast: one full 1024-window forward per node,
        # reference decode.py:73-107.
        from scp_tpu.codec import octattn_rans as orans

        self.fused = (
            self.mode == "rans"
            and os.environ.get("SCP_OCTATTN_FUSED", "1") != "0"
        )

        def fused_level(v, data_u8, pos_i32, inv_scale, n, states, ptr,
                        stream, true_syms, is_decode, csz):
            nsteps, lanes = true_syms.shape
            kk = data_u8.shape[1]
            lane = jnp.arange(lanes, dtype=jnp.int32)
            pad_d = jnp.zeros((kk, 3), jnp.int32).at[:, 0].set(_PAD_OCC)
            w, dm = csz, model.embed_dim
            nl = model.num_layers
            cache0 = {
                "k": jnp.zeros((lanes, nl, w, dm), jnp.dtype(model.dtype)),
                "v": jnp.zeros((lanes, nl, w, dm), jnp.dtype(model.dtype)),
            }

            def body(carry, xs):
                cache, states, ptr = carry
                j, ts_j = xs
                idx = j + lane * csz
                valid = idx < n
                safe = jnp.clip(idx, 0, data_u8.shape[0] - 1)
                d_j = jnp.where(
                    valid[:, None, None], data_u8[safe].astype(jnp.int32),
                    pad_d,
                )
                p_j = jnp.where(
                    valid[:, None, None],
                    pos_i32[safe].astype(jnp.float32) * inv_scale,
                    jnp.float32(0.0),
                )
                logits, qs = jax.vmap(
                    lambda dd, pp, cc: model.apply(
                        v, dd, pp, cc, j, method=OctAttention.decode_step
                    ),
                    in_axes=(0, 0, 0),
                )(d_j, p_j, cache)
                rows = logits_to_cdf(logits)
                # active_count(n, csz, j), in-program
                n_act = jnp.where(
                    j < jnp.minimum(n, csz),
                    jnp.maximum((n - j + csz - 1) // csz, 0),
                    0,
                )
                syms_dec, states, ptr = orans.decode_step_core(
                    states, ptr, stream, rows, n_act
                )
                sym = jnp.where(is_decode, syms_dec[:lanes], ts_j)
                sf = rans.gather_start_freq(rows, sym)
                occ = jnp.where(lane < n_act, sym, _PAD_OCC)
                d_known = d_j.at[:, -1, 0].set(occ)
                cache = jax.vmap(
                    lambda dd, pp, cc, qq: model.apply(
                        v, dd, pp, cc, j, qq,
                        method=OctAttention.decode_insert,
                    ),
                    in_axes=(0, 0, 0, 0),
                )(d_known, p_j, cache, qs)
                return (cache, states, ptr), (sym, sf)

            js = jnp.arange(nsteps, dtype=jnp.int32)
            (_, states, ptr), (syms, sfs) = jax.lax.scan(
                body, (cache0, states, ptr), (js, true_syms)
            )
            return syms, sfs, states, ptr

        self._fused_fn = partial(jax.jit, static_argnums=(10,))(fused_level)
        self._dummy_stream_buf = None

    def _dummy_stream(self):
        """Encode-side stand-in for the decode stream buffer — same fixed
        shape so encoder and decoder hit the same compiled program."""
        import jax.numpy as jnp

        from scp_tpu.codec import octattn_rans as orans

        if self._dummy_stream_buf is None:
            self._dummy_stream_buf = jnp.zeros(
                (orans.stream_cap(),), jnp.uint8
            )
        return self._dummy_stream_buf

    def coding_params(self, schedule: str = "rans") -> str:
        """Stamp of the knobs that change this codec's compiled CDF
        programs (same decode-refusal contract as EHEMCodec.coding_params).
        The fused-schedule fields only exist for "rans" streams — the
        host-coder schedules ("full"/"incr") share programs that don't
        read them."""
        import jax.numpy as jnp

        from scp_tpu.codec import octattn_rans as orans

        base = f"dtype={jnp.dtype(self.model.dtype).name}"
        if schedule != "rans":
            return base
        return (
            base
            + f";octsched={'fused' if self.fused else 'steps'}"
            + (f";cap={orans.stream_cap()}" if self.fused else "")
        )

    def _fwd(self, d, p):
        return self._fwd_fn(self.variables, d, p)

    # -- level slicing (reference EncodeDataset, encode_dataset.py:32-55) --

    @staticmethod
    def split_levels(ctx: np.ndarray, level_wise: bool = True):
        """Raw (N, 4, 6) shard -> per-level (data(occ,level,octant), pos).
        level_wise=False returns the whole BFS stream as one slice (the
        reference obj-type default, encode_dataset.py:43)."""
        ctx = np.asarray(ctx)
        occ = ctx[:, :, 0].astype(np.int32) - 1
        node_level = ctx[:, -1, 1].astype(np.int32)
        max_level = int(node_level.max())
        data_all = np.stack(
            [occ, ctx[:, :, 1].astype(np.int32), ctx[:, :, 2].astype(np.int32)],
            axis=-1,
        )
        pos_all = (ctx[:, :, 3:6] / float(2**max_level)).astype(np.float32)
        if not level_wise:
            return [(data_all, pos_all)], occ[:, -1].astype(np.int16), max_level
        levels = []
        for l in range(1, max_level + 1):
            sel = node_level == l
            levels.append((data_all[sel], pos_all[sel]))
        return levels, occ[:, -1].astype(np.int16), max_level

    def _pad_prefix(self, data, pos):
        k = data.shape[1]
        pad_d = np.zeros((self.csz - 1, k, 3), np.int32)
        pad_d[:, :, 0] = _PAD_OCC
        pad_p = np.zeros((self.csz - 1, k, 3), np.float32)
        return np.concatenate([pad_d, data]), np.concatenate([pad_p, pos])

    def _window(self, rows_d, rows_p, start):
        """Fixed-size window [start, start+csz), right-padded if short."""
        d = rows_d[start : start + self.csz]
        p = rows_p[start : start + self.csz]
        if d.shape[0] < self.csz:
            extra = self.csz - d.shape[0]
            pad_d = np.zeros((extra, d.shape[1], 3), np.int32)
            pad_d[:, :, 0] = _PAD_OCC
            d = np.concatenate([d, pad_d])
            p = np.concatenate([p, np.zeros((extra, p.shape[1], 3), np.float32)])
        return d, p

    # -- encode -------------------------------------------------------------

    def encode(self, ctx: np.ndarray, sequential: bool = False,
               level_wise: bool = True):
        """-> (pdf (N,255), syms (N,), model_seconds); rows in BFS order."""
        levels, occ_stream, _ = self.split_levels(ctx, level_wise=level_wise)
        pdfs = []
        elapsed = 0.0
        for data, pos in levels:
            n = data.shape[0]
            rows_d, rows_p = self._pad_prefix(data, pos)
            probs = np.zeros((n, self.model.token_num), np.float32)
            if sequential:
                # Sliding window: node i sits at the last window position.
                for i in range(n):
                    d, p = self._window(rows_d, rows_p, i)
                    t0 = time.time()
                    logits = np.asarray(self._fwd(d[None], p[None]))[0]
                    elapsed += time.time() - t0
                    probs[i] = softmax_np(logits[self.csz - 1])
            else:
                for i in range(0, rows_d.shape[0], self.csz):
                    d, p = self._window(rows_d, rows_p, i)
                    t0 = time.time()
                    logits = np.asarray(self._fwd(d[None], p[None]))[0]
                    elapsed += time.time() - t0
                    # real nodes covered by this window
                    rs = max(i, self.csz - 1)
                    re = min(i + self.csz, self.csz - 1 + n)
                    if re > rs:
                        probs[rs - (self.csz - 1) : re - (self.csz - 1)] = softmax_np(
                            logits[rs - i : re - i]
                        )
            pdfs.append(probs)
        pdf = np.concatenate(pdfs, axis=0)
        return pdf, occ_stream, elapsed

    def encode_to_stream(self, ctx: np.ndarray, sequential: bool = False,
                         level_wise: bool = True):
        pdf, syms, elapsed = self.encode(
            ctx, sequential=sequential, level_wise=level_wise
        )
        stream, bits = ac.ArithmeticEncoder().encode(pdf, syms)
        return stream, bits, elapsed

    # -- incremental (KV-cache) mode ----------------------------------------
    #
    # A third window schedule absent in the reference: chunks of csz
    # consecutive nodes per level with NO pad prefix; each node costs one
    # cached-attention step (O(window) per layer) + one cache insert,
    # instead of a full O(window^2) forward.  All chunks of a level run in
    # LOCKSTEP on a lane (batch) axis, so decoding costs one device round
    # trip per node-POSITION, not per node, and the stream order is
    # position-major: for each position j, the symbols of every chunk in
    # chunk order.  Encoder and decoder share the same compiled step
    # programs, so the streams are self-consistent by construction.

    @staticmethod
    def _lane_count(c: int) -> int:
        """Bucket the lane axis to powers of two for program reuse."""
        lanes = 1
        while lanes < c:
            lanes *= 2
        return lanes

    def _init_cache_b(self, lanes: int):
        w, d = self.csz, self.model.embed_dim
        l = self.model.num_layers
        # cache dtype must follow the model's compute dtype: an f32 cache
        # under a bf16 model doubles KV HBM and diverges from the full
        # forward the consistency test certifies
        z = np.zeros((lanes, l, w, d), np.dtype(self.model.dtype))
        return {"k": jax.device_put(z), "v": jax.device_put(z)}

    def _incremental_level(self, data, pos, occ_or_decoder, decode: bool,
                           elapsed_box=None):
        """Run one level; occ_or_decoder is the true occupancies (encode)
        or an ArithmeticDecoder (decode).  Returns (cdf_rows_u16, symbols)
        in position-major stream order."""
        n = data.shape[0]
        k = data.shape[1]
        n_chunks = -(-n // self.csz)
        lanes = self._lane_count(n_chunks)
        max_m = min(self.csz, n)
        cache = self._init_cache_b(lanes)

        rows_out, syms_out = [], []
        pending = []  # encode: (handle, active_lanes) fetched after the loop
        for j in range(max_m):
            active = [c for c in range(n_chunks) if c * self.csz + j < n]
            d_j = np.zeros((lanes, k, 3), np.int32)
            d_j[:, :, 0] = _PAD_OCC
            p_j = np.zeros((lanes, k, 3), np.float32)
            for c in active:
                d_j[c] = data[c * self.csz + j]
                p_j[c] = pos[c * self.csz + j]
            t0 = time.time()
            cdf_rows, qs = self._step_fn_b(self.variables, d_j, p_j, cache, j)
            syms_j = np.full(lanes, _PAD_OCC, np.int32)
            if decode:
                host = np.asarray(cdf_rows)
                if elapsed_box is not None:
                    elapsed_box[0] += time.time() - t0
                for c in active:
                    got = occ_or_decoder.decode_batch_quantized(host[c : c + 1])
                    if got.shape[0] == 0:
                        raise ValueError(
                            "bitstream exhausted mid-level: the stream was "
                            "not encoded with the incremental schedule "
                            "(header coding_mode pins the schedule)"
                        )
                    syms_j[c] = int(got[0])
                rows_out.append(host[active])
            else:
                # teacher forcing: no fetch needed inside the loop — the
                # device pipelines every step; rows are fetched at the end
                pending.append((cdf_rows, active))
                for c in active:
                    syms_j[c] = int(occ_or_decoder[c * self.csz + j])
            syms_out.append(syms_j[active])
            d_known = d_j.copy()
            d_known[:, -1, 0] = syms_j
            t0 = time.time()
            cache = self._insert_fn_b(
                self.variables, d_known, p_j, cache, j, qs
            )
            if elapsed_box is not None and decode:
                elapsed_box[0] += time.time() - t0
        if not decode:
            t0 = time.time()
            rows_out = [np.asarray(h)[active] for h, active in pending]
            if elapsed_box is not None:
                elapsed_box[0] += time.time() - t0
        return (
            np.concatenate(rows_out) if rows_out else
            np.zeros((0, self.model.token_num + 1), np.uint16),
            np.concatenate(syms_out) if syms_out else np.zeros(0, np.int32),
        )

    @staticmethod
    def _position_major(values, n, csz):
        """Reorder a BFS-(chunk-major)-ordered level array into the
        position-major incremental stream order."""
        n_chunks = -(-n // csz)
        order = []
        for j in range(min(csz, n)):
            for c in range(n_chunks):
                i = c * csz + j
                if i < n:
                    order.append(i)
        return values[np.array(order, np.int64)]

    @staticmethod
    def _from_position_major(values, n, csz):
        """Inverse of _position_major."""
        n_chunks = -(-n // csz)
        order = []
        for j in range(min(csz, n)):
            for c in range(n_chunks):
                i = c * csz + j
                if i < n:
                    order.append(i)
        out = np.empty_like(values)
        out[np.array(order, np.int64)] = values
        return out

    def encode_incremental(self, ctx: np.ndarray):
        """-> (cdf_rows_u16, syms, seconds) in incremental stream order
        (position-major per level)."""
        levels, occ_stream, _ = self.split_levels(ctx)
        rows_all, syms_all = [], []
        elapsed = [0.0]
        off = 0
        for data, pos in levels:
            n = data.shape[0]
            rows, syms = self._incremental_level(
                data, pos, occ_stream[off : off + n], decode=False,
                elapsed_box=elapsed,
            )
            rows_all.append(rows)
            syms_all.append(syms)
            off += n
        return (
            np.concatenate(rows_all),
            np.concatenate(syms_all).astype(np.int16),
            elapsed[0],
        )

    # -- incremental mode, device rANS coder ---------------------------------
    #
    # Same schedule and step programs as above, but the entropy coder lives
    # on device (codec/octattn_rans.py): encode accumulates per-(position,
    # lane) (cdf_low, freq) pairs into a device buffer and fetches nothing;
    # decode is step -> rANS -> cache-insert as one async dispatch chain
    # with ONE symbol fetch per level.  Kills the per-position blocking CDF
    # fetch + host AC call that made the host-coder decode 178-267 s/scan
    # on a remote TPU (BUILDLOG round 3).

    def max_lane_bucket(self, ctx: np.ndarray) -> int:
        """Lane count for OctRansEncoder: pow2 bucket of this cloud's
        maximum per-level chunk count."""
        levels, _, _ = self.split_levels(ctx)
        mx = max(-(-d.shape[0] // self.csz) for d, _ in levels)
        return self._lane_count(mx)

    def _steps_bucket(self, max_m: int) -> int:
        """Pow2 position-count bucket (program/buffer-shape reuse)."""
        return 1 << max(int(max_m) - 1, 0).bit_length()

    def _lane_rows(self, data, pos, j, lanes, n):
        """Host-side (lanes, K, 3)/(lanes, K, 3) inputs for position j."""
        k = data.shape[1]
        d_j = np.zeros((lanes, k, 3), np.int32)
        d_j[:, :, 0] = _PAD_OCC
        p_j = np.zeros((lanes, k, 3), np.float32)
        for c in range(lanes):
            i = c * self.csz + j
            if i < n:
                d_j[c] = data[i]
                p_j[c] = pos[i]
        return d_j, p_j

    def _fused_level_bufs(self, data, pos_int, lanes):
        """Host pad to the fused program's (lanes*csz, K, 3) buffers.
        data int (occ/level/octant all <= 255) -> u8; pos grid ints -> i32
        (the program normalizes in-program: i32 -> f32 * inv_scale, equal
        bit-for-bit to the host division split_levels performs)."""
        n, k = data.shape[0], data.shape[1]
        cap = lanes * self.csz
        d = np.zeros((cap, k, 3), np.uint8)
        d[:, :, 0] = _PAD_OCC
        d[:n] = data.astype(np.uint8)
        p = np.zeros((cap, k, 3), np.int32)
        p[:n] = pos_int.astype(np.int32)
        return d, p

    def _fused_true_syms(self, occ, n, lanes, nsteps):
        """(nsteps, lanes) position-major teacher symbols; inactive 0."""
        buf = np.zeros(lanes * self.csz, np.int32)
        buf[:n] = occ
        ts = np.zeros((nsteps, lanes), np.int32)
        mm = min(self.csz, n)
        ts[:mm] = buf.reshape(lanes, self.csz).T[:mm]
        return ts

    def _encode_incremental_fused(self, enc, ctx: np.ndarray) -> float:
        """Fused-schedule encode: ONE program dispatch per level (plus the
        payload assembly in enc.finish())."""
        import jax.numpy as jnp

        ctx = np.asarray(ctx)
        levels, occ_stream, max_level = self.split_levels(ctx)
        node_level = ctx[:, -1, 1].astype(np.int32)
        pos_int_all = ctx[:, :, 3:6].astype(np.int32)
        inv_scale = np.float32(1.0 / float(2**max_level))
        dummy_states = jnp.zeros((enc.k,), jnp.uint32)
        dummy_stream = self._dummy_stream()
        t0 = time.time()
        off = 0
        for li, (data, _pos) in enumerate(levels):
            n = data.shape[0]
            occ = occ_stream[off : off + n]
            off += n
            pos_int = pos_int_all[node_level == li + 1]
            lanes = self._lane_count(-(-n // self.csz))
            nsteps = self._steps_bucket(min(self.csz, n))
            d_pad, p_pad = self._fused_level_bufs(data, pos_int, lanes)
            ts = self._fused_true_syms(occ, n, lanes, nsteps)
            _syms, sf, _st, _pt = self._fused_fn(
                self.variables, d_pad, p_pad, inv_scale, np.int32(n),
                dummy_states, jnp.int32(0), dummy_stream,
                jnp.asarray(ts), jnp.bool_(False), self.csz,
            )
            enc.append_level(sf, n, self.csz)
        return time.time() - t0

    def encode_incremental_into(self, enc, ctx: np.ndarray) -> float:
        """Teacher-forced incremental encode into an open OctRansEncoder
        (device coder; multi-subtree drivers feed several clouds through
        one encoder — lane states persist across levels and subtrees).
        Returns elapsed dispatch seconds; nothing is fetched here (the
        payload materializes in enc.finish())."""
        import jax.numpy as jnp

        if self.fused:
            return self._encode_incremental_fused(enc, ctx)

        levels, occ_stream, _ = self.split_levels(ctx)
        t0 = time.time()
        off = 0
        for data, pos in levels:
            n = data.shape[0]
            occ = occ_stream[off : off + n]
            off += n
            n_chunks = -(-n // self.csz)
            lanes = self._lane_count(n_chunks)
            max_m = min(self.csz, n)
            cache = self._init_cache_b(lanes)
            sf_buf = jnp.zeros((self._steps_bucket(max_m), lanes, 2), jnp.uint32)
            for j in range(max_m):
                d_j, p_j = self._lane_rows(data, pos, j, lanes, n)
                # true symbols; inactive lanes 0 (masked out in the coder)
                syms_j = np.zeros(lanes, np.int32)
                for c in range(n_chunks):
                    i = c * self.csz + j
                    if i < n:
                        syms_j[c] = int(occ[i])
                cdf_rows, qs = self._step_fn_b(self.variables, d_j, p_j, cache, j)
                sf_buf = self._sf_put_fn(sf_buf, cdf_rows, jnp.asarray(syms_j), j)
                # data rows carry the true own occupancy, so d_j IS d_known
                cache = self._insert_fn_b(self.variables, d_j, p_j, cache, j, qs)
            enc.append_level(sf_buf, n, self.csz)
        return time.time() - t0

    def decode_incremental_rans(
        self, dec, max_level: int, ground_truth: np.ndarray | None = None
    ) -> np.ndarray:
        """Incremental decode from an open OctRansDecoder."""
        import jax.numpy as jnp

        from scp_tpu.codec.octattn_rans import active_count

        k = self.model.ancestors
        inv_scale = 1.0 / float(2**max_level)
        anc_d = np.zeros((1, k - 1, 3), np.int32)
        anc_d[:, :, 0] = _PAD_OCC
        anc_p = np.zeros((1, k - 1, 3), np.int64)
        self_d = np.array([[[_PAD_OCC, 1, 1]]], np.int32)
        self_p = np.zeros((1, 1, 3), np.int64)

        codes = []
        decoded = 0
        for level in range(1, max_level + 1):
            data = np.concatenate([anc_d, self_d], axis=1)
            pos_int = np.concatenate([anc_p, self_p], axis=1)
            pos = pos_int.astype(np.float32) * inv_scale
            n = data.shape[0]
            n_chunks = -(-n // self.csz)
            lanes = self._lane_count(n_chunks)
            assert lanes <= dec.k, (lanes, dec.k)
            max_m = min(self.csz, n)
            nsteps = self._steps_bucket(max_m)
            if self.fused:
                # one dispatch for the whole level (same program as encode)
                d_pad, p_pad = self._fused_level_bufs(data, pos_int, lanes)
                ts = jnp.zeros((nsteps, lanes), jnp.int32)
                syms_buf, _sf, dec.states, dec.ptr = self._fused_fn(
                    self.variables, d_pad, p_pad, np.float32(inv_scale),
                    np.int32(n), dec.states, dec.ptr, dec.stream, ts,
                    jnp.bool_(True), self.csz,
                )
            else:
                cache = self._init_cache_b(lanes)
                syms_buf = jnp.zeros((nsteps, lanes), jnp.int32)
                for j in range(max_m):
                    d_j, p_j = self._lane_rows(data, pos, j, lanes, n)
                    n_act = active_count(n, self.csz, j)
                    cdf_rows, qs = self._step_fn_b(
                        self.variables, d_j, p_j, cache, j
                    )
                    syms = dec.step(cdf_rows, n_act)  # (K,) i32, device
                    cache = self._insert_sym_fn(
                        self.variables, d_j, p_j, cache, j, qs, syms, n_act
                    )
                    syms_buf = self._buf_put_fn(syms_buf, syms, j)
            host = np.asarray(syms_buf)  # the level's ONE fetch
            level_occ = np.empty(n, np.int32)
            for j in range(max_m):
                cnt = active_count(n, self.csz, j)
                level_occ[np.arange(cnt) * self.csz + j] = host[j, :cnt]
            if ground_truth is not None:
                want = ground_truth[decoded : decoded + n]
                assert (want == level_occ.astype(np.int16)).all(), (
                    f"incremental-rans decode mismatch at level {level}"
                )
            decoded += n
            codes.append(level_occ.astype(np.int16))
            if level == max_level:
                break
            anc_d, anc_p, self_d, self_p = self._next_level_rows(
                anc_d, self_d, pos_int, level_occ, level, max_level
            )
        return np.concatenate(codes)

    @staticmethod
    def _next_level_rows(anc_d, self_d, pos_int, level_occ, level, max_level):
        """Child-context expansion shared by the incremental decoders
        (role of reference decode.py:103-104 child queuing)."""
        filled = np.concatenate([anc_d, self_d], axis=1)
        filled[:, -1, 0] = level_occ
        pidx, octant = occupancy_to_child_octants(level_occ + 1)
        anc_d = filled[pidx][:, 1:, :]
        anc_p = pos_int[pidx][:, 1:, :]
        n_child = pidx.shape[0]
        self_d = np.zeros((n_child, 1, 3), np.int32)
        self_d[:, 0, 0] = _PAD_OCC
        self_d[:, 0, 1] = level + 1
        self_d[:, 0, 2] = octant + 1
        unit = np.int64(1) << np.int64(max_level - (level + 1) + 1)
        bits = np.stack(
            [(octant >> 2) & 1, (octant >> 1) & 1, octant & 1], axis=1
        ).astype(np.int64)
        self_p = (pos_int[pidx][:, -1, :] + bits * unit)[:, None, :]
        return anc_d, anc_p, self_d, self_p

    def decode_incremental(
        self,
        dec: ac.ArithmeticDecoder,
        max_level: int,
        ground_truth: np.ndarray | None = None,
    ) -> np.ndarray:
        k = self.model.ancestors
        inv_scale = 1.0 / float(2**max_level)
        anc_d = np.zeros((1, k - 1, 3), np.int32)
        anc_d[:, :, 0] = _PAD_OCC
        anc_p = np.zeros((1, k - 1, 3), np.int64)
        self_d = np.array([[[_PAD_OCC, 1, 1]]], np.int32)
        self_p = np.zeros((1, 1, 3), np.int64)

        codes = []
        decoded = 0
        for level in range(1, max_level + 1):
            data = np.concatenate([anc_d, self_d], axis=1)
            pos_int = np.concatenate([anc_p, self_p], axis=1)
            pos = pos_int.astype(np.float32) * inv_scale
            _, occ_pm = self._incremental_level(data, pos, dec, decode=True)
            level_occ = self._from_position_major(occ_pm, data.shape[0], self.csz)
            if ground_truth is not None:
                want = ground_truth[decoded : decoded + len(level_occ)]
                assert (want == level_occ.astype(np.int16)).all(), (
                    f"incremental decode mismatch at level {level}"
                )
            decoded += len(level_occ)
            codes.append(level_occ.astype(np.int16))
            if level == max_level:
                break
            filled = np.concatenate([anc_d, self_d], axis=1)
            filled[:, -1, 0] = level_occ
            pidx, octant = occupancy_to_child_octants(level_occ + 1)
            anc_d = filled[pidx][:, 1:, :]
            anc_p = pos_int[pidx][:, 1:, :]
            n_child = pidx.shape[0]
            self_d = np.zeros((n_child, 1, 3), np.int32)
            self_d[:, 0, 0] = _PAD_OCC
            self_d[:, 0, 1] = level + 1
            self_d[:, 0, 2] = octant + 1
            unit = np.int64(1) << np.int64(max_level - (level + 1) + 1)
            bits = np.stack(
                [(octant >> 2) & 1, (octant >> 1) & 1, octant & 1], axis=1
            ).astype(np.int64)
            self_p = (pos_int[pidx][:, -1, :] + bits * unit)[:, None, :]
        return np.concatenate(codes)

    # -- decode -------------------------------------------------------------

    def decode(
        self,
        dec: ac.ArithmeticDecoder,
        max_level: int,
        ground_truth: np.ndarray | None = None,
        sequential: bool = False,
        level_wise: bool = True,
    ) -> np.ndarray:
        """Sequential wavefront decode (one forward per node).

        Rebuilds, for every node, the exact window content the encoder used
        (fast mode: windows restart every csz rows of the padded stream;
        sequential mode: sliding window)."""
        k = self.model.ancestors
        inv_scale = 1.0 / float(2**max_level)

        # Root context rows.
        anc_d = np.zeros((1, k - 1, 3), np.int32)
        anc_d[:, :, 0] = _PAD_OCC
        anc_p = np.zeros((1, k - 1, 3), np.int64)
        self_d = np.array([[[_PAD_OCC, 1, 1]]], np.int32)
        self_p = np.zeros((1, 1, 3), np.int64)

        codes = []
        decoded = 0
        # level_wise=False: ONE padded stream spanning all levels (the
        # reference's obj-type default, EncodeDataset with level_wise=False,
        # encode_dataset.py:43); level_wise=True: the stream (and its pad
        # prefix) restarts at every level.
        pad_d = np.zeros((self.csz - 1, k, 3), np.int32)
        pad_d[:, :, 0] = _PAD_OCC
        pad_p = np.zeros((self.csz - 1, k, 3), np.float32)
        rows_d, rows_p = pad_d, pad_p
        level_base = 0  # index of this level's first node within rows_d
        for level in range(1, max_level + 1):
            data = np.concatenate([anc_d, self_d], axis=1)  # (m, k, 3)
            pos_int = np.concatenate([anc_p, self_p], axis=1)  # (m, k, 3)
            m = data.shape[0]
            if level_wise:
                rows_d, rows_p = pad_d, pad_p
            level_base = rows_d.shape[0] - (self.csz - 1)
            rows_d = np.concatenate([rows_d, data])
            rows_p = np.concatenate(
                [rows_p, pos_int.astype(np.float32) * inv_scale]
            )

            level_occ = np.empty(m, np.int32)
            for node in range(m):
                padded_idx = level_base + node + self.csz - 1
                if sequential:
                    start = padded_idx - (self.csz - 1)
                else:
                    start = (padded_idx // self.csz) * self.csz
                j = padded_idx - start
                # future rows inside the window are still occ=unknown: rows
                # beyond `padded_idx` already ARE unknown (occ channel of
                # undecoded nodes is _PAD_OCC until filled below).
                d, p = self._window(rows_d, rows_p, start)
                logits = np.asarray(self._fwd(d[None], p[None]))[0]
                sym = int(dec.decode_batch(softmax_np(logits[j])[None])[0])
                level_occ[node] = sym
                rows_d[padded_idx, -1, 0] = sym
                if ground_truth is not None:
                    assert sym == int(ground_truth[decoded]), (
                        f"decode mismatch at level {level} node {node}"
                    )
                decoded += 1
            codes.append(level_occ.astype(np.int16))
            if level == max_level:
                break
            # Expand children for the next level.
            filled = np.concatenate([anc_d, self_d], axis=1)
            filled[:, -1, 0] = level_occ
            pidx, octant = occupancy_to_child_octants(level_occ + 1)
            anc_d = filled[pidx][:, 1:, :]
            anc_p = pos_int[pidx][:, 1:, :]
            n_child = pidx.shape[0]
            self_d = np.zeros((n_child, 1, 3), np.int32)
            self_d[:, 0, 0] = _PAD_OCC
            self_d[:, 0, 1] = level + 1
            self_d[:, 0, 2] = octant + 1
            unit = np.int64(1) << np.int64(max_level - (level + 1) + 1)
            bits = np.stack(
                [(octant >> 2) & 1, (octant >> 1) & 1, octant & 1], axis=1
            ).astype(np.int64)
            self_p = (pos_int[pidx][:, -1, :] + bits * unit)[:, None, :]
        return np.concatenate(codes)
