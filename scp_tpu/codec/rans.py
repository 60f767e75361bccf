"""Device-side interleaved rANS entropy coder.

Round-1/2 measured the EHEM codec transfer-bound on the host link: the
arithmetic coder lives on the host, so every decoded symbol needs its
quantized CDF row shipped off-chip (512 B/node full, 68 B/node staged) and
the tunnel's ~20 MB/s downlink dominates decode wall-clock.  This module
moves entropy coding ONTO the device: an interleaved-lane rANS coder
(range asymmetric numeral system, byte renormalization) whose per-symbol
CDF rows never leave HBM.

  * decode fetches ONE byte per node (the decoded occupancy) per level;
  * encode fetches only the compressed byte blocks (~bpp/8 per node).

Role of the reference's host coder hand-off (numpyAc/numpyAc.py:116-169),
re-designed for the hardware: the reference streams one pdf row per symbol
through pybind into a serial C++ range coder; here K lanes decode in
lockstep as vector ops, with byte-stream consumption resolved by a prefix
sum over per-lane renormalization counts.

Coder math (standard rANS, byte-wise):
  state x in [L, 256*L) with L = 2^23; 16-bit quantized frequencies.
  decode:  slot = x & 0xFFFF; sym s.t. cdf[s] <= slot < cdf[s+1]
           x <- freq * (x >> 16) + slot - cdf[s]
           while x < L: x <- (x << 8) | next_byte   (<= 2 bytes)
  encode (processed in reverse symbol order):
           while x >= freq << 15: emit x & 0xFF; x <<= -8  (<= 2 bytes)
           x <- (x // freq) << 16 | (x % freq + cdf[s])

Interleaving contract (the part encoder and decoder MUST mirror):
  * a stream is a sequence of GROUPS (here: one per level x parity, in
    stream order); lane assignment restarts at each group: symbol i of a
    group belongs to lane i % K, decoded at step i // K;
  * within a decode step lanes consume bytes in ascending lane order,
    a lane's 2 renorm bytes in consumption order; byte counts depend
    only on state magnitudes, so offsets are an exclusive cumsum;
  * the encoder walks groups, steps, and lanes in exactly reverse order
    (lax.scan(reverse=True)), emitting each lane's bytes as a stack push;
    per-(step, lane) the consume-order pair is the reverse of the pushed
    pair, so blocks are laid out directly in decode order;
  * lane states persist across groups; the encoder's final states (= the
    decoder's initial states) head the payload as K little-endian u32.

Everything is integer arithmetic in uint32 — bit-exact on any backend, no
float agreement needed between encoder and decoder at all (the CDF rows
themselves still come from the shared jitted phase programs).

Alphabet: 255 occupancy symbols, one 256-entry u16 CDF row per symbol
(logits_to_cdf), entry 255 == 65536 stored wrapped as 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

RANS_L = jnp.uint32(1 << 23)
HALF_L = jnp.uint32(1 << 15)  # L >> 8
K_LANES = 1024
# 64 steps x 1024 lanes = 65536 symbols per dispatch: the scan itself costs
# ~55us/1k symbols on a v5e chip while each dispatch carries ~8ms of
# tunnel/runtime overhead, so chunks are sized for dispatch count, not VMEM
CHUNK_STEPS = 64
CHUNK = K_LANES * CHUNK_STEPS  # symbols per dispatch


def _row_i32(rows_u16: jnp.ndarray) -> jnp.ndarray:
    """(…, 256) u16 rows -> i32 with the wrapped top entry restored."""
    r = rows_u16.astype(jnp.int32)
    top = jnp.arange(rows_u16.shape[-1], dtype=jnp.int32) == rows_u16.shape[-1] - 1
    return jnp.where(top, jnp.int32(1 << 16), r)


@jax.jit
def gather_start_freq(rows_u16: jnp.ndarray, syms: jnp.ndarray):
    """Per-symbol (cdf_low, freq) u32 from CDF rows — encode-side lookup.

    rows_u16 (..., 256), syms (...) int -> (..., 2) u32.

    The row lookup is a compare + masked one-hot sum, not take_along_axis:
    TPU lowers the per-row dynamic gather ~20x slower than the 256-wide
    vector reduction (same finding as _decode_chunk's start/top lookup).
    syms <= 254, so sym+1 <= 255 and the wrapped top entry restored by
    _row_i32 covers the hi edge with no special case.
    """
    r = _row_i32(rows_u16)
    s = syms.astype(jnp.int32)[..., None]
    j = jnp.arange(r.shape[-1], dtype=jnp.int32)
    lo = jnp.sum(jnp.where(j == s, r, 0), axis=-1)
    hi = jnp.sum(jnp.where(j == s + 1, r, 0), axis=-1)
    return jnp.stack([lo, hi - lo], axis=-1).astype(jnp.uint32)


@partial(jax.jit, donate_argnums=(0, 1))
def _decode_chunk(states, ptr, stream, rows_u16, base, n):
    """Decode one (CHUNK_STEPS, K_LANES) block of symbols.

    states (K,) u32, ptr () i32 (byte offset into stream), stream (B,) u8,
    rows_u16 (CHUNK_STEPS, K_LANES, 256), base () i32 global symbol offset
    of this chunk within its group, n () i32 real group length.
    Returns (syms (CHUNK_STEPS, K_LANES) u8, states, ptr).
    """
    lane = jnp.arange(K_LANES, dtype=jnp.int32)

    def step(carry, xs):
        x, p = carry
        rows, t = xs
        active = base + t * K_LANES + lane < n

        r = _row_i32(rows)  # (K, 256)
        slot = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        sym = jnp.sum(r[:, :255] <= slot[:, None], axis=-1) - 1  # (K,)
        # start/top as masked reductions, NOT row gathers: rows are
        # monotone (logits_to_cdf guarantees it), so cdf[sym] is the max
        # entry <= slot and cdf[sym+1] the min entry > slot.  The two
        # take_along_axis gathers this replaces were ~45% of the chunk's
        # device time (scratch/prof_rans_dec2.py: 30 -> 1.6 ms combined
        # with the windowed stream read below).
        le = r <= slot[:, None]
        start = jnp.max(jnp.where(le, r, 0), axis=-1)
        top = jnp.min(jnp.where(le, jnp.int32(1 << 16), r), axis=-1)
        freq = (top - start).astype(jnp.uint32)

        x2 = freq * (x >> 16) + slot.astype(jnp.uint32) - start.astype(jnp.uint32)
        # renorm: byte counts depend only on magnitude -> prefix-sum offsets
        cnt = jnp.where(
            active, (x2 < RANS_L).astype(jnp.int32) + (x2 < HALF_L), 0
        )
        offs = jnp.cumsum(cnt) - cnt
        # the <=2K+2 bytes a step can consume are contiguous at p: slice
        # the window once (sized so RansDecoder's padding keeps it in
        # bounds), then gather within it — a dynamic gather into the full
        # multi-MB stream was the other ~45% of the chunk's device time
        win = jax.lax.dynamic_slice_in_dim(stream, p, 2 * K_LANES + 2)
        b0 = jnp.take(win, offs, mode="clip").astype(jnp.uint32)
        b1 = jnp.take(win, offs + 1, mode="clip").astype(jnp.uint32)
        x3 = jnp.where(cnt >= 1, (x2 << 8) | b0, x2)
        x3 = jnp.where(cnt == 2, (x3 << 8) | b1, x3)

        x_new = jnp.where(active, x3, x)
        return (x_new, p + jnp.sum(cnt)), jnp.where(active, sym, 0).astype(jnp.uint8)

    ts = jnp.arange(CHUNK_STEPS, dtype=jnp.int32)
    # unroll: the loop-carried (states, ptr) chain is inherent, but
    # unrolling lets XLA overlap the independent per-step work (row loads,
    # the 3 reductions over 256) across iterations and cuts loop-control
    # overhead 8x; bytes and symbols are bit-identical (integer math,
    # same order)
    (states, ptr), syms = jax.lax.scan(
        step, (states, ptr), (rows_u16, ts), unroll=8
    )
    return syms, states, ptr


@partial(jax.jit, donate_argnums=(0,))
def _encode_chunk(states, sf, base, n):
    """Reverse-encode one chunk.  sf (CHUNK_STEPS, K_LANES, 2) u32 per-symbol
    (cdf_low, freq); returns (block (CHUNK*2,) u8 consume-order bytes,
    count () i32, states)."""
    lane = jnp.arange(K_LANES, dtype=jnp.int32)

    def step(carry, xs):
        x = carry
        sf_t, t = xs
        active = base + t * K_LANES + lane < n
        start, freq = sf_t[:, 0], sf_t[:, 1]

        x_max = freq << 15
        c1 = x >= x_max
        c2 = (x >> 8) >= x_max
        cnt = jnp.where(active, c1.astype(jnp.int32) + c2.astype(jnp.int32), 0)
        e0 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        e1 = ((x >> 8) & jnp.uint32(0xFF)).astype(jnp.uint8)
        xr = x >> (jnp.uint32(8) * cnt.astype(jnp.uint32))
        # consume order is the reverse of push order (stack semantics)
        cb0 = jnp.where(cnt == 2, e1, e0)
        cb1 = e0
        x_new = ((xr // freq) << 16) + (xr % freq) + start
        x_new = jnp.where(active, x_new, x)
        return x_new, (cb0, cb1, cnt)

    ts = jnp.arange(CHUNK_STEPS, dtype=jnp.int32)
    sfr = sf.reshape(CHUNK_STEPS, K_LANES, 2)
    states, (cb0, cb1, cnt) = jax.lax.scan(
        step, states, (sfr, ts), reverse=True, unroll=8
    )
    # lay bytes out in decode order: (step asc, lane asc, byte asc).
    # sort-based compaction: pack (dst << 8 | byte) into u32 keys (dst <
    # 2*CHUNK < 2^24 so the pack is injective), one ascending sort moves
    # every valid byte to its stream slot and all invalid keys (0xFFFFFFFF)
    # to the tail.  TPU scatters serialize and a searchsorted compaction
    # costs ~20 ms/chunk in log2(CHUNK) gather rounds; the single fused
    # sort measures 0.2 ms (scratch/prof_rans_enc3.py).
    cnt_f = cnt.reshape(-1)
    pos = (jnp.cumsum(cnt_f) - cnt_f).astype(jnp.uint32)
    total = jnp.sum(cnt_f)
    b0 = cb0.reshape(-1).astype(jnp.uint32)
    b1 = cb1.reshape(-1).astype(jnp.uint32)
    INF = jnp.uint32(0xFFFFFFFF)
    k0 = jnp.where(cnt_f >= 1, (pos << 8) | b0, INF)
    k1 = jnp.where(cnt_f == 2, ((pos + 1) << 8) | b1, INF)
    keys = jnp.sort(jnp.concatenate([k0, k1]))
    buf = (keys & jnp.uint32(0xFF)).astype(jnp.uint8)
    return buf, total, states


@jax.jit
def _compact_blocks(blocks, totals):
    """Pack K chunk blocks (each `totals[k]` valid bytes) back-to-back.

    blocks (K, L) u8, totals (K,) i32 -> ((K*L,) u8 packed stream prefix,
    () i32 total bytes).  Sort-based like _encode_chunk's compaction: each
    valid byte's stream slot is start[k] + offset, packed as (dst << 8 |
    byte) u32 keys and moved by one ascending sort (invalid -> 0xFFFFFFFF
    tail).  Requires dst < 2^24, i.e. streams up to 16 MB — beyond any
    cloud this codec addresses (843k-node bench stream is ~0.3 MB); a
    guard falls back to the searchsorted layout for larger K*L."""
    k, l = blocks.shape
    cum = jnp.cumsum(totals)
    starts = cum - totals
    if k * l < (1 << 24):
        off = jnp.arange(l, dtype=jnp.int32)[None, :]
        dst = (starts[:, None] + off).astype(jnp.uint32)
        valid = off < totals[:, None]
        keys = jnp.where(
            valid, (dst << 8) | blocks.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF)
        )
        keys = jnp.sort(keys.reshape(-1))
        return (keys & jnp.uint32(0xFF)).astype(jnp.uint8), cum[-1]
    j = jnp.arange(k * l, dtype=jnp.int32)
    src = jnp.minimum(
        jnp.searchsorted(cum, j, side="right").astype(jnp.int32), k - 1
    )
    off = j - jnp.take(starts, src)
    vals = blocks[src, jnp.minimum(off, l - 1)]
    return jnp.where(j < cum[-1], vals, 0), cum[-1]


class RansEncoder:
    """Accumulates per-group (cdf_low, freq) device arrays during the
    (forward) model pass; `finish()` runs the reverse-order encode chain —
    all dispatches async, the payload is compacted ON DEVICE and fetched
    in one transfer (one scalar round-trip for the byte count, one bulk
    copy of ~bpp/8 bytes per node)."""

    def __init__(self):
        self.groups: list[tuple[jnp.ndarray, object]] = []  # (sf padded, n)
        self.n_symbols = 0

    def append_group(self, sf: jnp.ndarray, n: int) -> None:
        """sf: (n_pad, 2) u32 with n_pad a CHUNK multiple; n real symbols."""
        assert sf.shape[0] % CHUNK == 0, sf.shape
        if n:
            self.groups.append((sf, int(n)))
            self.n_symbols += int(n)

    def finish(self) -> bytes:
        states = jnp.full((K_LANES,), RANS_L, jnp.uint32)
        rev_blocks: list = []  # (block, total) in reverse stream order
        for sf, n in reversed(self.groups):
            n_chunks = -(-n // CHUNK)
            for c in reversed(range(n_chunks)):
                block, total, states = _encode_chunk(
                    states,
                    jax.lax.dynamic_slice_in_dim(sf, c * CHUNK, CHUNK),
                    jnp.int32(c * CHUNK),
                    jnp.int32(n),
                )
                rev_blocks.append((block, total))
        # lanes beyond the largest group were never touched (still == L):
        # store only the used prefix (matters for small clouds)
        used = min(max((n for _, n in self.groups), default=0), K_LANES)
        out = [np.uint16(used).tobytes()]
        if rev_blocks:
            packed, tot = _compact_blocks(
                jnp.stack([b for b, _ in reversed(rev_blocks)]),
                jnp.stack([t for _, t in reversed(rev_blocks)]),
            )
            head = np.asarray(states)[:used].astype("<u4").tobytes()
            tot = int(tot)
            # fetch a page-rounded prefix: the slice program is shape-
            # parameterized, so standardize lengths to bound compile count
            tot_pad = min(-(-tot // 65536) * 65536, packed.shape[0])
            body = np.asarray(packed[:tot_pad])[:tot].tobytes()
            out += [head, body]
        else:
            out.append(np.asarray(states)[:used].astype("<u4").tobytes())
        return b"".join(out)


class RansDecoder:
    """Holds (states, ptr) on device across groups; the stream is uploaded
    once.  decode_group returns the symbols as a DEVICE array so phase-2 /
    interleaving never round-trips."""

    def __init__(self, payload: bytes):
        if len(payload) < 2:
            raise ValueError("rANS payload shorter than lane-state header")
        used = int(np.frombuffer(payload[:2], np.uint16)[0])
        if used > K_LANES or len(payload) < 2 + 4 * used:
            raise ValueError("corrupt rANS lane-state header")
        states = np.full(K_LANES, 1 << 23, np.uint32)
        states[:used] = np.frombuffer(payload[2 : 2 + 4 * used], "<u4")
        self.states = jnp.asarray(states)
        body = np.frombuffer(payload[2 + 4 * used :], np.uint8)
        # standard buffer size: one compiled _decode_chunk program covers
        # every stream up to 1 MB (bigger clouds recompile once per pow2).
        # headroom: _decode_chunk slices a (2*K_LANES + 2)-byte window at
        # ptr, which can sit at len(body) when the stream is fully drained
        pad = max(
            1 << 20,
            1 << int(np.ceil(np.log2(max(len(body) + 2 * K_LANES + 2, 1)))),
        )
        self.stream = jnp.asarray(
            np.concatenate([body, np.zeros(pad - len(body), np.uint8)])
        )
        self.ptr = jnp.int32(0)

    def decode_group(self, rows_u16: jnp.ndarray, n: int) -> jnp.ndarray:
        """rows_u16: (n_pad, 256) device u16, n_pad a CHUNK multiple.
        Returns (n_pad,) u8 device symbols (valid through n)."""
        assert rows_u16.shape[0] % CHUNK == 0, rows_u16.shape
        outs = []
        for c in range(-(-n // CHUNK)):
            rows_c = jax.lax.dynamic_slice_in_dim(
                rows_u16, c * CHUNK, CHUNK
            ).reshape(CHUNK_STEPS, K_LANES, 256)
            syms, self.states, self.ptr = _decode_chunk(
                self.states, self.ptr, self.stream, rows_c,
                jnp.int32(c * CHUNK), jnp.int32(n),
            )
            outs.append(syms.reshape(-1))
        got = len(outs) * CHUNK
        if got < rows_u16.shape[0]:
            outs.append(jnp.zeros(rows_u16.shape[0] - got, jnp.uint8))
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def pad_to_chunk(n: int) -> int:
    return -(-max(n, 1) // CHUNK) * CHUNK
