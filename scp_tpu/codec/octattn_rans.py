"""Device-side rANS for the OctAttention incremental (KV-cache) schedule.

The incremental codec decodes all chunks of a level in lockstep, one
device dispatch per node-POSITION (octattn_codec.py).  With the host
arithmetic coder, every position costs a blocking CDF-row fetch plus a
per-lane host AC call — over the TPU tunnel that is one ~25-40 ms round
trip per position, ~7k round trips per KITTI scan, and it is the entire
178-267 s decode wall clock (BUILDLOG round 3).

This module puts the entropy coder ON DEVICE for that schedule, so the
position loop becomes a pure async dispatch chain: step -> rANS decode ->
cache insert, with ONE host fetch per level (the decoded occupancies that
feed the numpy child expansion).  Same coder math as codec/rans.py
(byte-renormalized rANS, 16-bit frequencies), different interleaving
contract sized for this schedule:

  * K lanes = pow2 bucket of the cloud's maximum per-level chunk count
    (stamped at the head of the payload, like rans.RansDecoder's).  Lane
    c carries chunk c of every level; lane states persist across levels
    and subtrees.
  * one GROUP per level, in level order; within a level, one decode STEP
    per node-position j (ascending), lanes consumed in ascending order.
    The active-lane count at step j is ceil((n - j) / csz) for j <
    min(csz, n) — both sides derive it from the same (n, csz), so the
    byte layout agrees structurally (n comes from the header level sizes
    at encode and from the decoder's own expansion at decode; they are
    equal by losslessness).
  * the encoder walks levels and steps in exactly reverse order
    (lax.scan(reverse=True) per level) and the payload is compacted on
    device (same sort-based layout as rans._encode_chunk).

Everything is integer uint32 arithmetic — bit-exact on any backend; the
CDF rows come from the SAME step programs on both sides (the existing
incremental consistency contract).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.codec import rans


def stream_cap() -> int:
    """Fixed device stream-buffer size for the FUSED level schedule.

    The fused level program embeds the rANS decode (octattn_codec.
    _fused_level), so the stream buffer's SHAPE is part of the compiled
    program — and the encoder must run the *same* program (with a dummy
    buffer) for its CDF rows to agree structurally with decode.  A fixed
    cap keeps the shape identical on both sides regardless of payload
    size.  2 MiB covers ~6M octree nodes at the measured ~2.8 bits/node;
    raise SCP_OCTRANS_CAP (identically on encoder AND decoder — the value
    is stamped in coding_params) for larger clouds."""
    return int(os.environ.get("SCP_OCTRANS_CAP", 1 << 21))


def lane_bucket(n_chunks: int) -> int:
    """Pow2 lane bucket (matches octattn_codec._lane_count)."""
    lanes = 1
    while lanes < n_chunks:
        lanes *= 2
    return lanes


def active_count(n: int, csz: int, j: int) -> int:
    """Lanes active at position j of an n-node level with chunk size csz:
    lane c is active iff c*csz + j < n."""
    if j >= min(csz, n):
        return 0
    return -(-(n - j) // csz)


def decode_step_core(states, ptr, stream, rows_u16, n_active):
    """Decode one position across the lanes (pure; traced both by the
    per-position `_decode_step` jit and by the fused level scan body in
    octattn_codec._fused_level).

    states (K,) u32, ptr () i32, stream (B,) u8, rows_u16 (lanes, 256)
    with lanes <= K (missing lanes are never active), n_active () i32.
    Returns (syms (K,) i32, states, ptr).  Same per-lane math as
    rans._decode_chunk's scan body."""
    k = states.shape[0]
    r = rans._row_i32(rows_u16)
    if r.shape[0] < k:
        # padded lanes: zero rows decode to the identity transition
        # (start 0, freq 2^16) — and are masked inactive anyway
        r = jnp.pad(r, ((0, k - r.shape[0]), (0, 0)))
    lane = jnp.arange(k, dtype=jnp.int32)
    active = lane < n_active

    slot = (states & jnp.uint32(0xFFFF)).astype(jnp.int32)
    sym = jnp.sum(r[:, :255] <= slot[:, None], axis=-1) - 1
    le = r <= slot[:, None]
    start = jnp.max(jnp.where(le, r, 0), axis=-1)
    top = jnp.min(jnp.where(le, jnp.int32(1 << 16), r), axis=-1)
    freq = (top - start).astype(jnp.uint32)

    x2 = freq * (states >> 16) + slot.astype(jnp.uint32) - start.astype(
        jnp.uint32
    )
    cnt = jnp.where(
        active, (x2 < rans.RANS_L).astype(jnp.int32) + (x2 < rans.HALF_L), 0
    )
    offs = jnp.cumsum(cnt) - cnt
    win = jax.lax.dynamic_slice_in_dim(stream, ptr, 2 * k + 2)
    b0 = jnp.take(win, offs, mode="clip").astype(jnp.uint32)
    b1 = jnp.take(win, offs + 1, mode="clip").astype(jnp.uint32)
    x3 = jnp.where(cnt >= 1, (x2 << 8) | b0, x2)
    x3 = jnp.where(cnt == 2, (x3 << 8) | b1, x3)

    states_new = jnp.where(active, x3, states)
    syms = jnp.where(active, sym, 0)
    return syms, states_new, ptr + jnp.sum(cnt)


_decode_step = partial(jax.jit, donate_argnums=(0,))(decode_step_core)


@partial(jax.jit, donate_argnums=(0,))
def _encode_level(states, sf, n, csz):
    """Reverse-encode one level.  sf (nsteps, lanes, 2) u32 per-(step,
    lane) (cdf_low, freq) — nsteps may exceed min(csz, n) (pow2 step
    bucketing) and lanes may be < K; both paddings encode nothing.
    Returns (block (nsteps*K*2,) u8 consume-order bytes, count, states)."""
    k = states.shape[0]
    nsteps, lanes, _ = sf.shape
    if lanes < k:
        # identity pair (start 0, freq 2^16): x -> x even if unmasked
        idp = jnp.broadcast_to(
            jnp.array([0, 1 << 16], jnp.uint32), (nsteps, k - lanes, 2)
        )
        sf = jnp.concatenate([sf, idp], axis=1)
    lane = jnp.arange(k, dtype=jnp.int32)
    max_m = jnp.minimum(n, csz)

    def step(x, xs):
        sf_t, j = xs
        cnt_act = jnp.maximum(0, (n - j + csz - 1) // csz)
        active = (lane < cnt_act) & (j < max_m)
        start, freq = sf_t[:, 0], sf_t[:, 1]

        x_max = freq << 15
        c1 = x >= x_max
        c2 = (x >> 8) >= x_max
        cnt = jnp.where(active, c1.astype(jnp.int32) + c2.astype(jnp.int32), 0)
        e0 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        e1 = ((x >> 8) & jnp.uint32(0xFF)).astype(jnp.uint8)
        xr = x >> (jnp.uint32(8) * cnt.astype(jnp.uint32))
        cb0 = jnp.where(cnt == 2, e1, e0)
        cb1 = e0
        x_new = ((xr // freq) << 16) + (xr % freq) + start
        x_new = jnp.where(active, x_new, x)
        return x_new, (cb0, cb1, cnt)

    js = jnp.arange(nsteps, dtype=jnp.int32)
    states, (cb0, cb1, cnt) = jax.lax.scan(step, states, (sf, js), reverse=True)

    # consume-order byte layout via one ascending sort (rans._encode_chunk)
    cnt_f = cnt.reshape(-1)
    pos = (jnp.cumsum(cnt_f) - cnt_f).astype(jnp.uint32)
    total = jnp.sum(cnt_f)
    b0 = cb0.reshape(-1).astype(jnp.uint32)
    b1 = cb1.reshape(-1).astype(jnp.uint32)
    inf = jnp.uint32(0xFFFFFFFF)
    k0 = jnp.where(cnt_f >= 1, (pos << 8) | b0, inf)
    k1 = jnp.where(cnt_f == 2, ((pos + 1) << 8) | b1, inf)
    keys = jnp.sort(jnp.concatenate([k0, k1]))
    return (keys & jnp.uint32(0xFF)).astype(jnp.uint8), total, states


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


class OctRansEncoder:
    """Per-level (cdf_low, freq) accumulation during the (forward,
    teacher-forced) step loop; finish() runs the reverse encode chain —
    all dispatches async, one payload fetch."""

    def __init__(self, k_lanes: int):
        assert k_lanes == _pow2(k_lanes) and k_lanes <= 0xFFFF, k_lanes
        self.k = k_lanes
        self.levels: list[tuple[jnp.ndarray, int, int]] = []  # (sf, n, csz)
        self.n_symbols = 0

    def append_level(self, sf: jnp.ndarray, n: int, csz: int) -> None:
        """sf: (nsteps, lanes, 2) u32 device, position-major; n real
        symbols in the level; nsteps a pow2 bucket >= min(csz, n)."""
        assert sf.shape[0] >= min(csz, n), (sf.shape, n, csz)
        if n:
            self.levels.append((sf, int(n), int(csz)))
            self.n_symbols += int(n)

    def finish(self) -> bytes:
        states = jnp.full((self.k,), 1 << 23, jnp.uint32)
        rev_blocks: list = []
        for sf, n, csz in reversed(self.levels):
            block, total, states = _encode_level(
                states, sf, jnp.int32(n), jnp.int32(csz)
            )
            rev_blocks.append((block, total))
        out = [np.uint16(self.k).tobytes()]
        if rev_blocks:
            blocks = [b for b, _ in reversed(rev_blocks)]
            lmax = max(b.shape[0] for b in blocks)
            blocks = [
                b if b.shape[0] == lmax else jnp.pad(b, (0, lmax - b.shape[0]))
                for b in blocks
            ]
            packed, tot = rans._compact_blocks(
                jnp.stack(blocks),
                jnp.stack([t for _, t in reversed(rev_blocks)]),
            )
            out.append(np.asarray(states).astype("<u4").tobytes())
            out.append(np.asarray(packed)[: int(tot)].tobytes())
        else:
            out.append(np.asarray(states).astype("<u4").tobytes())
        blob = b"".join(out)
        if len(blob) - 2 - 4 * self.k + 2 * self.k + 2 > stream_cap():
            raise ValueError(
                f"encoded payload ({len(blob)} B) exceeds SCP_OCTRANS_CAP "
                f"({stream_cap()} B) and could never be decoded; re-encode "
                "with a larger cap (set identically for decode)"
            )
        return blob


class OctRansDecoder:
    """Holds (states, ptr) on device across levels/subtrees; step() is a
    single async dispatch returning device symbols."""

    def __init__(self, payload: bytes):
        if len(payload) < 2:
            raise ValueError("rANS payload shorter than lane-state header")
        k = int(np.frombuffer(payload[:2], np.uint16)[0])
        if k == 0 or k != _pow2(k) or len(payload) < 2 + 4 * k:
            raise ValueError("corrupt incremental-rANS lane header")
        self.k = k
        self.states = jnp.asarray(
            np.frombuffer(payload[2 : 2 + 4 * k], "<u4").copy()
        )
        body = np.frombuffer(payload[2 + 4 * k :], np.uint8)
        # Fixed-size buffer: the fused level program's stream shape must be
        # identical between the encoder's dummy pass and this decode (see
        # stream_cap); payloads that don't fit are a loud error, not a
        # silent shape change that would desync the coder.
        pad = stream_cap()
        if len(body) + 2 * k + 2 > pad:
            raise ValueError(
                f"rANS payload ({len(body)} B) exceeds the fused-schedule "
                f"stream cap ({pad} B); set SCP_OCTRANS_CAP identically on "
                "encoder and decoder to a larger power of two"
            )
        self.stream = jnp.asarray(
            np.concatenate([body, np.zeros(pad - len(body), np.uint8)])
        )
        self.ptr = jnp.int32(0)

    def step(self, rows_u16: jnp.ndarray, n_active: int) -> jnp.ndarray:
        """rows_u16 (lanes, 256) device; returns (K,) i32 device symbols
        (inactive lanes 0)."""
        syms, self.states, self.ptr = _decode_step(
            self.states, self.ptr, self.stream, rows_u16, jnp.int32(n_active)
        )
        return syms
