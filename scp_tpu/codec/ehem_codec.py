"""EHEM wavefront codec — TPU-first, level-major, batched.

What the reference does (compress_ehem encode.py:85-160, decode_ehem.py
:56-188): per octree level, per 8192-node chunk, run the model, emit
group-1 (even) then group-2 (odd) probabilities, with the decoder calling
the arithmetic coder once PER SYMBOL through Python.

What this does instead (same model semantics, bitstream order re-designed
for the hardware):

  * Coding order is LEVEL-MAJOR: all group-1 symbols of a level (chunk
    order), then all group-2 symbols.  Decoding is batched device calls +
    batched native AC calls per level instead of per-chunk Python loops.
  * Full 8192-node chunks are stacked on the batch axis (groups of
    `group_size`), so the MXU sees (G*8192, ...) matmuls.
  * Every shape is a power-of-two bucket -> a handful of XLA programs.
  * The encoder runs the SAME jitted phase programs as the decoder on
    identically padded inputs; quantized CDFs are produced ON DEVICE
    inside those shared programs, so the range coder never desyncs.

Three stream modes (self.mode):

  * "rans" (default): DEVICE-SIDE interleaved rANS (codec/rans.py).  The
    quantized CDF rows never leave HBM: the encoder gathers per-symbol
    (cdf_low, freq) on device and fetches only the compressed byte blocks
    (~bpp/8 B/node); the decoder's lane states live on device and the host
    fetches ONE byte per node (the decoded occupancy) per level parity.
    Stream order per level: all evens, then all odds (chunk order within
    each).  Entropy coding is integer-exact on any backend; only the CDF
    construction (shared phase programs) carries the backend contract.
  * "staged": each 255-way symbol is coded as two 16-way
    nibble stages with exact conditionals (codec/staged.py).  Per node,
    the encoder fetches only the 8-byte pre-gathered coding intervals and
    the decoder fetches two 17-entry uint16 CDF rows (68 B) — 64x / 7.5x
    less host-link traffic than a 255-entry CDF row, at identical rate.
    Stream order per level: evens-hi, evens-lo, odds-hi, odds-lo (chunk
    order within each) -> 2 serial upload round-trips per level.
    Interval/row extraction is pure integer gathering over the shared
    programs' uint16 outputs, so encoder/decoder agreement is structural.
  * "full": one 255-way CDF row per node (round-1 format; kept for A/B
    and for rate parity checks against the reference coder).

The chunk-local checkerboard (even/odd within a chunk) is preserved, so
per-symbol probabilities — and therefore bpp — are identical to the
reference's per-chunk ordering; only the stream permutation differs.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import numpy as np

from scp_tpu import ac
from scp_tpu.codec import rans
from scp_tpu.codec.slices import (
    LevelSlices,
    normalize_positions,
    pad_rows,
    split_levels,
)
from scp_tpu.codec.staged import gather_cond_rows, intervals, staged_cdfs
from scp_tpu.core.octree import occupancy_to_child_octants
from scp_tpu.models.ehem import EHEM
from scp_tpu.utils.profiling import StageTimers


def logits_to_cdf(logits):
    """Device-side softmax + 16-bit CDF quantization (full 255-way mode).

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
    # float32 scale (TPU has no f64).  XLA may lower the cumsum as a
    # parallel prefix whose adjacent entries round in different tree
    # orders, so round() alone can step DOWN by one — the cummax forces
    # monotonicity and the +ramp then makes every row strictly increasing
    # (freq >= 1 for all 255 symbols; the rANS encode divides by freq).
    # Encoder and decoder run this same program so rows agree bit-for-bit.
    scaled = cdf * jnp.float32(65536 - (lp - 1))
    q = jax.lax.cummax(jnp.round(scaled).astype(jnp.int32), axis=scaled.ndim - 1)
    q = q + jnp.arange(lp, dtype=jnp.int32)
    return (q & 0xFFFF).astype(jnp.uint16)


@partial(jax.jit, static_argnums=(3, 4))
def _occ_from_flat(flat, off, n_real, lanes, width):
    """Slice a call's group-1 occupancies out of the flat decoded-symbol
    array (device), masking positions past the real count to the pad token
    — the device-side mirror of the host occ_pad construction."""
    import jax.numpy as jnp

    seg = jax.lax.dynamic_slice_in_dim(flat, off, lanes * width).astype(jnp.int32)
    idx = off + jnp.arange(lanes * width, dtype=jnp.int32)
    return jnp.where(idx < n_real, seg, 255).reshape(lanes, width)


def _cat_pad_dev(parts, n):
    """Concat per-call device tensors into the level-flat layout and pad the
    leading axis to a rANS chunk multiple (padding never lands mid-stream:
    only the last call of a level is partial)."""
    import jax.numpy as jnp

    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    tgt = rans.pad_to_chunk(n)
    if flat.shape[0] > tgt:
        flat = flat[:tgt]
    elif flat.shape[0] < tgt:
        pad = [(0, tgt - flat.shape[0])] + [(0, 0)] * (flat.ndim - 1)
        flat = jnp.pad(flat, pad)
    return flat


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def _call_plan(n: int, csz: int, group: int, small: int, mesh_mult: int = 0):
    """Static per-level call layout: [(row_start, lanes, width)] in chunk
    order (grouped full chunks, leftover full chunks, one bucketed partial)
    plus the padded row count.  Encoder and decoder derive this from the
    same level size (stream header), so the layouts — and therefore the
    compiled phase programs — agree structurally."""
    full = n // csz
    rem = n - full * csz
    # a tail past half a chunk rides the last call as ONE MORE LANE (pads
    # land only at that lane's end, so the level-flat parity layout is
    # unchanged): a 120k-node level is a single (15, 8192) call, not
    # (14, 8192) + (1, 8192-partial)
    if full and rem * 2 > csz:
        full += 1
        rem = 0
    calls = []
    s = 0
    grouped = (full // group) * group
    for _ in range(0, grouped, group):
        calls.append((s, group, csz))
        s += group * csz
    # leftover full chunks ride ONE call with the exact lane count: a KITTI
    # L16 cloud's ~120k-node levels are 14 full chunks — (14, 8192) beats
    # (8)+(4)+(2) (single- and few-lane calls measured ~35% slower per
    # node).  Distinct lane counts compile once each and persist in the
    # XLA cache; real clouds cluster on a handful of counts.
    left = full - grouped
    if mesh_mult > 1:
        # sharded codec: keep leftover lane counts divisible by the mesh
        # (a 14-chunk leftover runs (8)+(6->replicated) instead of one
        # replicated 14-lane call)
        while left >= mesh_mult:
            take = (min(left, group) // mesh_mult) * mesh_mult
            calls.append((s, take, csz))
            s += take * csz
            left -= take
    if left:
        calls.append((s, left, csz))
        s += left * csz
    if rem:
        # partial tail in the smallest covering pow2 bucket (small..csz):
        # a 1.2k-node level runs a (1, 2048) program, not (1, 8192) — the
        # extra shapes compile once and the pad work drops ~4x on the
        # shallow-level tail
        b = small
        while b < rem:
            b *= 2
        b = min(b, csz)
        calls.append((s, 1, b))
        s += b
    return calls, s


# ---- device-resident wavefront kernels (integer-exact; shapes static) ----


def _expand_core(data, pos, occ, n_par, n_child, child_level, unit):
    """Child contexts/positions from parent buffer + parent occupancies.

    Role of the reference's tensorized expansion (decode_ehem.py:113-145),
    on-device: for child slot j, the parent is found by binary search in
    the inclusive prefix sum of per-parent child counts, its octant is the
    rank-th set bit of the parent's occupancy byte.  Rows past n_child are
    written as pad rows (occ 255, rest 0) — exactly what pad_rows() emits,
    so downstream phase calls see identical bytes to the host layout.
    """
    import jax.numpy as jnp

    b = data.shape[0]
    i = jnp.arange(b, dtype=jnp.int32)
    occ1 = occ.astype(jnp.int32) + 1  # 1..255
    b8 = (occ1[:, None] >> jnp.arange(8, dtype=jnp.int32)) & 1  # (B, 8)
    cnt = jnp.where(i < n_par, jnp.sum(b8, axis=1), 0)
    cum = jnp.cumsum(cnt)
    # parent[j] = #{p: cum[p] <= j} — a monotone-vs-monotone merge rank.
    # searchsorted costs ~log2(b) serial gather rounds on TPU (the same
    # pattern that dominated the rANS compaction); two fused sorts do the
    # merge: keys put boundary entries (cum, even key) before queries
    # (odd key) at ties, a cumsum counts boundaries at each sorted slot,
    # and a second sort keyed by query id carries the counts back.
    keys = jnp.concatenate([cum * 2, i * 2 + 1])
    vals = jnp.concatenate([jnp.zeros(b, jnp.int32), i])
    sk, sv = jax.lax.sort_key_val(keys, vals)
    is_cum = (sk & 1) == 0
    r = jnp.cumsum(is_cum.astype(jnp.int32))
    qkey = jnp.where(is_cum, jnp.int32(1 << 30), sv)
    _, ranks = jax.lax.sort_key_val(qkey, r)
    parent = jnp.minimum(ranks[:b], b - 1)
    rank = i - (jnp.take(cum, parent) - jnp.take(cnt, parent))
    pb8 = jnp.take(b8, parent, axis=0)
    # octant = index of the (rank+1)-th set bit (ascending — the BFS child
    # order of occupancy_to_child_octants)
    bcum = jnp.cumsum(pb8, axis=1)
    octant = jnp.argmax(
        (bcum == (rank + 1)[:, None]).astype(jnp.int32), axis=1
    ).astype(jnp.int32)

    pdata = jnp.take(data, parent, axis=0)  # (B, 4, 3)
    row2 = jnp.stack(
        [pdata[:, 3, 0], pdata[:, 3, 1], jnp.take(occ, parent).astype(jnp.int32)],
        axis=1,
    )
    row3 = jnp.stack(
        [
            jnp.broadcast_to(child_level.astype(jnp.int32), (b,)),
            octant + 1,
            jnp.full((b,), 255, jnp.int32),
        ],
        axis=1,
    )
    child = jnp.concatenate(
        [pdata[:, 1:3], row2[:, None], row3[:, None]], axis=1
    )
    bits = jnp.stack(
        [(octant >> 2) & 1, (octant >> 1) & 1, octant & 1], axis=1
    )
    cpos = jnp.take(pos, parent, axis=0) + bits * unit.astype(jnp.int32)
    valid = i < n_child
    pad_row = jnp.array([0, 0, 255], jnp.int32)
    child = jnp.where(valid[:, None, None], child, pad_row[None, None, :])
    cpos = jnp.where(valid[:, None], cpos, 0)
    return child, cpos


def _interleave(evens, odds, b):
    """(e_cap,) x2 -> (b,) BFS-interleaved, by reshape (no gather)."""
    import jax.numpy as jnp

    val = jnp.stack([evens, odds], axis=-1).reshape(-1)
    if val.shape[0] >= b:
        return val[:b]
    return jnp.pad(val, (0, b - val.shape[0]))


def _expand_width(plans, b_cap, li, sizes):
    """Power-of-two work width for the expand at level li -> li+1.

    The round-5 chain attribution measured the expansion chain at ~0.22 s
    of the 0.95 s encode wall (and the same again in decode) with every
    expand running at the full b_cap width; at bench scale 7 of the 14
    expands have <= 32k real rows.  The width only has to cover every row
    a later consumer reads: the child level's phase calls slice at most
    its padded row count (plans[li+1][1]), and the NEXT expand reads
    parent rows < sizes[li+1] <= that same padding.  Rows past the width
    keep stale bytes and are never read."""
    need = max(int(sizes[li]), int(plans[li + 1][1]))
    w = 512
    while w < need:
        w *= 2
    return min(w, b_cap)


def _expand_windowed(data, pos, occ, n_par, n_child, child_level, unit, w):
    """Run _expand_core on the leading w rows; splice back into the
    persistent full-width buffers (w is a static program constant)."""
    if w == data.shape[0]:
        return _expand_core(data, pos, occ, n_par, n_child, child_level, unit)
    child, cpos = _expand_core(
        data[:w], pos[:w], occ, n_par, n_child, child_level, unit
    )
    return (
        jax.lax.dynamic_update_slice_in_dim(data, child, 0, 0),
        jax.lax.dynamic_update_slice_in_dim(pos, cpos, 0, 0),
    )


@partial(jax.jit, donate_argnums=(0, 1), static_argnums=(8,))
def _expand_parity(data, pos, evens, odds, n_par, n_child, child_level, unit, w):
    """Expansion fed by the decoder's parity-split symbol buffers."""
    occ = _interleave(evens, odds, w).astype(evens.dtype)
    return _expand_windowed(data, pos, occ, n_par, n_child, child_level, unit, w)


@partial(jax.jit, donate_argnums=(0, 1), static_argnums=(8,))
def _expand_stream(data, pos, occ_dev, lvl_off, n_par, n_child, child_level, unit, w):
    """Expansion fed by the encoder's uploaded occupancy stream."""
    occ = jax.lax.dynamic_slice_in_dim(occ_dev, lvl_off, w)
    return _expand_windowed(data, pos, occ, n_par, n_child, child_level, unit, w)


@partial(jax.jit, donate_argnums=(0, 1), static_argnums=(7,))
def _expand_flat(data, pos, flat, n_par, n_child, child_level, unit, w):
    """Expansion fed by a tiny level's un-split decoded symbols."""
    import jax.numpy as jnp

    occ = flat[:w] if flat.shape[0] >= w else jnp.pad(flat, (0, w - flat.shape[0]))
    return _expand_windowed(data, pos, occ, n_par, n_child, child_level, unit, w)


@partial(jax.jit, donate_argnums=(0,))
def _emit_parity(out, evens, odds, off, n):
    """Interleave one level's parity buffers into the BFS output stream.

    Windowed: the old full-buffer gather pass cost ~17 ms/call at the
    bench out-cap (scratch/prof_expand.py); a reshape interleave plus a
    (2*e_cap)-wide dynamic slice/update touches only the level's bytes.
    The decode loop sizes `out` with 2*e_cap headroom so the window stays
    in bounds at the last level."""
    import jax.numpy as jnp

    w = 2 * evens.shape[0]
    val = _interleave(evens, odds, w)
    win = jax.lax.dynamic_slice_in_dim(out, off, w)
    win = jnp.where(jnp.arange(w, dtype=jnp.int32) < n, val, win)
    return jax.lax.dynamic_update_slice_in_dim(out, win, off, 0)


@partial(jax.jit, donate_argnums=(0,))
def _emit_flat(out, flat, off, n):
    import jax.numpy as jnp

    w = flat.shape[0]
    win = jax.lax.dynamic_slice_in_dim(out, off, w)
    win = jnp.where(jnp.arange(w, dtype=jnp.int32) < n, flat, win)
    return jax.lax.dynamic_update_slice_in_dim(out, win, off, 0)


class EHEMCodec:
    def __init__(
        self,
        model: EHEM,
        variables: dict,
        context_size: int = 8192,
        group_size: int | None = None,
        mode: str | None = None,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh with a "data" axis — phase
        calls then shard their chunk-lane axis across the mesh (params
        replicated, XLA SPMD inserts the collectives).  Chunks of one
        level are independent, so the wavefront scales to N chips with no
        algorithm change; the rANS lane scan stays on one device."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._rep_sharding = NamedSharding(mesh, PartitionSpec())
            self._lane_spec = lambda nd: NamedSharding(
                mesh, PartitionSpec("data", *([None] * (nd - 1)))
            )
            variables = jax.device_put(variables, self._rep_sharding)
        # Pin params on device once: checkpoint-loaded variables are host
        # numpy arrays, and passing those to jit re-transfers every weight
        # on every call (10x decode slowdown observed over the TPU tunnel).
        self.variables = jax.device_put(variables)
        self.context_size = context_size
        if group_size is None:
            # 16 lanes measured fastest per node on a v5e chip (1.46 us vs
            # 1.97 at 8 and 1.74 at 32 for p1+p2, scratch/prof_wavefront.py)
            group_size = int(os.environ.get("SCP_CODEC_GROUP", 16))
        self.group_size = group_size
        self.mode = mode or os.environ.get("SCP_CODEC_MODE", "rans")
        assert self.mode in ("rans", "staged", "full"), self.mode
        # sharding of the last grouped phase-1 output (None off-mesh):
        # inspected by tests asserting work is actually distributed
        self.last_rows_sharding = None
        assert mesh is None or self.mode == "rans", (
            "sharded codec requires the device entropy coder (mode='rans')"
        )
        self.timers = StageTimers()

        # Variables are runtime arguments (not closure constants) so params
        # stay device buffers instead of HLO constants.  The encoder and
        # decoder share these exact compiled programs — CDF agreement is
        # structural, whatever XLA does to the float math inside.
        if self.mode == "rans":
            self._make_wavefront_fns()
        elif self.mode == "staged":
            self._phase1_fn = jax.jit(
                lambda v, d, p: self._staged_p1(v, d, p)
            )
            self._phase2_fn = jax.jit(
                lambda v, f1, f2, occ1: staged_cdfs(
                    model.apply(
                        v, f1, f2, occ1.astype("int32"), False,
                        method=EHEM.decode_phase2,
                    )
                )
            )
            self._gather_fn = jax.jit(gather_cond_rows)
            self._iv_fn = jax.jit(intervals)
        else:
            self._phase1_fn = jax.jit(
                lambda v, d, p: self._full_p1(v, d, p)
            )
            self._phase2_fn = jax.jit(
                lambda v, f1, f2, occ1: logits_to_cdf(
                    model.apply(
                        v, f1, f2, occ1.astype("int32"), False,
                        method=EHEM.decode_phase2,
                    )
                )
            )

    # Host->device payload compaction: the context channels (level, octant,
    # occupancy incl. the 255 pad token) all fit uint8 and positions are
    # normalized to [0, 1) with exactly-representable 1/65536 steps, so the
    # per-node upload is 18 B instead of 60 B (the tunnel's uplink is as
    # scarce as its downlink).  Encoder and decoder share both the host
    # packing and the on-device unpacking, so the float inputs stay
    # bit-identical on both sides.

    @staticmethod
    def _pack_data(d: np.ndarray) -> np.ndarray:
        return d.astype(np.uint8)

    @staticmethod
    def _pack_pos(p: np.ndarray) -> np.ndarray:
        return np.round(np.clip(p, 0.0, 1.0) * 65535.0).astype(np.uint16)

    # ---- mesh placement ---------------------------------------------------

    def _place(self, arr):
        """Shard a packed batch's lane axis over the mesh when it divides."""
        if self.mesh is None or arr.shape[0] % self.mesh.devices.size:
            return arr
        return jax.device_put(arr, self._lane_spec(arr.ndim))

    def _lane_sharded(self, lanes: int) -> bool:
        """True when a grouped call's lane axis actually distributes over
        the mesh (the sharding-layout test reads last_rows_sharding only
        from such calls — subgroup leftovers replicate by design)."""
        return (
            self.mesh is not None
            and lanes > 1
            and lanes % self.mesh.devices.size == 0
        )

    def _replicate(self, arr):
        return arr if self.mesh is None else jax.device_put(arr, self._rep_sharding)

    def _to_coder(self, arr):
        """Bring a (possibly mesh-sharded) tensor to the entropy coder's
        single device (the rANS lane scan is sequential in the stream)."""
        if self.mesh is None:
            return arr
        return jax.device_put(arr, self.mesh.devices.flat[0])

    def _staged_p1(self, v, d, p):
        import jax.numpy as jnp

        d = d.astype(jnp.int32)
        p = p.astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
        logits1, f1, f2 = self.model.apply(v, d, p, method=EHEM.decode_phase1)
        hi1, cond1 = staged_cdfs(logits1)
        return (hi1, cond1), f1, f2

    def _full_p1(self, v, d, p):
        import jax.numpy as jnp

        d = d.astype(jnp.int32)
        p = p.astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
        logits1, f1, f2 = self.model.apply(v, d, p, method=EHEM.decode_phase1)
        return (logits_to_cdf(logits1),), f1, f2

    def _make_wavefront_fns(self):
        """Jitted programs for the device-resident rANS wavefront.

        The float path — context slicing/packing, position quantization,
        the model trunk, and CDF quantization — is ONE fused program per
        (lanes, width) shape, shared verbatim by encoder and decoder, so
        CDF agreement is structural.  Symbol extraction, (cdf_low, freq)
        gathering, expansion and stream assembly are integer-only programs
        (exact on any backend) and may differ freely between the sides.
        """
        import jax.numpy as jnp

        model = self.model
        mesh = self.mesh

        def p1(v, db, pb, start, clip, lo, scale, lanes, width):
            lw = lanes * width
            d = jax.lax.dynamic_slice_in_dim(db, start, lw)
            d = d.reshape(lanes, width, 4, 3)
            # level channel clipped (deepest level only — caller passes
            # INT32_MAX elsewhere; reference encode_dataset_ehem.py:86)
            d = jnp.concatenate(
                [jnp.minimum(d[..., :1], clip), d[..., 1:]], axis=-1
            )
            p = jax.lax.dynamic_slice_in_dim(pb, start, lw)
            # position quantization contract: normalize -> u16 -> f32
            pf = (p - lo).astype(jnp.float32) * scale
            pu = jnp.round(jnp.clip(pf, 0.0, 1.0) * jnp.float32(65535.0))
            pq = pu.astype(jnp.uint16).astype(jnp.float32) * jnp.float32(
                1.0 / 65535.0
            )
            pq = pq.reshape(lanes, width, 3)
            if mesh is not None and lanes % mesh.devices.size == 0:
                d = jax.lax.with_sharding_constraint(d, self._lane_spec(4))
                pq = jax.lax.with_sharding_constraint(pq, self._lane_spec(3))
            logits1, f1, f2 = model.apply(v, d, pq, method=EHEM.decode_phase1)
            rows1 = logits_to_cdf(logits1)
            return rows1.reshape(lanes * ((width + 1) // 2), 256), f1, f2

        self._p1_buf_fn = partial(jax.jit, static_argnums=(7, 8))(p1)

        def p2(v, f1, f2, occ):
            rows = logits_to_cdf(
                model.apply(
                    v, f1, f2, occ.astype(jnp.int32), False,
                    method=EHEM.decode_phase2,
                )
            )
            return rows.reshape(-1, 256)

        self._p2_buf_fn = jax.jit(p2)

        # ---- integer-only helpers ----

        def syms_call(occ_dev, gstart, n_end, lanes, width):
            lw = lanes * width
            seg = jax.lax.dynamic_slice_in_dim(occ_dev, gstart, lw)
            idx = gstart + jnp.arange(lw, dtype=jnp.int32)
            seg = jnp.where(idx < n_end, seg.astype(jnp.int32), 255)
            seg = seg.reshape(lanes, width)
            return seg[:, 0::2], seg[:, 1::2]

        self._syms_fn = partial(jax.jit, static_argnums=(3, 4))(syms_call)

        def sf_flat(rows_flat, syms):
            return rans.gather_start_freq(rows_flat, syms.reshape(-1))

        self._sf_flat_fn = jax.jit(sf_flat)

        def sf_uniform(uniform_rows, occ_dev, off, n):
            seg = jax.lax.dynamic_slice_in_dim(occ_dev, off, rans.CHUNK)
            syms = jnp.where(
                jnp.arange(rans.CHUNK, dtype=jnp.int32) < n,
                seg.astype(jnp.int32),
                0,
            )
            return rans.gather_start_freq(uniform_rows, syms)

        self._sf_uniform_fn = jax.jit(sf_uniform)

        def pad_cap(x, cap):
            return jnp.pad(x, (0, cap - x.shape[0]))

        self._pad_cap_fn = partial(jax.jit, static_argnums=(1,))(pad_cap)

    # ---- wavefront plumbing ------------------------------------------------

    def _plan_levels(self, level_sizes):
        """Per-level call plans + standardized buffer capacities.

        Capacities are rounded to powers of two so one cloud-size class
        compiles one program set (the XLA programs are parameterized by
        buffer shapes, and each compile costs real wall-clock over the
        TPU tunnel)."""
        csz, g, small = self.context_size, self.group_size, self._small_bucket
        mm = 0 if self.mesh is None else self.mesh.devices.size
        plans = []
        for n in level_sizes:
            if n <= self.TINY_UNIFORM_MAX:
                plans.append(([], n))
            else:
                plans.append(_call_plan(n, csz, g, small, mesh_mult=mm))
        b_cap = _pow2(max(p[1] for p in plans))
        e_cap = max(rans.CHUNK, b_cap // 2)
        return plans, b_cap, e_cap

    def _root_bufs(self, b_cap: int):
        """Device context/position buffers holding the level-1 root.

        Pad rows match pad_rows(): level/octant/pos 0, occupancy 255."""
        data = np.zeros((b_cap, 4, 3), np.int32)
        data[:, :, 2] = 255
        data[0, 3, 0] = 1
        data[0, 3, 1] = 1
        pos = np.zeros((b_cap, 3), np.int32)
        return self._replicate_or_put(data), self._replicate_or_put(pos)

    def _replicate_or_put(self, arr):
        if self.mesh is not None:
            return jax.device_put(arr, self._rep_sharding)
        return jax.device_put(arr)

    @staticmethod
    def _norm_params(mm, max_level: int, angular: bool):
        """(lo, scale) for the in-program position normalization — pure
        integers/floats derived from header fields, identical on both
        sides (encode_dataset_ehem.py:69-75 semantics)."""
        if angular:
            lo, hi = int(mm[0]), int(mm[1])
            return np.int32(lo), np.float32(1.0 / (hi - lo + 1e-9))
        return np.int32(0), np.float32(1.0 / float(2**max_level))

    def _clip_for(self, level: int, max_level: int, lidar_clip):
        if lidar_clip is not None and level == max_level:
            return np.int32(lidar_clip)
        return np.int32(2**31 - 1)

    def coding_params(self) -> str:
        """Stamp of every knob that changes the compiled phase programs'
        float math — written to the stream header; decode refuses a
        mismatch (same contract as the backend stamp).  Numeric knobs are
        canonicalized (repr of the parsed value) so numerically identical
        settings ("0.850" vs "0.85") stamp identically on both sides."""
        import jax.numpy as jnp

        recall = repr(float(os.environ.get("SCP_KNN_RECALL", 0.85)))
        return (
            f"knn_recall={recall};"
            f"exact_knn={1 if os.environ.get('SCP_EXACT_KNN') else 0};"
            f"pallas_attn={1 if os.environ.get('SCP_PALLAS_ATTN') else 0};"
            f"group={self.group_size};"
            f"tiny={self.TINY_UNIFORM_MAX};"
            f"dtype={jnp.dtype(self.model.dtype).name};"
            f"plan=tailmerge;"  # call-plan generation (lane layout + buckets)
            # trunk implementation toggles (all change the phase programs'
            # float math): fused multiscale heads, folded inference BN,
            # score-matrix storage dtype
            f"msfuse={0 if os.environ.get('SCP_NO_MSFUSE') else 1};"
            f"fusedmlp={0 if os.environ.get('SCP_NO_FUSED_MLP') else 1};"
            f"fusedattn={0 if os.environ.get('SCP_NO_FUSED_ATTN') else 1};"
            # SCP_ATTN_BLOCK / SCP_MLP_TILE are deliberately NOT stamped:
            # both only re-tile the Pallas grid (row-identical math — the
            # contraction order inside each row is unchanged), and their
            # effective values are per-shape (clamped/divisor-degraded in
            # _pick_tile/_pick_block), so stamping the raw env value caused
            # spurious decode refusals between numerically identical
            # settings (e.g. SCP_MLP_TILE=256 clamps to 512).
            f"bnfold={0 if os.environ.get('SCP_NO_BNFOLD') else 1};"
            f"knn_f32={1 if os.environ.get('SCP_KNN_F32') else 0};"
            f"pallas_knn={1 if os.environ.get('SCP_PALLAS_KNN') else 0};"
            f"staticknn={1 if os.environ.get('SCP_STATIC_KNN') else 0};"
            # the one-hot lookup itself is bit-exact vs the gather
            # (test_onehot_embed_matches_gather) but swapping it changes
            # XLA's fusion choices DOWNSTREAM of the embeds, which moves
            # rounding points elsewhere in the phase program (measured:
            # CDF rows differ on chip between the two builds) — stamped
            f"onehotembed={0 if os.environ.get('SCP_NO_ONEHOT_EMBED') else 1};"
            # k-major gather+max is bit-exact per node but, like the
            # one-hot swap, changes XLA fusion downstream — stamped
            f"kmajormax={0 if os.environ.get('SCP_NO_KMAJOR_MAX') else 1};"
            f"mesh={0 if self.mesh is None else self.mesh.devices.size}"
        )

    @property
    def ac_symbols_per_node(self) -> int:
        """AC steps per occupancy symbol (2 nibble stages when staged)."""
        return 2 if self.mode == "staged" else 1

    # ---- stream coder construction (mode-aware) ---------------------------

    def new_stream_encoder(self):
        return rans.RansEncoder() if self.mode == "rans" else ac.StreamingEncoder()

    @staticmethod
    def finish_stream(enc):
        """-> (payload bytes, bit count, n_sym for the header)."""
        from scp_tpu.codec.octattn_rans import OctRansEncoder

        if isinstance(enc, (rans.RansEncoder, OctRansEncoder)):
            payload = enc.finish()
            return payload, len(payload) * 8, enc.n_symbols
        n_sym = enc.n_sym
        payload, bits = enc.finish()
        return payload, bits, n_sym

    def new_stream_decoder(self, payload: bytes, n_sym: int):
        if self.mode == "rans":
            return rans.RansDecoder(payload)
        return ac.ArithmeticDecoder(payload, n_sym)

    # ---- batched chunk drivers ------------------------------------------

    def _level_chunks(self, d, pos):
        """Split one level into chunk index ranges [(start, m), ...]."""
        csz = self.context_size
        n = d.shape[0]
        return [(s, min(csz, n - s)) for s in range(0, n, csz)]

    @property
    def _small_bucket(self) -> int:
        # one sub-chunk bucket bounds pad waste on small levels while
        # keeping the compiled-shape set tiny (XLA compiles on the tunnel
        # cost ~40s per program; every extra shape is a real warmup cost)
        return max(32, self.context_size // 8)

    def _phase1_level(self, d, pos, fn=None):
        """Run phase 1 for every chunk of a level.

        Returns a list of calls [(chunk_list, outs, f1, f2, bucket)] in
        chunk order, where `outs` is the mode-specific CDF tuple and
        (f1, f2) carry the device residuals for phase 2.  Device dispatch
        is async; outputs are fetched lazily.

        Shape discipline: every call is one of THREE shapes —
        (group_size, csz) for grouped full chunks, (1, csz) for leftover
        full chunks / large partials, (1, csz/8) for small levels."""
        if fn is None:
            fn = self._phase1_fn
        csz = self.context_size
        chunks = self._level_chunks(d, pos)
        full = [(s, m) for (s, m) in chunks if m == csz]
        partial = [(s, m) for (s, m) in chunks if m < csz]

        calls = []
        g = self.group_size
        with self.timers.stage("dispatch_p1"):
            n_grouped = (len(full) // g) * g
            for i in range(0, n_grouped, g):
                batch = full[i : i + g]
                db = self._place(
                    self._pack_data(np.stack([d[s : s + m] for s, m in batch]))
                )
                pb = self._place(
                    self._pack_pos(np.stack([pos[s : s + m] for s, m in batch]))
                )
                outs, f1, f2 = fn(self.variables, db, pb)
                calls.append((batch, outs, f1, f2, csz))
            singles = full[n_grouped:] + partial
            for s, m in singles:
                b = self._small_bucket if m <= self._small_bucket else csz
                dp, pp = pad_rows(d[s : s + m], pos[s : s + m], b)
                outs, f1, f2 = fn(
                    self.variables,
                    self._pack_data(dp[None]),
                    self._pack_pos(pp[None]),
                )
                calls.append(([(s, m)], outs, f1, f2, b))
        return calls

    @staticmethod
    def _group_syms(batch, occ, n_lanes, width, parity):
        """Pack per-chunk group symbols into a padded (n_lanes, width) array
        (pad token 255)."""
        out = np.full((n_lanes, width), 255, np.uint8)
        for bi, (s, m) in enumerate(batch):
            sel = occ[s : s + m][parity::2]
            out[bi, : sel.shape[0]] = sel
        return out

    def warmup(self, slices: LevelSlices) -> int:
        """Compile every program this cloud will use (excluded from bench
        timing).  Returns the number of distinct phase shapes touched.

        rans mode: the cheapest COMPLETE warm is one real encode+decode
        roundtrip — every fused phase program, stream-assembly arity,
        expansion and emit program of this cloud's level composition
        compiles exactly once (and lands in the persistent XLA cache)."""
        if self.mode == "rans":
            plans, _, _ = self._plan_levels(slices.level_sizes)
            shapes = {(la, w) for calls, _ in plans for _, la, w in calls}
            stream, _, _ = self.encode_to_stream(slices)
            dec = self.new_stream_decoder(stream, slices.occ_stream.shape[0])
            self.decode(
                dec,
                slices.max_level,
                np.array(slices.pos_mm, np.int64),
                angular=slices.angular,
                level_sizes=slices.level_sizes,
            )
            self.timers.totals.clear()
            self.timers.counts.clear()
            return len(shapes)

        csz = self.context_size
        shapes = set()
        for li in range(slices.num_levels):
            n = slices.data[li].shape[0]
            n_full = n // csz
            if n_full >= self.group_size:
                shapes.add((self.group_size, csz))
            if n_full % self.group_size:
                shapes.add((1, csz))
            rem = n % csz
            if rem:
                shapes.add((1, self._small_bucket if rem <= self._small_bucket else csz))
        for bsz, bucket in sorted(shapes):
            d = np.zeros((bsz, bucket, 4, 3), np.uint8)
            d[:, :, :, 2] = 255
            p = np.zeros((bsz, bucket, 3), np.uint16)
            outs, f1, f2 = self._phase1_fn(self.variables, d, p)
            occ = np.full((bsz, (bucket + 1) // 2), 255, np.uint8)
            outs2 = self._phase2_fn(self.variables, f1, f2, occ)
            if self.mode == "staged":
                hi1, cond1 = outs
                hi2, cond2 = outs2
                iv1 = self._iv_fn(hi1, cond1, occ)
                iv2 = self._iv_fn(hi2, cond2, occ[:, : bucket // 2])
                g1 = self._gather_fn(cond1, np.zeros_like(occ))
                g2 = self._gather_fn(cond2, np.zeros_like(occ[:, : bucket // 2]))
                fetch = (iv1, iv2, hi1, hi2, g1, g2)
            else:
                fetch = (outs[0], outs2)
            # fetch every output: initializes the device->host transfer path
            # for each shape too (first-fetch costs are large on remote TPU)
            for x in fetch:
                np.asarray(x)
        return len(shapes)

    # ---- encode -----------------------------------------------------------

    def encode_to_stream(self, slices: LevelSlices, lidar_clip=None):
        """Encode a sliced cloud -> (stream_bytes, bit_count, model_seconds)."""
        enc = self.new_stream_encoder()
        elapsed = self.encode_into(enc, slices, lidar_clip=lidar_clip)
        # the dispatch stages above return in ~0.2s; this stage is where
        # the wall clock actually goes — the host blocking on the async
        # device chain (model phases -> sf gathers -> rANS encode scans)
        # at the payload fetch
        with self.timers.stage("finish_chain"):
            stream, bits, _ = self.finish_stream(enc)
        return stream, bits, elapsed

    def encode_into(self, enc, slices: LevelSlices, lidar_clip=None) -> float:
        """Encode one sliced (sub)tree into an open streaming encoder (the
        multi-level driver feeds 3 subtrees through one stream, role of
        reference encode_mullevel.py:106-146).  Returns elapsed seconds.

        All device work for ALL levels is dispatched up front (encoding has
        no sequential dependency); the emission pass streams results off
        the device while it is still computing deeper levels.  In "rans"
        mode nothing is fetched here at all — groups accumulate as device
        arrays and the byte blocks materialize in finish_stream."""
        t0 = time.time()
        if self.mode == "rans":
            self._encode_rans_device(enc, slices, lidar_clip)
        elif self.mode == "staged":
            per_level = [
                self._encode_level_staged_dispatch(li, slices)
                for li in range(slices.num_levels)
            ]
            for chunks, iv_calls in per_level:
                self._emit_level_staged(chunks, iv_calls, enc)
        else:
            per_level = [
                self._encode_level_full_dispatch(li, slices)
                for li in range(slices.num_levels)
            ]
            for chunks, calls, p2_calls, occ in per_level:
                self._emit_level_full(chunks, calls, p2_calls, occ, enc)
        return time.time() - t0

    # -- rans mode --

    # Levels this small are all chain latency and no information: code them
    # against a fixed uniform prior and skip the model round-trip entirely.
    # At 512 the uniform tail of a KITTI L16 cloud is ~330 nodes x ~5 extra
    # bits ≈ 0.01 bpp, for two fewer phase call pairs + rANS scans per
    # direction.  Encoder and decoder branch on the same header n.
    TINY_UNIFORM_MAX = 512

    def _uniform_rows(self):
        import jax.numpy as jnp

        if not hasattr(self, "_uni_rows"):
            row = logits_to_cdf(jnp.zeros((1, 255), jnp.float32))
            self._uni_rows = jnp.broadcast_to(
                row, (rans.CHUNK, 256)
            ) + jnp.zeros((1,), jnp.uint16)  # materialize once
        return self._uni_rows

    def _encode_rans_device(self, enc, slices: LevelSlices, lidar_clip=None):
        """Device-resident wavefront encode.

        The only host->device payload is the occupancy byte stream (1 B per
        node, uploaded once); contexts and positions are derived level by
        level ON DEVICE by the same expansion the decoder runs, so the
        phase programs see bit-identical inputs on both sides by
        construction.  Nothing is fetched here — the compressed blocks
        materialize in finish_stream()."""
        sizes = slices.level_sizes
        max_level = slices.max_level
        plans, b_cap, e_cap = self._plan_levels(sizes)
        total = sum(sizes)
        n_cap = _pow2(total + max(b_cap, rans.CHUNK))
        occ_host = np.zeros(n_cap, np.uint8)
        occ_host[:total] = slices.occ_stream.astype(np.uint8)
        occ_dev = self._replicate_or_put(occ_host)
        data_buf, pos_buf = self._root_bufs(b_cap)

        off = 0
        for li, n in enumerate(sizes):
            level = li + 1
            clip = self._clip_for(level, max_level, lidar_clip)
            lo, scale = self._norm_params(
                slices.pos_mm[li] if slices.angular else (0, 0),
                max_level,
                slices.angular,
            )
            if n <= self.TINY_UNIFORM_MAX:
                with self.timers.stage("dispatch_p1"):
                    sf = self._sf_uniform_fn(
                        self._uniform_rows(), occ_dev, np.int32(off), np.int32(n)
                    )
                    enc.append_group(self._to_coder(sf), n)
            else:
                calls, _ = plans[li]
                ne, no = (n + 1) // 2, n // 2
                sf_e, sf_o = [], []
                for s, lanes, width in calls:
                    with self.timers.stage("dispatch_p1"):
                        rows1, f1, f2 = self._p1_buf_fn(
                            self.variables, data_buf, pos_buf,
                            np.int32(s), clip, lo, scale, lanes, width,
                        )
                        if self._lane_sharded(lanes):
                            self.last_rows_sharding = rows1.sharding
                    with self.timers.stage("dispatch_p2"):
                        evens, odds = self._syms_fn(
                            occ_dev, np.int32(off + s), np.int32(off + n),
                            lanes, width,
                        )
                        sf_e.append(self._to_coder(self._sf_flat_fn(rows1, evens)))
                        rows2 = self._p2_buf_fn(self.variables, f1, f2, evens)
                        sf_o.append(self._to_coder(self._sf_flat_fn(rows2, odds)))
                enc.append_group(_cat_pad_dev(sf_e, ne), ne)
                if no:
                    enc.append_group(_cat_pad_dev(sf_o, no), no)
            if level < max_level:
                with self.timers.stage("dispatch_expand"):
                    unit = np.int32(1 << (max_level - (level + 1) + 1))
                    data_buf, pos_buf = _expand_stream(
                        data_buf, pos_buf, occ_dev, np.int32(off),
                        np.int32(n), np.int32(sizes[li + 1]),
                        np.int32(level + 1), unit,
                        _expand_width(plans, b_cap, li, sizes),
                    )
            off += n

    # -- staged mode --

    def _encode_level_staged_dispatch(self, li, slices):
        d = slices.data[li]
        pos = slices.level_pos(li)
        occ = d[:, -1, 2]
        calls = self._phase1_level(d, pos)
        iv_calls = []
        with self.timers.stage("dispatch_iv"):
            for batch, (hi1, cond1), f1, f2, b in calls:
                lanes = hi1.shape[0]
                evens = self._group_syms(batch, occ, lanes, (b + 1) // 2, 0)
                odds = self._group_syms(batch, occ, lanes, b // 2, 1)
                iv1 = self._iv_fn(hi1, cond1, evens)
                hi2, cond2 = self._phase2_fn(self.variables, f1, f2, evens)
                iv2 = self._iv_fn(hi2, cond2, odds)
                iv_calls.append((batch, iv1, iv2))
        return self._level_chunks(d, pos), iv_calls

    def _emit_level_staged(self, chunks, iv_calls, enc):
        """Fetch intervals + feed the AC in stream order:
        evens-hi, evens-lo, odds-hi, odds-lo (chunk order within each)."""
        ev, od = {}, {}
        for batch, iv1, iv2 in iv_calls:
            with self.timers.stage("fetch_iv"):
                h1, h2 = np.asarray(iv1), np.asarray(iv2)
            for bi, (s, m) in enumerate(batch):
                ev[s] = h1[bi, : (m + 1) // 2]  # (ne, 2, 2)
                od[s] = h2[bi, : m // 2]
        starts = sorted(ev)
        with self.timers.stage("ac_encode"):
            enc.append_intervals(np.concatenate([ev[s][:, 0] for s in starts]))
            enc.append_intervals(np.concatenate([ev[s][:, 1] for s in starts]))
            od_list = [od[s] for s in starts if od[s].shape[0]]
            if od_list:
                enc.append_intervals(np.concatenate([o[:, 0] for o in od_list]))
                enc.append_intervals(np.concatenate([o[:, 1] for o in od_list]))

    # -- full mode --

    def _encode_level_full_dispatch(self, li, slices):
        d = slices.data[li]
        pos = slices.level_pos(li)
        occ = d[:, -1, 2]
        calls = self._phase1_level(d, pos)
        p2_calls = []
        for batch, _outs, f1, f2, b in calls:
            lanes = f1.shape[0]
            evens = self._group_syms(batch, occ, lanes, (b + 1) // 2, 0)
            p2_calls.append((batch, self._phase2_fn(self.variables, f1, f2, evens)))
        return self._level_chunks(d, pos), calls, p2_calls, occ

    def _emit_level_full(self, chunks, calls, p2_calls, occ, enc):
        rows = {}
        for batch, (cdf1,), _f1, _f2, _b in calls:
            host = np.asarray(cdf1)
            for bi, (s, m) in enumerate(batch):
                rows[s] = host[bi, : (m + 1) // 2]
        for s, m in chunks:
            enc.append_quantized(rows[s], occ[s : s + m][0::2].astype(np.int16))
        rows2 = {}
        for batch, cdf2 in p2_calls:
            host = np.asarray(cdf2)
            for bi, (s, m) in enumerate(batch):
                if m // 2:
                    rows2[s] = host[bi, : m // 2]
        for s, m in chunks:
            if m // 2:
                enc.append_quantized(rows2[s], occ[s : s + m][1::2].astype(np.int16))

    # ---- decode -----------------------------------------------------------

    def decode(
        self,
        dec: ac.ArithmeticDecoder,
        max_level: int,
        pos_mm: np.ndarray,
        angular: bool,
        lidar_clip: int | None = None,
        ground_truth: np.ndarray | None = None,
        level_sizes=None,
    ) -> np.ndarray:
        """Level-wavefront decode from an open AC decoder.

        pos_mm: (max_level, 2) per-level (min, max) of current-node grid
        positions (ignored when not angular).  level_sizes: per-level node
        counts from the stream header — required in "rans" mode, where they
        make every wavefront shape known up front so the whole decode is
        dispatched device-resident.  Returns occupancies 0..254 in BFS
        order.  `ground_truth` enables the reference's decode-time assert
        (reference decode_ehem.py:184).
        """
        if self.mode == "rans":
            assert level_sizes is not None, (
                "rans decode needs the header's per-level node counts"
            )
            return self._decode_rans_device(
                dec, max_level, pos_mm, angular, lidar_clip, level_sizes,
                ground_truth,
            )

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
            dc = data
            if lidar_clip is not None and level == max_level:
                # deepest level's level channel only — mirrors the encode
                # split (split_levels; reference encode_dataset_ehem.py:86)
                dc = data.copy()
                dc[:, :, 0] = np.minimum(dc[:, :, 0], lidar_clip)

            if self.mode == "staged":
                level_occ = self._decode_level_staged(dec, dc, pos)
            else:
                level_occ = self._decode_level_full(dec, dc, pos)

            if ground_truth is not None:
                want = ground_truth[decoded : decoded + n]
                assert (want == level_occ.astype(np.int16)).all(), (
                    f"decode mismatch at level {level}"
                )
            decoded += n
            codes.append(level_occ.astype(np.int16))
            if level == max_level:
                break
            with self.timers.stage("expand"):
                data, pos_int = _expand_children(
                    data, pos_int, level_occ, level + 1, max_level
                )
        return np.concatenate(codes)

    def decode_steps(
        self, dec, max_level, pos_mm, angular, lidar_clip=None,
        ground_truth=None, level_sizes=None,
    ):
        """Public stepper for interleaved multi-cloud decoding (rans mode):
        a generator yielding per dispatched level; StopIteration.value is
        the decoded codes (drive with the bench's round-robin loop)."""
        assert self.mode == "rans", self.mode
        return self._decode_rans_steps(
            dec, max_level, pos_mm, angular, lidar_clip, level_sizes,
            ground_truth,
        )

    def _decode_rans_device(
        self, dec, max_level, pos_mm, angular, lidar_clip, level_sizes,
        ground_truth,
    ):
        gen = self._decode_rans_steps(
            dec, max_level, pos_mm, angular, lidar_clip, level_sizes,
            ground_truth,
        )
        try:
            while True:
                next(gen)
        except StopIteration as e:
            return e.value

    def _decode_rans_steps(
        self, dec, max_level, pos_mm, angular, lidar_clip, level_sizes,
        ground_truth,
    ):
        """Device-resident wavefront decode.

        Contexts, positions, decoded symbols and the assembled BFS stream
        all live in HBM across levels; the level loop only enqueues work
        (shapes are known from the header), so the one host round-trip of
        the whole decode is the final 1 B/node output fetch.  Role of the
        reference wavefront (decode_ehem.py:102-188) with the host taken
        off the critical path.

        Written as a GENERATOR yielding after each level's dispatch so a
        driver can interleave several independent decodes (bench.py
        --pipeline: cloud B's dispatches ride in cloud A's host gaps);
        the return value (StopIteration.value) is the decoded codes."""
        import jax.numpy as jnp

        sizes = [int(s) for s in level_sizes]
        assert len(sizes) == max_level, (len(sizes), max_level)
        plans, b_cap, e_cap = self._plan_levels(sizes)
        total = sum(sizes)
        # emit programs write a full (2*e_cap | CHUNK)-wide window at each
        # level offset — keep that window in bounds at the last level
        n_cap = _pow2(max(total, 1)) + max(2 * e_cap, rans.CHUNK)
        out = self._replicate_or_put(np.zeros(n_cap, np.uint8))
        data_buf, pos_buf = self._root_bufs(b_cap)

        off = 0
        for li, n in enumerate(sizes):
            level = li + 1
            clip = self._clip_for(level, max_level, lidar_clip)
            lo, scale = self._norm_params(
                pos_mm[li] if angular else (0, 0), max_level, angular
            )
            if n <= self.TINY_UNIFORM_MAX:
                with self.timers.stage("dispatch_rans"):
                    flat = dec.decode_group(
                        self._to_coder(self._uniform_rows()), n
                    )
                    flat = self._replicate(flat)
                out = _emit_flat(out, flat, np.int32(off), np.int32(n))
                if level < max_level:
                    with self.timers.stage("dispatch_expand"):
                        unit = np.int32(1 << (max_level - (level + 1) + 1))
                        data_buf, pos_buf = _expand_flat(
                            data_buf, pos_buf, flat, np.int32(n),
                            np.int32(sizes[li + 1]), np.int32(level + 1), unit,
                            _expand_width(plans, b_cap, li, sizes),
                        )
                off += n
                yield li
                continue

            calls, _ = plans[li]
            ne, no = (n + 1) // 2, n // 2
            p1_outs = []
            with self.timers.stage("dispatch_p1"):
                for s, lanes, width in calls:
                    rows1, f1, f2 = self._p1_buf_fn(
                        self.variables, data_buf, pos_buf,
                        np.int32(s), clip, lo, scale, lanes, width,
                    )
                    if self._lane_sharded(lanes):
                        self.last_rows_sharding = rows1.sharding
                    p1_outs.append((s, lanes, width, rows1, f1, f2))

            with self.timers.stage("dispatch_rans"):
                rows_e = _cat_pad_dev(
                    [self._to_coder(o[3]) for o in p1_outs], ne
                )
                evens_cap = self._pad_cap_fn(dec.decode_group(rows_e, ne), e_cap)

            rows2 = []
            with self.timers.stage("dispatch_p2"):
                for s, lanes, width, _rows1, f1, f2 in p1_outs:
                    occ = self._replicate(
                        _occ_from_flat(
                            evens_cap, jnp.int32(s // 2), jnp.int32(ne),
                            lanes, (width + 1) // 2,
                        )
                    )
                    rows2.append(
                        self._to_coder(self._p2_buf_fn(self.variables, f1, f2, occ))
                    )

            if no:
                with self.timers.stage("dispatch_rans"):
                    odds_cap = self._pad_cap_fn(
                        dec.decode_group(_cat_pad_dev(rows2, no), no), e_cap
                    )
            else:
                odds_cap = evens_cap

            ev_r, od_r = self._replicate(evens_cap), self._replicate(odds_cap)
            out = _emit_parity(out, ev_r, od_r, np.int32(off), np.int32(n))
            if level < max_level:
                with self.timers.stage("dispatch_expand"):
                    unit = np.int32(1 << (max_level - (level + 1) + 1))
                    data_buf, pos_buf = _expand_parity(
                        data_buf, pos_buf, ev_r, od_r, np.int32(n),
                        np.int32(sizes[li + 1]), np.int32(level + 1), unit,
                        _expand_width(plans, b_cap, li, sizes),
                    )
            off += n
            yield li

        with self.timers.stage("fetch_out"):
            if hasattr(out, "copy_to_host_async"):
                out.copy_to_host_async()
            codes = np.asarray(out)[:total].astype(np.int16)
        if ground_truth is not None:
            bad = np.nonzero(ground_truth[:total] != codes)[0]
            if bad.size:
                i = int(bad[0])
                lvl = int(np.searchsorted(np.cumsum(sizes), i, side="right")) + 1
                raise AssertionError(
                    f"decode mismatch at node {i} (level {lvl}): "
                    f"got {int(codes[i])}, want {int(ground_truth[i])}"
                )
        return codes

    def _decode_level_staged(self, dec, dc, pos):
        """Staged wavefront decode of one level.

        Serial structure per level: fetch hi CDFs (phase1 pre-dispatched)
        -> AC hi -> ONE upload+gather round trip -> AC lo -> phase2 ->
        same for odds.  Gathers for call-group k are dispatched while the
        host is still AC-decoding group k+1's hi rows, so transfers and
        device work overlap the (serial) arithmetic coder."""
        chunks = self._level_chunks(dc, pos)
        calls = self._phase1_level(dc, pos)

        # evens: hi stage (+ immediate conditional-row gather dispatch)
        hi_by_chunk = {}
        gathers = []
        for batch, (hi1, cond1), f1, f2, b in calls:
            with self.timers.stage("fetch_cdf"):
                host = np.asarray(hi1)
            hi_pad = np.zeros((host.shape[0], host.shape[1]), np.uint8)
            with self.timers.stage("ac_decode"):
                for bi, (s, m) in enumerate(batch):
                    ne = (m + 1) // 2
                    hi = dec.decode_batch_quantized(host[bi, :ne]).astype(np.int32)
                    hi_by_chunk[s] = hi
                    hi_pad[bi, :ne] = hi
            with self.timers.stage("dispatch_gather"):
                gathers.append(self._gather_fn(cond1, hi_pad))

        # evens: lo stage -> full even occupancies -> phase-2 dispatch
        evens_by_chunk = {}
        p2_calls = []
        for (batch, _outs, f1, f2, b), g in zip(calls, gathers):
            with self.timers.stage("fetch_cdf"):
                host = np.asarray(g)
            occ_pad = np.full((host.shape[0], host.shape[1]), 255, np.uint8)
            with self.timers.stage("ac_decode"):
                for bi, (s, m) in enumerate(batch):
                    ne = (m + 1) // 2
                    lo = dec.decode_batch_quantized(host[bi, :ne]).astype(np.int32)
                    occ = hi_by_chunk[s] * 16 + lo
                    evens_by_chunk[s] = occ
                    occ_pad[bi, :ne] = occ
            with self.timers.stage("dispatch_p2"):
                p2_calls.append(
                    (batch, self._phase2_fn(self.variables, f1, f2, occ_pad))
                )

        # odds: hi stage
        hi2_by_chunk = {}
        gathers2 = []
        for batch, (hi2, cond2) in p2_calls:
            with self.timers.stage("fetch_cdf"):
                host = np.asarray(hi2)
            hi_pad = np.zeros((host.shape[0], host.shape[1]), np.uint8)
            with self.timers.stage("ac_decode"):
                for bi, (s, m) in enumerate(batch):
                    no = m // 2
                    if not no:
                        continue
                    hi = dec.decode_batch_quantized(host[bi, :no]).astype(np.int32)
                    hi2_by_chunk[s] = hi
                    hi_pad[bi, :no] = hi
            with self.timers.stage("dispatch_gather"):
                gathers2.append(self._gather_fn(cond2, hi_pad))

        # odds: lo stage
        odds_by_chunk = {}
        for (batch, _), g in zip(p2_calls, gathers2):
            with self.timers.stage("fetch_cdf"):
                host = np.asarray(g)
            with self.timers.stage("ac_decode"):
                for bi, (s, m) in enumerate(batch):
                    no = m // 2
                    if not no:
                        continue
                    lo = dec.decode_batch_quantized(host[bi, :no]).astype(np.int32)
                    odds_by_chunk[s] = hi2_by_chunk[s] * 16 + lo

        n = dc.shape[0]
        level_occ = np.empty(n, np.int32)
        for s, m in chunks:
            level_occ[s : s + m : 2] = evens_by_chunk[s]
            if m // 2:
                level_occ[s + 1 : s + m : 2] = odds_by_chunk[s]
        return level_occ

    def _decode_level_full(self, dec, dc, pos):
        """Round-1 format: one 255-way CDF row per node."""
        chunks = self._level_chunks(dc, pos)
        calls = self._phase1_level(dc, pos)
        evens_by_chunk = {}
        p2_dispatched = []
        for batch, (cdf1,), f1, f2, b in calls:
            with self.timers.stage("fetch_cdf"):
                host = np.asarray(cdf1)
            with self.timers.stage("ac_decode"):
                for bi, (s, m) in enumerate(batch):
                    rows = host[bi, : (m + 1) // 2]
                    evens_by_chunk[s] = dec.decode_batch_quantized(rows).astype(
                        np.int32
                    )
            occ = np.full((f1.shape[0], (b + 1) // 2), 255, np.uint8)
            for bi, (s, m) in enumerate(batch):
                e = evens_by_chunk[s]
                occ[bi, : e.shape[0]] = e
            with self.timers.stage("dispatch_p2"):
                p2_dispatched.append(
                    (batch, self._phase2_fn(self.variables, f1, f2, occ))
                )

        odds_by_chunk = {}
        for batch, cdf2 in p2_dispatched:
            with self.timers.stage("fetch_cdf"):
                host = np.asarray(cdf2)
            with self.timers.stage("ac_decode"):
                for bi, (s, m) in enumerate(batch):
                    if m // 2:
                        odds_by_chunk[s] = dec.decode_batch_quantized(
                            host[bi, : m // 2]
                        ).astype(np.int32)

        n = dc.shape[0]
        level_occ = np.empty(n, np.int32)
        for s, m in chunks:
            level_occ[s : s + m : 2] = evens_by_chunk[s]
            if m // 2:
                level_occ[s + 1 : s + m : 2] = odds_by_chunk[s]
        return level_occ


def _expand_children(data, pos_int, level_occ, child_level, max_level):
    """Vectorized wavefront expansion (role of reference
    decode_ehem.py:113-145).

    data: (n, 4, 3) current-level contexts; returns (m, 4, 3) child
    contexts (occ unknown) + (m, 3) integer grid positions.
    """
    pidx, octant = occupancy_to_child_octants(level_occ + 1)
    m = pidx.shape[0]
    # single pre-allocated write (this runs on the decode critical path):
    # ancestors shift up one slot, the parent's occupancy is now known
    child_data = np.empty((m, 4, 3), np.int32)
    child_data[:, 0:3] = data[pidx, 1:4]
    child_data[:, 2, 2] = level_occ[pidx]
    child_data[:, 3, 0] = child_level
    child_data[:, 3, 1] = octant + 1
    child_data[:, 3, 2] = 255

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
    stream, bits, elapsed = codec.encode_to_stream(slices, lidar_clip=lidar_clip)
    return stream, bits, slices, elapsed
