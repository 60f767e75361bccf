"""Pallas TPU kernel: fused pairwise-distance + top-k (KNN).

The XLA path materializes a (TILE, N) score matrix in HBM per query tile
and then runs top_k over it; this kernel keeps everything in VMEM: each
(query-tile x key-tile) score block is produced on the MXU and immediately
folded into a running top-k held in VMEM scratch, so the O(N^2) matrix
never touches HBM.

Grid is (query_tiles, key_tiles); the same feature array is passed twice
with different BlockSpecs (query tile rows, key tile rows), keeping VMEM
residency to two small tiles.  Scratch persists across the sequential key
dimension; the output tile is written on the last key step.

Top-k maintenance uses only mask/iota/where primitives (Mosaic TC kernels
do not lower dynamic_update_slice / gather / argmax): K rounds of
(max, first-max-column, mask) per key tile extract candidates next to the
running best-K, then K more rounds select the merged best-K.  K is padded
to a 128-lane buffer; the caller slices [..., :k].

Correctness is tested in interpret mode on CPU against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TQ = 256  # query tile
_TK = 1024  # key tile
_LANES = 128  # candidate buffer width (>= 2*k, 128-lane aligned)

_NEG = -3.4e38  # python scalar: pallas kernels must not capture jnp constants


def _set_col(arr, j, vals):
    """arr[:, j] = vals with a static j, via mask."""
    cols = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.where(cols == j, vals[:, None].astype(arr.dtype), arr)


def _argmax_cols(s):
    """(row max, index of first max column) via mask/min."""
    m = jnp.max(s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    a = jnp.min(jnp.where(s == m[:, None], cols, jnp.int32(2**30)), axis=1)
    return m, a


def _select_cols(arr, a):
    """Per-row arr[r, a[r]] via one-hot sum."""
    cols = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.sum(jnp.where(cols == a[:, None], arr, 0), axis=1)


def _knn_kernel(q_ref, k_ref, out_idx_ref, best_val, best_idx, *, n, k, n_key_tiles):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        best_val[:, :] = jnp.full((_TQ, _LANES), _NEG, jnp.float32)
        best_idx[:, :] = jnp.zeros((_TQ, _LANES), jnp.int32)

    q = q_ref[:, :]  # (TQ, C)
    keys = k_ref[:, :]  # (TK, C)
    q_sq = jnp.sum(q * q, axis=1)
    k_sq = jnp.sum(keys * keys, axis=1)
    scores = 2.0 * jax.lax.dot_general(
        q,
        keys,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores - q_sq[:, None] - k_sq[None, :]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + kt * _TK
    scores = jnp.where(col_ids < n, scores, _NEG)

    bv = best_val[:, :]
    bi = best_idx[:, :]
    # extract this tile's top-k into candidate columns [k, 2k)
    def extract_one(j, carry):
        s, ov, oi = carry
        m, a = _argmax_cols(s)
        ov = _set_col(ov, j, m)
        oi = _set_col(oi, j, a + kt * _TK)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols == a[:, None], _NEG, s)
        return s, ov, oi

    carry = (scores, bv, bi)
    for j in range(k):
        carry = extract_one(k + j, carry)
    bv, bi = carry[1], carry[2]

    # merge: select top-k of the 2k candidates into columns [0, k)
    cand = bv[:, : 2 * k]
    cand_idx = bi[:, : 2 * k]
    merged_v = jnp.full((_TQ, _LANES), _NEG, jnp.float32)
    merged_i = jnp.zeros((_TQ, _LANES), jnp.int32)

    def pick(j, carry):
        s, mv, mi = carry
        m, a = _argmax_cols(s)
        mv = _set_col(mv, j, m)
        mi = _set_col(mi, j, _select_cols(cand_idx, a))
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols == a[:, None], _NEG, s)
        return s, mv, mi

    carry = (cand, merged_v, merged_i)
    for j in range(k):
        carry = pick(j, carry)
    best_val[:, :] = carry[1]
    best_idx[:, :] = carry[2]

    @pl.when(kt == n_key_tiles - 1)
    def _():
        out_idx_ref[:, :] = best_idx[:, :]


def _knn_single(feats, k, *, interpret=False):
    n, c = feats.shape
    n_pad = -(-n // _TK) * _TK
    feats_p = jnp.pad(feats.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    n_q_tiles = n_pad // _TQ
    n_key_tiles = n_pad // _TK

    kernel = functools.partial(_knn_kernel, n=n, k=k, n_key_tiles=n_key_tiles)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, _LANES), jnp.int32),
        grid=(n_q_tiles, n_key_tiles),
        in_specs=[
            pl.BlockSpec((_TQ, c), lambda qt, kt: (qt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TK, c), lambda qt, kt: (kt, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TQ, _LANES), lambda qt, kt: (qt, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_TQ, _LANES), jnp.float32),
            pltpu.VMEM((_TQ, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(feats_p, feats_p)
    return out[:n, :k]


def knn_pallas(feats: jnp.ndarray, k: int, interpret: bool = False) -> jnp.ndarray:
    """feats (B, N, C) -> (B, N, k) int32 nearest-neighbor indices."""
    fn = functools.partial(_knn_single, k=k, interpret=interpret)
    return jax.vmap(fn)(feats)
