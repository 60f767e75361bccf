"""Pallas TPU kernel: fused pairwise-distance + top-k (KNN).

The XLA path materializes a (TILE, N) score matrix in HBM per query tile
and then runs top_k over it; this kernel keeps everything in VMEM: each
(query-tile x key-tile) score block is produced on the MXU and immediately
folded into a running top-k held in VMEM scratch, so the O(N^2) matrix
never touches HBM.

Top-k maintenance: per key tile, K rounds of (max, argmax, mask) extract
the tile's best K into the candidate buffer next to the running best-K,
then K more rounds select the merged best-K.  K is padded to a 128-lane
buffer (TPU tiling), the caller slices [..., :k].

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


def _extract_topk(scores, idx_of_col, k, out_val, out_idx, out_off):
    """K rounds of max/argmax/mask over `scores` (TQ, M); results written
    into out_val/out_idx at column offset out_off."""
    def extract_one(j, carry):
        s, ov, oi = carry
        m = jnp.max(s, axis=1)
        a = jnp.argmax(s, axis=1)
        ov = jax.lax.dynamic_update_slice_in_dim(ov, m[:, None], j, 1)
        oi = jax.lax.dynamic_update_slice_in_dim(
            oi, idx_of_col(a)[:, None], j, 1
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols == a[:, None], _NEG, s)
        return s, ov, oi

    carry = (scores, out_val, out_idx)
    for j in range(k):
        carry = extract_one(out_off + j, carry)
    return carry[1], carry[2]


def _knn_kernel(feats_ref, out_idx_ref, best_val, best_idx, *, n, c, k, n_key_tiles):
    qt = pl.program_id(1)
    q = feats_ref[pl.ds(qt * _TQ, _TQ), :]  # (TQ, C)
    q_sq = jnp.sum(q * q, axis=1)  # (TQ,)

    best_val[:, :] = jnp.full((_TQ, _LANES), _NEG, jnp.float32)
    best_idx[:, :] = jnp.zeros((_TQ, _LANES), jnp.int32)

    for kt in range(n_key_tiles):
        keys = feats_ref[pl.ds(kt * _TK, _TK), :]  # (TK, C)
        k_sq = jnp.sum(keys * keys, axis=1)
        scores = 2.0 * jax.lax.dot_general(
            q,
            keys,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores - q_sq[:, None] - k_sq[None, :]
        # mask out-of-range key columns (N not a multiple of TK)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + kt * _TK
        scores = jnp.where(col_ids < n, scores, _NEG)

        bv = best_val[:, :]
        bi = best_idx[:, :]
        # extract this tile's top-k into candidate columns [k, 2k)
        bv, bi = _extract_topk(
            scores, lambda a, kt=kt: (a + kt * _TK).astype(jnp.int32), k, bv, bi, k
        )
        # merge: select top-k of the 2k candidates into columns [0, k)
        cand = jax.lax.dynamic_slice(bv, (0, 0), (_TQ, 2 * k))
        cand_idx = jax.lax.dynamic_slice(bi, (0, 0), (_TQ, 2 * k))

        merged_v = jnp.full((_TQ, _LANES), _NEG, jnp.float32)
        merged_i = jnp.zeros((_TQ, _LANES), jnp.int32)

        def pick(j, carry):
            s, mv, mi = carry
            m = jnp.max(s, axis=1)
            a = jnp.argmax(s, axis=1)
            mv = jax.lax.dynamic_update_slice_in_dim(mv, m[:, None], j, 1)
            gathered = jnp.take_along_axis(cand_idx, a[:, None], axis=1)
            mi = jax.lax.dynamic_update_slice_in_dim(mi, gathered, j, 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols == a[:, None], _NEG, s)
            return s, mv, mi

        carry = (cand, merged_v, merged_i)
        for j in range(k):
            carry = pick(j, carry)
        best_val[:, :] = carry[1]
        best_idx[:, :] = carry[2]

    out_idx_ref[pl.ds(qt * _TQ, _TQ), :] = best_idx[:, :]


def _knn_single(feats, k, *, interpret=False):
    n, c = feats.shape
    n_pad = -(-n // _TK) * _TK
    feats_p = jnp.pad(feats.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    n_q_tiles = n_pad // _TQ
    n_key_tiles = n_pad // _TK

    kernel = functools.partial(
        _knn_kernel, n=n, c=c, k=k, n_key_tiles=n_key_tiles
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, _LANES), jnp.int32),
        grid=(1, n_q_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_TQ, _LANES), jnp.float32),
            pltpu.VMEM((_TQ, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(feats_p)
    return out[:n, :k]


def knn_pallas(feats: jnp.ndarray, k: int, interpret: bool = False) -> jnp.ndarray:
    """feats (B, N, C) -> (B, N, k) int32 nearest-neighbor indices."""
    fn = functools.partial(_knn_single, k=k, interpret=interpret)
    return jax.vmap(fn)(feats)
