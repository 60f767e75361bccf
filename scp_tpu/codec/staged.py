"""Staged (two-nibble) entropy coding — device-side CDF factorization.

Round-1 measured the codec transfer-bound: entropy coding a 255-way
alphabet ships one 255-entry uint16 CDF row per node (512 B/node) over the
host link, ~430 MB per direction for a KITTI L16 cloud.  This module
factors each occupancy symbol into two 16-way stages,

    sym = hi * 16 + lo,   hi = sym >> 4,  lo = sym & 15,

and codes hi against P(hi) = sum_lo P(sym), then lo against the exact
conditional P(lo | hi).  The factorization is information-lossless:
P(hi) * P(lo|hi) == P(sym), so the rate is unchanged (each stage is even
quantized to 16 bits, finer than one 16-bit grid over 255 symbols).

Host-link bytes per node:
  * decode: 17 u16 (hi CDF) + 17 u16 (the ONE conditional row selected by
    the decoded hi, gathered on device) = 68 B — 7.5x less than 512 B.
  * encode: the symbol is already known on device, so only the two
    quantized (c_low, c_high) interval pairs leave the chip = 8 B — 64x
    less.  (Role of the reference's per-node pdf hand-off,
    reference numpyAc/numpyAc.py:116-137.)

Bit-exactness contract: the encoder and decoder must derive coding
intervals from IDENTICAL quantized CDFs.  `staged_cdfs` runs inside the
shared phase programs (same compiled XLA program on both sides), and the
interval/row extraction below is pure integer gathering over its uint16
outputs — exact by construction.

The alphabet is conceptually padded from 255 to 256 symbols; symbol 255
(the pad/unknown token) is never encoded, so its zero probability only
costs the +1 quantization ramp slot.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_STAGE = 16  # 2 stages of 16 -> 256-symbol alphabet


def quantize_cdf_device(cdf: jnp.ndarray) -> jnp.ndarray:
    """Float32 CDF rows (..., Lp) in [0, 1] -> strictly-increasing uint16.

    Same construction as ac.quantize_cdf (reference numpyAc.py:96-107) in
    float32 end-to-end (TPUs have no f64); only the final entry (== 1.0)
    wraps to 0 mod 2^16, and it is re-interpreted as 65536 by every
    consumer.
    """
    lp = cdf.shape[-1]
    scaled = cdf * jnp.float32((1 << 16) - (lp - 1))
    q = jnp.round(scaled).astype(jnp.int32) + jnp.arange(lp, dtype=jnp.int32)
    return (q & 0xFFFF).astype(jnp.uint16)


def staged_cdfs(logits: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """logits (..., 255) -> (hi_cdf (..., 17) u16, cond_cdf (..., 16, 17) u16).

    hi_cdf quantizes the marginal over the high nibble; cond_cdf row h
    quantizes P(lo | hi=h).  All-zero conditionals (underflowed softmax
    rows) degrade to the quantization ramp — still strictly increasing,
    still losslessly codable.
    """
    x = logits.astype(jnp.float32)
    x = x - jnp.max(x, axis=-1, keepdims=True)
    p = jnp.exp(x)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pad = [(0, 0)] * (p.ndim - 1) + [(0, 1)]
    p = jnp.pad(p, pad)  # (..., 256); symbol 255 gets probability 0
    p16 = p.reshape(*p.shape[:-1], N_STAGE, N_STAGE)

    hi_cum = jnp.cumsum(p16.sum(axis=-1), axis=-1)  # (..., 16)
    hi_cdf = hi_cum / hi_cum[..., -1:]
    hi_cdf = jnp.concatenate([jnp.zeros_like(hi_cdf[..., :1]), hi_cdf], axis=-1)

    c = jnp.cumsum(p16, axis=-1)  # (..., 16, 16)
    denom = jnp.maximum(c[..., -1:], jnp.float32(1e-30))
    cond = jnp.concatenate([jnp.zeros_like(c[..., :1]), c / denom], axis=-1)
    return quantize_cdf_device(hi_cdf), quantize_cdf_device(cond)


def gather_cond_rows(cond_cdf: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Select conditional rows: cond_cdf (..., 16, 17) u16, hi (...,) int
    -> (..., 17) u16.  Pure integer gather — exact on any backend."""
    idx = hi.astype(jnp.int32)[..., None, None]
    idx = jnp.broadcast_to(idx, (*hi.shape, 1, cond_cdf.shape[-1]))
    return jnp.take_along_axis(cond_cdf, idx, axis=-2)[..., 0, :]


def intervals(
    hi_cdf: jnp.ndarray, cond_cdf: jnp.ndarray, syms: jnp.ndarray
) -> jnp.ndarray:
    """Per-symbol coding intervals: (..., 2, 2) u16.

    [..., 0, :] = (c_low, c_high) of the hi stage,
    [..., 1, :] = (c_low, c_high) of the lo stage.
    A stored c_high of 0 means 65536 (the wrapped CDF top).
    """
    syms = syms.astype(jnp.int32)
    hi = syms >> 4
    lo = syms & (N_STAGE - 1)

    def pick(rows, i):
        return jnp.take_along_axis(rows, i[..., None], axis=-1)[..., 0]

    hi_pair = jnp.stack([pick(hi_cdf, hi), pick(hi_cdf, hi + 1)], axis=-1)
    row = gather_cond_rows(cond_cdf, hi)
    lo_pair = jnp.stack([pick(row, lo), pick(row, lo + 1)], axis=-1)
    return jnp.stack([hi_pair, lo_pair], axis=-2)


# ---- host-side reference implementations (tests / oracle) ----------------


def staged_cdfs_np(logits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Numpy mirror of staged_cdfs for CPU tests.  NOT guaranteed
    bit-identical to the device programs (different fma/ordering); the
    codec never mixes the two within one stream."""
    x = logits.astype(np.float32)
    x = x - x.max(axis=-1, keepdims=True)
    p = np.exp(x)
    p = p / p.sum(axis=-1, keepdims=True)
    p = np.concatenate([p, np.zeros_like(p[..., :1])], axis=-1)
    p16 = p.reshape(*p.shape[:-1], N_STAGE, N_STAGE)

    def quant(cdf):
        lp = cdf.shape[-1]
        scaled = cdf * np.float32((1 << 16) - (lp - 1))
        q = np.round(scaled).astype(np.int64) + np.arange(lp, dtype=np.int64)
        return (q & 0xFFFF).astype(np.uint16)

    hi_cum = np.cumsum(p16.sum(axis=-1), axis=-1)
    hi_cdf = hi_cum / hi_cum[..., -1:]
    hi_cdf = np.concatenate([np.zeros_like(hi_cdf[..., :1]), hi_cdf], axis=-1)
    c = np.cumsum(p16, axis=-1)
    denom = np.maximum(c[..., -1:], np.float32(1e-30))
    cond = np.concatenate([np.zeros_like(c[..., :1]), c / denom], axis=-1)
    return quant(hi_cdf), quant(cond)


def staged_bits_np(hi_cdf: np.ndarray, cond_cdf: np.ndarray, syms: np.ndarray) -> float:
    """Ideal (pre-AC) bits for symbols under the staged quantized model —
    rate oracle for tests."""
    syms = syms.astype(np.int64)
    hi, lo = syms >> 4, syms & 15

    def width(rows, idx):
        lp = rows.shape[-1]
        a = np.take_along_axis(rows.astype(np.int64), idx[..., None], -1)[..., 0]
        bsel = np.take_along_axis(rows.astype(np.int64), idx[..., None] + 1, -1)[..., 0]
        bsel = np.where((idx + 1) == lp - 1, 1 << 16, bsel)
        return (bsel - a).clip(1)

    w_hi = width(hi_cdf, hi)
    rows = np.take_along_axis(
        cond_cdf, hi[..., None, None].repeat(cond_cdf.shape[-1], -1), -2
    )[..., 0, :]
    w_lo = width(rows, lo)
    return float(-(np.log2(w_hi / 65536.0) + np.log2(w_lo / 65536.0)).sum())
