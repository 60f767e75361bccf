"""Fused EdgeConv training path: folded-BN gather+max with exact batch stats.

The reference train-mode EdgeConv (dgcnn.py:121-151) materializes the
(B, N, k, F) edge tensor IN F32 for BatchNorm, runs the BN normalize +
leaky + max chain over it, and backs the whole chain up through XLA's
gather transpose.  This path computes the SAME forward function (up to
float association) from ONE k-major gather and per-(M, F) dense math:

  max_k leaky(BN(gather(a) + bc))
    = leaky(s * (sel_k(gather(a)) + bc) + t)

with s = scale/sqrt(var+eps), t = bias - mean*s, and sel = max when
s >= 0 else min (the per-channel affine is monotone across the k
neighbors; bc is constant across k; leaky_relu is monotone) — the same
commutes the inference fold uses, now with the batch statistics of THIS
batch.  The statistics are exact: one f32-accumulated pass over the
k-major gather (sum, sum-of-squares fused with the max/min reductions)
reproduces the explicit path's mean/var over the full (B*N*k, F) edge
population:

  sum   (g + bc) = sum_k,m g        + k * sum_m bc
  sumsq (g + bc) = sum_k,m g^2 + 2 * sum_m bc*esum_m + k * sum_m bc^2

**Declared divergence (training only):** mean/var are wrapped in
stop_gradient.  The exact BN backward routes cotangents through the
stats to EVERY edge; the dropped terms are O(1/k) of the main term
(only the B*N winner edges carry primary cotangents into stats over
B*N*k samples).  Rate-certified (round 5): 1000-step warm-adapt arms
from the sknn ckpt with identical batches — val 3.0981 bits/node
(fused) vs 3.0980 (explicit) — so the knob is ON by default for
training; SCP_FUSED_EDGECONV=0 restores the reference-exact explicit
path.  The codec/inference path is untouched.

The backward is XLA's own VJP of take->max: it re-derives the winner
mask and emits the SAME E-row scatter-add the explicit path pays for
the gather — that row scatter is the exact-gradient floor on TPU
(scatter cost scales with the index count, so a "winners-only" element
scatter of M*F indices measured 2.2x SLOWER than the E=M*k row
scatter; receipt in BUILDLOG round 5).  What this path deletes is the
f32 edge-tensor round trips and the BN chain's forward+backward over
(B, N, k, F).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edgeconv_train_fused(a, bc, scale, bias, idx, eps=1e-5, slope=0.2):
    """Fused train-mode EdgeConv reduce.

    a, bc: (B, N, F) projected features (neighbor term / center term);
    scale, bias: (F,) BatchNorm parameters; idx: (B, N, k) int32 neighbor
    indices into the same batch row.  Returns (out (B, N, F) in a.dtype,
    mean (F,) f32, var (F,) f32) where mean/var are the batch statistics
    of the virtual (B*N*k, F) edge tensor (for the running-stat update).
    """
    b, n, f = a.shape
    k = idx.shape[-1]
    base = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    a_flat = a.reshape(b * n, f)
    bc32 = bc.reshape(b * n, f).astype(jnp.float32)
    scale = scale.astype(jnp.float32)
    bias = bias.astype(jnp.float32)
    m = b * n

    km = jnp.moveaxis(idx + base, -1, 0).reshape(-1)  # k-major flat order
    g = jnp.take(a_flat, km, axis=0).reshape(k, m, f)
    gmax = jnp.max(g, axis=0)
    gmin = jnp.min(g, axis=0)

    # exact batch stats of (g + bc), f32 accumulation, no k-wide writeback;
    # stop_gradient: the declared divergence (see module docstring)
    g32 = jax.lax.stop_gradient(g).astype(jnp.float32)
    esum = jnp.sum(g32, axis=0)  # (M, F)
    gsq = jnp.sum(g32 * g32, axis=(0, 1))  # (F,)
    bc_sg = jax.lax.stop_gradient(bc32)
    cnt = jnp.float32(k * m)
    s1 = jnp.sum(esum, axis=0) + k * jnp.sum(bc_sg, axis=0)
    s2 = gsq + 2.0 * jnp.sum(bc_sg * esum, axis=0) + k * jnp.sum(
        bc_sg * bc_sg, axis=0
    )
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)

    s = scale * jax.lax.rsqrt(var + eps)
    t = bias - mean * s
    pos = s >= 0
    sel = jnp.where(pos, gmax, gmin).astype(jnp.float32) + bc32
    pre = s * sel + t
    out = jnp.where(pre > 0, pre, slope * pre).astype(a.dtype)
    return out.reshape(b, n, f), mean, var
