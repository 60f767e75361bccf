"""Fused 1-D window attention Pallas kernel.

XLA's lowering of window attention materializes the (W, W) score, exp and
weight tensors in HBM — at window 512 that is ~3x1 MB per (window, head)
block and dominates a Swin block's memory traffic.  A window fits VMEM
whole (q/k/v 512x64 bf16 = 64 KB each, scores 512x512 f32 = 1 MB), so the
kernel computes softmax(q k^T * scale + bias [+ mask]) v per (window, head)
grid point with zero intermediate HBM traffic — a flash-attention-style
fusion with no online-softmax machinery needed at this window size.

Backward: custom_vjp recomputes with the plain XLA formulation (cheap — the
trunk is inference-heavy; training still works through the same entry).

Used by models/swin1d.py when the window is MXU-sized and the backend is a
TPU; the XLA path remains for CPU/tests and window-demoted inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _reference(q, k, v, bias, mask, scale):
    """Plain-XLA window attention: q,k,v (BN, H, W, hd); bias (H, W, W);
    mask (M, W, W) additive, window n uses row n % M."""
    mask_b = mask[jnp.arange(q.shape[0]) % mask.shape[0]]
    s = jnp.einsum(
        "nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    s = s + bias[None].astype(jnp.float32) + mask_b[:, None].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", a, v)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0, 0]  # (W, hd)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    s = s + bias_ref[0].astype(jnp.float32) + mask_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(a, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _fused_fwd_impl(q, k, v, bias, mask, scale, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bn, h, w, hd = q.shape
    n_masks = mask.shape[0]  # 1 (no shift) or nW — indexed n % n_masks
    qkv_spec = pl.BlockSpec(
        (1, 1, w, hd), lambda n, j: (n, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_kernel, scale=scale),
        grid=(bn, h),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, w, w), lambda n, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, w, w),
                lambda n, j: (n % n_masks, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def window_attention_fused(q, k, v, bias, mask, scale):
    """q,k,v: (BN, H, W, hd); bias (H, W, W) f32; mask (BN, W, W) f32
    additive; returns (BN, H, W, hd) in q.dtype."""
    return _fused_fwd_impl(q, k, v, bias, mask, scale)


def _fwd(q, k, v, bias, mask, scale):
    return _fused_fwd_impl(q, k, v, bias, mask, scale), (q, k, v, bias, mask)


def _bwd(scale, res, g):
    q, k, v, bias, mask = res
    _, vjp = jax.vjp(lambda *a: _reference(*a, scale), q, k, v, bias, mask)
    return vjp(g)


window_attention_fused.defvjp(_fwd, _bwd)


def supported(w: int, hd: int) -> bool:
    """MXU-worthy shapes on a TPU backend only: the BlockSpecs pin VMEM
    (pltpu), so any non-TPU backend must take the XLA path."""
    return (
        w >= 128
        and w % 128 == 0
        and hd % 8 == 0
        and jax.default_backend() == "tpu"
    )
