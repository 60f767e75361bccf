"""Fused Swin attention-sublayer Pallas kernel (LN + QKV + window
attention + output projection + residual).

XLA's lowering of the attention sublayer round-trips every intermediate
through HBM: the f32 LN output, the (W, 3C) QKV tensor, the attention
output and the projection each cost a write+read of the full sequence —
~0.7 GB per 131k-token call at C=256, making the sublayer HBM-bound at
~4.7 ms where its FLOPs need ~0.7 ms (scratch/prof_fused_mlp.py /
BUILDLOG round 4).  One 512-token window's entire sublayer fits VMEM
(x 256 KB, qkv 768 KB, scores 4 MB f32, weights 0.9 MB), so this kernel
computes the whole sublayer per window with HBM traffic = one read of x
+ one write of the output.

Shift handling stays OUTSIDE (the caller's existing jnp.roll pair —
two 67 MB copies, ~0.4 ms — vs in-kernel cross-window writes that would
race across grid steps).  The additive shift mask rides in as
(n_masks, W, W) indexed window % n_masks, zeros when unshifted.

Cross mode reads Q from the query stream (its own LN) and K|V from the
key stream (fused (C, 2C) projection), mirroring WindowAttention1D.

Numerics: LN stats, softmax and the residual add in f32, matmuls bf16
with f32 accumulation — different rounding points than the XLA path, so
the codec stamps the knob in coding_params (fusedattn).  Backward =
custom_vjp recomputing with the plain-XLA reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _ln(x32, scale, bias, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _heads_attend(q, k, v, rel_bias, mask, heads, scale, dtype):
    """q,k,v (W, C) values; returns (W, C).  Per-head unrolled loop with
    lane-dim slices (hd = C/H); scores/softmax in f32."""
    w, c = q.shape
    hd = c // heads
    outs = []
    for j in range(heads):
        sl = slice(j * hd, (j + 1) * hd)
        qj, kj, vj = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qj, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        s = s + rel_bias[j].astype(jnp.float32) + mask.astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        outs.append(jnp.dot(a, vj, preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=-1)


def _self_kernel(x_ref, sc_ref, bi_ref, wqkv_ref, bqkv_ref, bias_ref,
                 mask_ref, wp_ref, bp_ref, o_ref, *, heads, scale, eps):
    """Processes x_ref.shape[0] windows per grid step (unrolled): the LN +
    QKV matmul batch over all windows in the block, attention stays
    per-window.  Blocking amortizes the per-grid-step latency and feeds the
    MXU a (BL*W, 3C) projection instead of (W, 3C) — the win measured on
    chip lives in the small deep-stage calls (few windows, many steps)."""
    bl, w, c = x_ref.shape
    x = x_ref[...].reshape(bl * w, c)
    xf = x.astype(jnp.float32)
    h = _ln(xf, sc_ref[...].astype(jnp.float32), bi_ref[...].astype(jnp.float32), eps)
    h = h.astype(x.dtype)
    qkv = (
        jnp.dot(h, wqkv_ref[...], preferred_element_type=jnp.float32)
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    n_masks = mask_ref.shape[0]
    ys = []
    for j in range(bl):
        rows = slice(j * w, (j + 1) * w)
        q, k, v = qkv[rows, :c], qkv[rows, c : 2 * c], qkv[rows, 2 * c :]
        ys.append(_heads_attend(
            q, k, v, bias_ref[...], mask_ref[j % n_masks], heads, scale,
            x.dtype,
        ).astype(x.dtype))
    att = ys[0] if bl == 1 else jnp.concatenate(ys, axis=0)
    y = (
        jnp.dot(att, wp_ref[...], preferred_element_type=jnp.float32)
        + bp_ref[...].astype(jnp.float32)
    )
    o_ref[...] = (xf + y).astype(o_ref.dtype).reshape(bl, w, c)


def _cross_kernel(x_ref, q_in_ref, sc_ref, bi_ref, wq_ref, bq_ref, wkv_ref,
                  bkv_ref, bias_ref, mask_ref, wp_ref, bp_ref, o_ref,
                  *, heads, scale, eps):
    """Cross mode: Q from the query stream, K|V from the key stream; the
    residual is the KEY stream (WindowAttention1D cross contract).
    Multi-window blocking as in _self_kernel."""
    bl, w, c = x_ref.shape
    x = x_ref[...].reshape(bl * w, c)
    qs = q_in_ref[...].reshape(bl * w, c)
    scl = sc_ref[...].astype(jnp.float32)
    bia = bi_ref[...].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    hx = _ln(xf, scl, bia, eps).astype(x.dtype)
    hq = _ln(qs.astype(jnp.float32), scl, bia, eps).astype(x.dtype)
    q = (
        jnp.dot(hq, wq_ref[...], preferred_element_type=jnp.float32)
        + bq_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    kv = (
        jnp.dot(hx, wkv_ref[...], preferred_element_type=jnp.float32)
        + bkv_ref[...].astype(jnp.float32)
    ).astype(x.dtype)
    n_masks = mask_ref.shape[0]
    ys = []
    for j in range(bl):
        rows = slice(j * w, (j + 1) * w)
        k, v = kv[rows, :c], kv[rows, c:]
        ys.append(_heads_attend(
            q[rows], k, v, bias_ref[...], mask_ref[j % n_masks], heads,
            scale, x.dtype,
        ).astype(x.dtype))
    att = ys[0] if bl == 1 else jnp.concatenate(ys, axis=0)
    y = (
        jnp.dot(att, wp_ref[...], preferred_element_type=jnp.float32)
        + bp_ref[...].astype(jnp.float32)
    )
    o_ref[...] = (xf + y).astype(o_ref.dtype).reshape(bl, w, c)


def supported(n: int, w: int, c: int, heads: int) -> bool:
    """Pad-free, MXU-aligned shapes on a TPU backend: the fused sublayer
    LNs padding rows like real rows, so it only engages when the sequence
    tiles the window exactly (the codec's full-chunk shapes)."""
    return (
        jax.default_backend() not in ("cpu",)
        and n % w == 0
        and w % 128 == 0
        and c % 128 == 0
        and (c // heads) % 8 == 0
    )


def attn_block() -> int:
    """Windows per grid step (SCP_ATTN_BLOCK).  Blocking amortizes the
    per-grid-step latency and feeds the MXU a (BL*W, 3C) QKV projection;
    output is row-identical to block 1 (per-window attention,
    row-independent matmuls), so the knob is NOT stamped in
    coding_params.  Round-5 chip A/B (scratch/prof_attn_block.py,
    16x8192 swin_self): block 1 = 0.0638 s, 2 = 0.0635, 4 = 0.0699,
    8 = VMEM OOM (the 8x512x256 bf16 block + f32 scores exceed the 16 MB
    scoped-vmem budget) -> default stays 1; the cap below keeps an
    env override from compiling an un-runnable kernel."""
    import os

    return max(1, min(4, int(os.environ.get("SCP_ATTN_BLOCK", "1"))))


def _pick_block(bn: int, n_masks: int) -> int:
    """Largest block <= attn_block() that divides the window count and
    aligns with the mask period (see _mask_spec)."""
    bl = attn_block()
    while bl > 1 and not (
        bn % bl == 0 and (n_masks % bl == 0 or bl % n_masks == 0)
    ):
        bl -= 1
    return bl


def _mask_spec(pl, pltpu, n_masks: int, bl: int, w: int):
    """BlockSpec delivering the right masks for windows [i*bl, (i+1)*bl).

    Masks repeat with period n_masks over the global window index.  If
    bl % n_masks == 0 the j-th window in ANY block uses mask j % n_masks —
    fetch the whole table once (kernel indexes j % n_masks).  Else
    n_masks % bl == 0 and block i's windows use the contiguous mask run
    starting at (i*bl) % n_masks (kernel indexes j)."""
    if bl % n_masks == 0:
        return pl.BlockSpec(
            (n_masks, w, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(
        (bl, w, w),
        lambda i: (i % (n_masks // bl), 0, 0),
        memory_space=pltpu.VMEM,
    )


# ---- reference (XLA) formulation: also the VJP recompute path ---------------


def _reference_self(x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp,
                    heads, eps):
    bn, w, c = x.shape
    xf = x.astype(jnp.float32)
    h = _ln(xf, scale.astype(jnp.float32), bias.astype(jnp.float32), eps)
    h = h.astype(x.dtype)
    qkv = (
        jnp.einsum("nwc,cd->nwd", h, wqkv, preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(x.dtype)
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    hd = c // heads

    def hsplit(t):
        return t.reshape(bn, w, heads, hd)

    q, k, v = hsplit(q), hsplit(k), hsplit(v)
    s = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(1.0 / np.sqrt(hd))
    s = s + rel_bias[None].astype(jnp.float32)
    mb = mask[jnp.arange(bn) % mask.shape[0]]
    s = s + mb[:, None].astype(jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    att = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(bn, w, c)
    y = (
        jnp.einsum("nwc,cd->nwd", att.astype(x.dtype), wp,
                   preferred_element_type=jnp.float32)
        + bp.astype(jnp.float32)
    )
    return (xf + y).astype(x.dtype)


def _reference_cross(x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask,
                     wp, bp, heads, eps):
    bn, w, c = x.shape
    xf = x.astype(jnp.float32)
    scl, bia = scale.astype(jnp.float32), bias.astype(jnp.float32)
    hx = _ln(xf, scl, bia, eps).astype(x.dtype)
    hq = _ln(qs.astype(jnp.float32), scl, bia, eps).astype(x.dtype)
    q = (
        jnp.einsum("nwc,cd->nwd", hq, wq, preferred_element_type=jnp.float32)
        + bq.astype(jnp.float32)
    ).astype(x.dtype)
    kv = (
        jnp.einsum("nwc,cd->nwd", hx, wkv, preferred_element_type=jnp.float32)
        + bkv.astype(jnp.float32)
    ).astype(x.dtype)
    k, v = kv[..., :c], kv[..., c:]
    hd = c // heads

    def hsplit(t):
        return t.reshape(bn, w, heads, hd)

    q, k, v = hsplit(q), hsplit(k), hsplit(v)
    s = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(1.0 / np.sqrt(hd))
    s = s + rel_bias[None].astype(jnp.float32)
    mb = mask[jnp.arange(bn) % mask.shape[0]]
    s = s + mb[:, None].astype(jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    att = jnp.einsum("nhqk,nkhd->nqhd", a, v).reshape(bn, w, c)
    y = (
        jnp.einsum("nwc,cd->nwd", att.astype(x.dtype), wp,
                   preferred_element_type=jnp.float32)
        + bp.astype(jnp.float32)
    )
    return (xf + y).astype(x.dtype)


# ---- pallas_call drivers -----------------------------------------------------


def _self_impl(x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp, heads,
               eps, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bn, w, c = x.shape
    hd = c // heads
    n_masks = mask.shape[0]
    bl = _pick_block(bn, n_masks)
    row = lambda i: (i, 0, 0)  # noqa: E731
    fixed2 = lambda i: (0, 0)  # noqa: E731
    vec = lambda nn_: pl.BlockSpec((1, nn_), fixed2, memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        partial(_self_kernel, heads=heads, scale=1.0 / float(np.sqrt(hd)), eps=eps),
        grid=(bn // bl,),
        in_specs=[
            pl.BlockSpec((bl, w, c), row, memory_space=pltpu.VMEM),
            vec(c),
            vec(c),
            pl.BlockSpec((c, 3 * c), fixed2, memory_space=pltpu.VMEM),
            vec(3 * c),
            pl.BlockSpec((heads, w, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            _mask_spec(pl, pltpu, n_masks, bl, w),
            pl.BlockSpec((c, c), fixed2, memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=pl.BlockSpec((bl, w, c), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale[None], bias[None], wqkv, bqkv[None], rel_bias, mask, wp, bp[None])


def _cross_impl(x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask, wp, bp,
                heads, eps, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bn, w, c = x.shape
    hd = c // heads
    n_masks = mask.shape[0]
    bl = _pick_block(bn, n_masks)
    row = lambda i: (i, 0, 0)  # noqa: E731
    fixed2 = lambda i: (0, 0)  # noqa: E731
    vec = lambda nn_: pl.BlockSpec((1, nn_), fixed2, memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        partial(_cross_kernel, heads=heads, scale=1.0 / float(np.sqrt(hd)), eps=eps),
        grid=(bn // bl,),
        in_specs=[
            pl.BlockSpec((bl, w, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, w, c), row, memory_space=pltpu.VMEM),
            vec(c),
            vec(c),
            pl.BlockSpec((c, c), fixed2, memory_space=pltpu.VMEM),
            vec(c),
            pl.BlockSpec((c, 2 * c), fixed2, memory_space=pltpu.VMEM),
            vec(2 * c),
            pl.BlockSpec((heads, w, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            _mask_spec(pl, pltpu, n_masks, bl, w),
            pl.BlockSpec((c, c), fixed2, memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=pl.BlockSpec((bl, w, c), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, qs, scale[None], bias[None], wq, bq[None], wkv, bkv[None], rel_bias,
      mask, wp, bp[None])


@partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def attn_sublayer_self(x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp,
                       heads, eps):
    """x (BN, W, C) windows -> x + proj(window_attn(LN(x))), fused.
    mask (n_masks, W, W) additive, window n uses row n % n_masks."""
    return _self_impl(x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp,
                      heads, eps)


def _self_fwd(x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp, heads, eps):
    out = _self_impl(x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp,
                     heads, eps)
    return out, (x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp)


def _self_bwd(heads, eps, res, g):
    x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp = res
    _, vjp = jax.vjp(
        lambda *a: _reference_self(*a, heads, eps),
        x, scale, bias, wqkv, bqkv, rel_bias, mask, wp, bp,
    )
    return vjp(g)


attn_sublayer_self.defvjp(_self_fwd, _self_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def attn_sublayer_cross(x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask,
                        wp, bp, heads, eps):
    """Cross-attention sublayer: Q from `qs`, K|V from `x` (the key
    stream, which also carries the residual)."""
    return _cross_impl(x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask,
                       wp, bp, heads, eps)


def _cross_fwd(x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask, wp, bp,
               heads, eps):
    out = _cross_impl(x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask,
                      wp, bp, heads, eps)
    return out, (x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask, wp, bp)


def _cross_bwd(heads, eps, res, g):
    x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask, wp, bp = res
    _, vjp = jax.vjp(
        lambda *a: _reference_cross(*a, heads, eps),
        x, qs, scale, bias, wq, bq, wkv, bkv, rel_bias, mask, wp, bp,
    )
    return vjp(g)


attn_sublayer_cross.defvjp(_cross_fwd, _cross_bwd)
