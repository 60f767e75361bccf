"""Fused LayerNorm + MLP + residual Pallas kernel for Swin blocks.

A Swin block's MLP sublayer is `x + W2 @ gelu(W1 @ LN(x))`.  XLA never
fuses through a matmul, so its lowering writes the LN output (T, C) and
the (T, 4C) intermediate to HBM and reads them back — at C=256 that is
~32 MB per 8192-token lane per block, roughly a third of the block's
memory traffic (BUILDLOG round-3 swin attribution).  One token tile's
worth of everything fits VMEM (x 512x256 bf16 = 256 KB, mid 512x1024
f32 = 2 MB, both weights 1 MB), so this kernel keeps the LN output and
the intermediate entirely on-chip: HBM traffic per tile is one read of
x, one read of the weights (amortized across the grid by revisiting),
and one write of the output.

Numerics: LN statistics, matmul accumulation, activation and the
residual add all run in f32; the output casts to the block dtype.  This
changes float math vs the XLA path (different rounding points), so the
codec stamps it in coding_params — encoder and decoder always share it.

Backward: custom_vjp recomputes with the plain-XLA reference (the trunk
is inference-heavy; training pays one extra forward's FLOPs in exchange
for the fused forward's bandwidth).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# token tile: multiples of the bf16 sublane tile.  Default 1024 per the
# round-5 chip A/B (scratch/prof_attn_block.py: swin_self 0.0626 s vs
# 0.0638 at 512 per 16x8192 call; tile 2048 regresses back to 0.0638).
# SCP_MLP_TILE overrides; the per-call tile degrades to the largest
# divisor of the token count >= the 512 floor (see _pick_tile) — tiling
# is row-identical math, so the knob is deliberately NOT stamped in
# coding_params.
_TILE = 512  # floor / divisor-degradation unit
_DEFAULT = 1024


def _pick_tile(n_tokens: int) -> int:
    import os

    t = int(os.environ.get("SCP_MLP_TILE", _DEFAULT))
    while t > _TILE and n_tokens % t:
        t //= 2
    return max(t, _TILE)


def _reference(x, scale, bias, w1, b1, w2, b2, eps, act):
    """Plain-XLA formulation (also the VJP recompute path).
    x (M, C) any float dtype; returns x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    h = h.astype(x.dtype)
    m = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1.astype(
        jnp.float32
    )
    m = _act(m, act)
    y = jnp.dot(
        m.astype(x.dtype), w2, preferred_element_type=jnp.float32
    ) + b2.astype(jnp.float32)
    return (xf + y).astype(x.dtype)


def _act(m, act: str):
    if act == "gelu":
        return jax.nn.gelu(m, approximate=False)
    return jax.nn.leaky_relu(m, negative_slope=0.01)


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 —
    below bf16 resolution); Pallas TPU has no erf/erfc lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _act_kernel(m, act: str):
    if act == "gelu":  # exact-form gelu via the poly erf (f32 in-kernel)
        return 0.5 * m * (1.0 + _erf_poly(m * np.float32(1.0 / np.sqrt(2.0))))
    return jax.nn.leaky_relu(m, negative_slope=0.01)


def _kernel(x_ref, sc_ref, bi_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, eps, act):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * sc_ref[...].astype(jnp.float32) + bi_ref[...].astype(jnp.float32)
    m = jnp.dot(
        h.astype(x.dtype), w1_ref[...], preferred_element_type=jnp.float32
    ) + b1_ref[...].astype(jnp.float32)
    m = _act_kernel(m, act)
    y = jnp.dot(
        m.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (xf + y).astype(o_ref.dtype)


def supported(n_tokens: int, c_in: int, c_mid: int) -> bool:
    """MXU/VPU-aligned shapes only; others keep the XLA path."""
    return (
        jax.default_backend() not in ("cpu",)
        and n_tokens % _TILE == 0
        and c_in % 128 == 0
        and c_mid % 128 == 0
    )


def _fused_impl(x, scale, bias, w1, b1, w2, b2, eps, act, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x.shape
    f = w1.shape[1]
    tile = _pick_tile(m)
    grid = (m // tile,)
    row = lambda i: (i, 0)  # noqa: E731
    fixed = lambda i: (0, 0)  # noqa: E731
    vec = lambda n: pl.BlockSpec((1, n), fixed, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, eps=eps, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), row, memory_space=pltpu.VMEM),
            vec(c),
            vec(c),
            pl.BlockSpec((c, f), fixed, memory_space=pltpu.VMEM),
            vec(f),
            pl.BlockSpec((f, c), fixed, memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=pl.BlockSpec((tile, c), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(x, scale[None], bias[None], w1, b1[None], w2, b2[None])


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ln_mlp_residual(x, scale, bias, w1, b1, w2, b2, eps, act):
    """x (M, C) -> x + act(LN(x) @ w1 + b1) @ w2 + b2, fused on TPU.

    scale/bias: LN params (C,); w1 (C, F), b1 (F,); w2 (F, C), b2 (C,);
    act: "gelu" (Swin) or "leaky" (MLP stacks)."""
    return _fused_impl(x, scale, bias, w1, b1, w2, b2, eps, act)


def _fwd(x, scale, bias, w1, b1, w2, b2, eps, act):
    out = _fused_impl(x, scale, bias, w1, b1, w2, b2, eps, act)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _bwd(eps, act, res, g):
    x, scale, bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, eps, act), x, scale, bias, w1, b1, w2, b2
    )
    return vjp(g)


ln_mlp_residual.defvjp(_fwd, _bwd)
