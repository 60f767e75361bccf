"""Shared Flax building blocks for the entropy models."""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoidal_position_table(max_len: int, d_model: int) -> np.ndarray:
    """Classic sin/cos table (reference attention_model.py:6-22)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def nearest_up(x: jnp.ndarray, factor: int, length: int) -> jnp.ndarray:
    """Nearest-repeat upsample along axis 1 and truncate to `length`.

    Equivalent to the reference's repeated x2 `repeat_state` climb
    (ehem.py:72-73): each climb step maps index i -> i // 2 and truncates
    only the tail, so the composition over j steps is i -> i // 2**j —
    one repeat by 2**j plus one truncate."""
    if factor == 1:
        return x[:, :length]
    return jnp.repeat(x, factor, axis=1)[:, :length]


class MLP(nn.Module):
    """Linear stack with LeakyReLU between layers (EHEM's MLP idiom)."""

    features: Sequence[int]
    negative_slope: float = 0.01
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            nn.Dense(f, dtype=self.dtype, name=f"dense_{i}")
            for i, f in enumerate(self.features)
        ]

    def __call__(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        return x

    def multiscale(self, pyramid: Sequence[jnp.ndarray], extra=None):
        """Apply the stack to concat([up(p) for p in pyramid] + [extra])
        WITHOUT materializing the upsampled concat: the first Dense is an
        exact row-block repartition of its kernel, so each pyramid stage is
        projected at its OWN resolution and only the (cheap, already
        F0-wide) projections are nearest-repeat upsampled and summed.

        Same function as the reference's concat_states + first Linear
        (ehem.py:75-86, 34-40) with ~2.6x fewer first-layer FLOPs on the
        5-stage self pyramid (resolution factors 1+1/2+1/4+1/8+1/16 vs 5)
        and no (N, 1280) concat round-trip through HBM.  `extra` is an
        optional full-resolution trailing channel block (phase-2's query
        features).  SCP_NO_MSFUSE=1 restores the materialized-concat path
        (A/B; both paths share the identical parameters)."""
        full_len = pyramid[0].shape[1]
        d0 = self.layers[0]
        if self.is_initializing() or os.environ.get("SCP_NO_MSFUSE"):
            parts = [
                nearest_up(p, 1 << i, full_len) for i, p in enumerate(pyramid)
            ]
            if extra is not None:
                parts.append(extra)
            x = d0(jnp.concatenate(parts, axis=-1))
        else:
            kernel = d0.variables["params"]["kernel"].astype(self.dtype)
            bias = d0.variables["params"]["bias"].astype(self.dtype)
            off = 0
            acc = None
            for i, p in enumerate(pyramid):
                c = p.shape[-1]
                y = p.astype(self.dtype) @ kernel[off : off + c]
                off += c
                y = nearest_up(y, 1 << i, full_len)
                acc = y if acc is None else acc + y
            if extra is not None:
                c = extra.shape[-1]
                acc = acc + extra.astype(self.dtype) @ kernel[off : off + c]
                off += c
            assert off == kernel.shape[0], (off, kernel.shape)
            x = acc + bias
        for i, layer in enumerate(self.layers[1:], start=1):
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
            x = layer(x)
        return x


def dot_attention_weights(q, k, mask=None, bias=None):
    """Scaled dot-product attention weights with fp32 softmax.

    q: (..., H, N, D), k: (..., H, M, D); mask/bias broadcastable to
    (..., H, N, M). Returns fp32 weights.
    """
    d = q.shape[-1]
    scores = jnp.einsum("...nd,...md->...nm", q, k).astype(jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(d))
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    return nn.softmax(scores, axis=-1)


def split_heads(x, num_heads):
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)
