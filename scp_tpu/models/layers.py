"""Shared Flax building blocks for the entropy models."""

from __future__ import annotations

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


class MLP(nn.Module):
    """Linear stack with LeakyReLU between layers (EHEM's MLP idiom)."""

    features: Sequence[int]
    negative_slope: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < len(self.features) - 1:
                x = nn.leaky_relu(x, negative_slope=self.negative_slope)
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
