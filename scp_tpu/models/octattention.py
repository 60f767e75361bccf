"""OctAttention entropy model: dual-stream causal transformer.

Capability parity with the reference model (`models/oct_attention.py`,
`models/attention_model.py`) re-expressed for XLA:

  * Each octree node token embeds (occupancy, level, octant, position) of
    itself and its 3 ancestors -> one 600-d token
    (reference oct_attention.py:28-33).
  * Dual-stream trick: the prediction for node i must not see node i's own
    occupancy.  The reference computes a second "unknown" stream whose
    attention diagonal is q_unk.k_unk and whose diagonal value is v_unk
    (attention_model.py:82-94).  Here that is fused: one score matrix with
    its diagonal replaced, and the value correction applied as a rank-1
    diagonal update — no diag_embed materialization:
        out_unk = A @ V + diag(A)[:, None] * (V_unk - V).
  * Softmax/LayerNorm in fp32; matmuls in the module dtype (bf16 on TPU).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scp_tpu.models.layers import (
    dot_attention_weights,
    merge_heads,
    sinusoidal_position_table,
    split_heads,
)


class DualStreamAttention(nn.Module):
    """Causal self-attention computing (known, unknown) streams jointly."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed, embed_unknown, causal_mask):
        d_model = embed.shape[-1]
        wk = nn.Dense(d_model, dtype=self.dtype, name="key")
        wq = nn.Dense(d_model, dtype=self.dtype, name="query")
        wv = nn.Dense(d_model, dtype=self.dtype, name="value")

        k = split_heads(wk(embed), self.num_heads)
        k_unk = split_heads(wk(embed_unknown), self.num_heads)
        q_unk = split_heads(wq(embed_unknown), self.num_heads)
        v = split_heads(wv(embed), self.num_heads)
        v_unk = split_heads(wv(embed_unknown), self.num_heads)

        head_dim = d_model // self.num_heads
        scores = jnp.einsum("bhnd,bhmd->bhnm", q_unk, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(head_dim))
        masked = scores + causal_mask

        attn = nn.softmax(masked, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v)

        # Unknown stream: diagonal score is q_unk . k_unk (self-attention to
        # the occupancy-masked self).
        diag = jnp.einsum("bhnd,bhnd->bhn", q_unk, k_unk).astype(jnp.float32)
        diag = diag / jnp.sqrt(jnp.float32(head_dim))
        n = scores.shape[-1]
        eye = jnp.eye(n, dtype=jnp.float32)
        scores_unk = scores * (1.0 - eye) + diag[..., None] * eye
        attn_unk = nn.softmax(scores_unk + causal_mask, axis=-1)
        attn_unk_c = attn_unk.astype(self.dtype)
        diag_w = jnp.diagonal(attn_unk_c, axis1=-2, axis2=-1)  # (b, h, n)
        # Zero the diagonal BEFORE the matmul so node i's own value (which
        # carries its occupancy) never enters the sum — an after-the-fact
        # subtraction would leave a floating-point residue of it.
        attn_off = attn_unk_c * (1.0 - eye).astype(self.dtype)
        out_unk = jnp.einsum("bhnm,bhmd->bhnd", attn_off, v)
        out_unk = out_unk + diag_w[..., None] * v_unk

        return merge_heads(out), merge_heads(out_unk)


class DualStreamLayer(nn.Module):
    num_heads: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embed, embed_unknown, causal_mask, deterministic=True):
        attn = DualStreamAttention(self.num_heads, dtype=self.dtype, name="attn")
        d_model = embed.shape[-1]
        a, a_unk = attn(embed, embed_unknown, causal_mask)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        embed = norm1(embed + drop(a))
        embed_unknown = norm1(embed_unknown + drop(a_unk))

        lin1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ffn1")
        lin2 = nn.Dense(d_model, dtype=self.dtype, name="ffn2")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        f = lin2(drop(nn.relu(lin1(embed))))
        f_unk = lin2(drop(nn.relu(lin1(embed_unknown))))
        embed = norm2(embed + drop(f))
        embed_unknown = norm2(embed_unknown + drop(f_unk))
        return embed.astype(self.dtype), embed_unknown.astype(self.dtype)


class OctAttention(nn.Module):
    """Forward: (data, pos) -> 255-way logits per node.

    data: (B, N, K, 3) int — channels (occupancy 0..255, level, octant);
          occupancy 255 = pad/unknown (shards store 1..255 and are shifted
          to 0..254 at load; missing-ancestor 256 becomes 255).
    pos:  (B, N, K, 3) float normalized positions (or None).
    """

    token_num: int = 255
    occ_embed_dim: int = 128
    level_embed_dim: int = 6
    octant_embed_dim: int = 4
    abs_pos_embed_dim: int = 12
    max_octree_level: int = 12
    level_clip_ref: int = 12  # 10 for obj-type training, 12 for LiDAR
    num_layers: int = 3
    num_heads: int = 4
    hidden_dim: int = 300
    context_size: int = 1024
    ancestors: int = 4
    pos_embed: bool = True
    pos_max_len: int = 5000
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def embed_dim(self) -> int:
        return self.ancestors * (
            self.occ_embed_dim
            + self.level_embed_dim
            + self.octant_embed_dim
            + self.abs_pos_embed_dim
        )

    @nn.compact
    def __call__(self, data, pos=None, deterministic=True):
        b, n = data.shape[:2]
        occupancy = data[..., 0]
        level = data[..., 1]
        octant = data[..., 2]

        # Re-normalize deep levels toward the training range
        # (reference oct_attention.py:56-61).
        level = level - jnp.clip(level[:, :, -1:] - self.level_clip_ref, 0, None)
        level = jnp.clip(level, 0, self.max_octree_level)

        occ_enc = nn.Embed(
            self.token_num + 1, self.occ_embed_dim, dtype=self.dtype, name="occ_enc"
        )
        occ_embed = occ_enc(occupancy)
        # Unknown stream: the node's own occupancy replaced by token 255.
        unk = jnp.full_like(occupancy[:, :, -1], self.token_num)
        occ_embed_unknown = occ_embed.at[:, :, -1].set(occ_enc(unk))

        level_embed = nn.Embed(
            self.max_octree_level + 1,
            self.level_embed_dim,
            dtype=self.dtype,
            name="level_enc",
        )(level)
        octant_embed = nn.Embed(
            9, self.octant_embed_dim, dtype=self.dtype, name="octant_enc"
        )(octant)

        parts = [level_embed, octant_embed]
        if self.abs_pos_embed_dim:
            pos_embed = nn.Dense(
                self.abs_pos_embed_dim, dtype=self.dtype, name="abs_pos_enc"
            )(pos.astype(self.dtype))
            parts.append(pos_embed)

        scale = math.sqrt(self.embed_dim)

        def tokens(occ_e):
            t = jnp.concatenate([occ_e] + parts, axis=-1)
            return t.reshape(b, n, self.embed_dim) * scale

        embed = tokens(occ_embed)
        embed_unknown = tokens(occ_embed_unknown)

        if self.pos_embed:
            pe = self.variable(
                "constants",
                "pe",
                lambda: jnp.asarray(
                    sinusoidal_position_table(self.context_size, self.embed_dim)
                ),
            ).value[:n].astype(self.dtype)
            embed = embed + pe
            embed_unknown = embed_unknown + pe

        causal_mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)

        for i in range(self.num_layers):
            embed, embed_unknown = DualStreamLayer(
                self.num_heads,
                self.hidden_dim,
                self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(embed, embed_unknown, causal_mask, deterministic)

        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="decoder0")(embed_unknown)
        logits = nn.Dense(self.token_num, dtype=jnp.float32, name="decoder1")(
            nn.relu(h)
        )
        return logits

    @staticmethod
    def from_config(cfg, dtype=jnp.float32) -> "OctAttention":
        m = cfg.model
        return OctAttention(
            token_num=m.token_num,
            occ_embed_dim=m.occ_embed_dim,
            level_embed_dim=m.level_embed_dim,
            octant_embed_dim=m.octant_embed_dim,
            abs_pos_embed_dim=m.abs_pos_embed_dim,
            max_octree_level=m.max_octree_level,
            level_clip_ref=10 if cfg.train.type == "obj" else 12,
            num_layers=m.layer_num,
            num_heads=m.head_num,
            hidden_dim=m.hidden_dimension,
            context_size=m.context_size,
            ancestors=m.level_k,
            pos_embed=m.pos_embed,
            dropout=cfg.train.dropout,
            dtype=dtype,
        )
