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
    its diagonal replaced, the diagonal zeroed BEFORE the value matmul
    (exact: node i's own value contributes 0.0, not a cancellation
    residue), and a rank-1 diagonal update adds v_unk.
  * Softmax/LayerNorm in fp32; matmuls in the module dtype.

Incremental decoding (absent in the reference, whose decoder re-runs the
full window per node, decode.py:73-107): `decode_step` predicts one
position from per-layer KV caches of the known stream; `decode_insert`
appends the decoded node to the caches.  Cost per node is O(window) per
layer instead of O(window^2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scp_tpu.models.layers import sinusoidal_position_table


def _split_heads(x, h):
    *lead, d = x.shape
    return x.reshape(*lead, h, d // h)


class _QKV(nn.Module):
    """Shared W_k/W_q/W_v for both streams (attention_model.py:65-70);
    no output projection (the reference has none either)."""


    d_model: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.key = nn.Dense(self.d_model, dtype=self.dtype)
        self.query = nn.Dense(self.d_model, dtype=self.dtype)
        self.value = nn.Dense(self.d_model, dtype=self.dtype)


class DualStreamLayer(nn.Module):
    d_model: int
    num_heads: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.attn = _QKV(self.d_model, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.ffn1 = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.ffn2 = nn.Dense(self.d_model, dtype=self.dtype)
        # attention-weight + FFN dropout (reference attention_model.py:
        # 76,89,107-122); active only when deterministic=False
        self.drop = nn.Dropout(self.dropout)

    # -- full-sequence forward (training / chunked encode) -----------------

    def __call__(self, embed, embed_unknown, causal_mask, deterministic=True):
        h = self.num_heads
        hd = self.d_model // h
        k = _split_heads(self.attn.key(embed), h)
        k_unk = _split_heads(self.attn.key(embed_unknown), h)
        q_unk = _split_heads(self.attn.query(embed_unknown), h)
        v = _split_heads(self.attn.value(embed), h)
        v_unk = _split_heads(self.attn.value(embed_unknown), h)

        scores = jnp.einsum("bnhd,bmhd->bhnm", q_unk, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        attn = nn.softmax(scores + causal_mask, axis=-1)
        attn = self.drop(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype), v)

        diag = jnp.einsum("bnhd,bnhd->bhn", q_unk, k_unk).astype(jnp.float32)
        diag = diag / jnp.sqrt(jnp.float32(hd))
        n = scores.shape[-1]
        eye = jnp.eye(n, dtype=jnp.float32)
        scores_unk = scores * (1.0 - eye) + diag[..., None] * eye
        attn_unk = nn.softmax(scores_unk + causal_mask, axis=-1)
        attn_unk = self.drop(attn_unk, deterministic=deterministic).astype(
            self.dtype
        )
        diag_w = jnp.diagonal(attn_unk, axis1=-2, axis2=-1)  # (b, h, n)
        attn_off = attn_unk * (1.0 - eye).astype(self.dtype)
        out_unk = jnp.einsum("bhnm,bmhd->bnhd", attn_off, v)
        out_unk = out_unk + jnp.einsum("bhn,bnhd->bnhd", diag_w, v_unk)

        b, n = embed.shape[:2]
        out = out.reshape(b, n, self.d_model)
        out_unk = out_unk.reshape(b, n, self.d_model)

        embed = self.norm1(embed + self.drop(out, deterministic=deterministic))
        embed_unknown = self.norm1(
            embed_unknown + self.drop(out_unk, deterministic=deterministic)
        )
        f = self.ffn2(self.drop(nn.relu(self.ffn1(embed)), deterministic=deterministic))
        f_unk = self.ffn2(
            self.drop(nn.relu(self.ffn1(embed_unknown)), deterministic=deterministic)
        )
        embed = self.norm2(
            embed + self.drop(f, deterministic=deterministic)
        ).astype(self.dtype)
        embed_unknown = self.norm2(
            embed_unknown + self.drop(f_unk, deterministic=deterministic)
        ).astype(self.dtype)
        return embed, embed_unknown

    # -- incremental single-position steps ----------------------------------

    def _attend_cached(self, q, k_self, v_self, k_cache, v_cache, length):
        """q against cached K/V (window, D) masked to < length, plus the
        self slot (k_self, v_self).  All inputs unbatched."""
        h = self.num_heads
        hd = self.d_model // h
        qh = q.reshape(h, hd)
        kh = k_cache.reshape(-1, h, hd)
        vh = v_cache.reshape(-1, h, hd)
        scores = jnp.einsum("hd,mhd->hm", qh, kh).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        w = k_cache.shape[0]
        pos = jnp.arange(w)
        scores = jnp.where(pos[None, :] < length, scores, -jnp.inf)
        diag = jnp.einsum("hd,hd->h", qh, k_self.reshape(h, hd)).astype(jnp.float32)
        diag = diag / jnp.sqrt(jnp.float32(hd))
        all_scores = jnp.concatenate([scores, diag[:, None]], axis=1)
        weights = nn.softmax(all_scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("hm,mhd->hd", weights[:, :w], vh)
        out = out + weights[:, w, None] * v_self.reshape(h, hd)
        return out.reshape(self.d_model)

    def step_unknown(self, u, k_cache, v_cache, length):
        """u: (D,) unknown-stream input at the current position."""
        q = self.attn.query(u)
        k_u = self.attn.key(u)
        v_u = self.attn.value(u)
        out = self._attend_cached(q, k_u, v_u, k_cache, v_cache, length)
        h1 = self.norm1(u + out)
        f = self.ffn2(nn.relu(self.ffn1(h1)))
        return self.norm2(h1 + f).astype(self.dtype), q

    def step_known(self, e, q, k_cache, v_cache, length):
        """e: (D,) known-stream input; q: the unknown-stream query cached
        from step_unknown (the known stream attends with q_unknown,
        attention_model.py:73-77)."""
        k_e = self.attn.key(e)
        v_e = self.attn.value(e)
        out = self._attend_cached(q, k_e, v_e, k_cache, v_cache, length)
        h1 = self.norm1(e + out)
        f = self.ffn2(nn.relu(self.ffn1(h1)))
        return self.norm2(h1 + f).astype(self.dtype), k_e, v_e


class OctAttention(nn.Module):
    """Forward: (data, pos) -> 255-way logits per node.

    data: (B, N, K, 3) int — channels (occupancy 0..255, level, octant);
          occupancy 255 = pad/unknown.
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

    def setup(self):
        self.occ_enc = nn.Embed(self.token_num + 1, self.occ_embed_dim, dtype=self.dtype)
        self.level_enc = nn.Embed(
            self.max_octree_level + 1, self.level_embed_dim, dtype=self.dtype
        )
        self.octant_enc = nn.Embed(9, self.octant_embed_dim, dtype=self.dtype)
        if self.abs_pos_embed_dim:
            self.abs_pos_enc = nn.Dense(self.abs_pos_embed_dim, dtype=self.dtype)
        self.layers = [
            DualStreamLayer(
                self.embed_dim,
                self.num_heads,
                self.hidden_dim,
                self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.decoder0 = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.decoder1 = nn.Dense(self.token_num, dtype=jnp.float32)
        self.pe = jnp.asarray(
            sinusoidal_position_table(self.context_size, self.embed_dim)
        )

    # -- embeddings ----------------------------------------------------------

    def _renorm_level(self, level):
        level = level - jnp.clip(level[..., -1:] - self.level_clip_ref, 0, None)
        return jnp.clip(level, 0, self.max_octree_level)

    def _tokens(self, data, pos, unknown: bool):
        """data (..., K, 3), pos (..., K, 3) -> token (..., D)."""
        occupancy = data[..., 0]
        level = self._renorm_level(data[..., 1])
        octant = data[..., 2]
        occ_embed = self.occ_enc(occupancy)
        if unknown:
            unk = jnp.full_like(occupancy[..., -1], self.token_num)
            occ_embed = occ_embed.at[..., -1, :].set(self.occ_enc(unk))
        parts = [occ_embed, self.level_enc(level), self.octant_enc(octant)]
        if self.abs_pos_embed_dim:
            parts.append(self.abs_pos_enc(pos.astype(self.dtype)))
        t = jnp.concatenate(parts, axis=-1)
        t = t.reshape(*t.shape[:-2], self.embed_dim)
        return t * math.sqrt(self.embed_dim)

    # -- full forward ----------------------------------------------------------

    def __call__(self, data, pos=None, deterministic=True, train=False):
        det = deterministic and not train
        n = data.shape[1]
        embed = self._tokens(data, pos, unknown=False)
        embed_unknown = self._tokens(data, pos, unknown=True)
        if self.pos_embed:
            pe = self.pe[:n].astype(self.dtype)
            embed = embed + pe
            embed_unknown = embed_unknown + pe
        causal_mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
        for layer in self.layers:
            embed, embed_unknown = layer(
                embed, embed_unknown, causal_mask, deterministic=det
            )
        h = self.decoder0(embed_unknown)
        return self.decoder1(nn.relu(h))

    # -- incremental decode ----------------------------------------------------

    def init_cache(self):
        """Per-layer known-stream KV caches, (L, W, D) each."""
        w, d = self.context_size, self.embed_dim
        return {
            "k": jnp.zeros((self.num_layers, w, d), self.dtype),
            "v": jnp.zeros((self.num_layers, w, d), self.dtype),
        }

    def decode_step(self, data_t, pos_t, cache, length):
        """Predict position `length` (0-based in the window).

        data_t (K, 3) with own occupancy arbitrary (masked), pos_t (K, 3).
        Returns (logits (255,), qs (L, D)) — qs feeds decode_insert."""
        u = self._tokens(data_t, pos_t, unknown=True)
        if self.pos_embed:
            u = u + jnp.take(self.pe, length, axis=0).astype(self.dtype)
        qs = []
        for li, layer in enumerate(self.layers):
            u, q = layer.step_unknown(u, cache["k"][li], cache["v"][li], length)
            qs.append(q)
        logits = self.decoder1(nn.relu(self.decoder0(u)))
        return logits, jnp.stack(qs)

    def decode_insert(self, data_t, pos_t, cache, length, qs):
        """Append position `length` (occupancy now known) to the caches."""
        e = self._tokens(data_t, pos_t, unknown=False)
        if self.pos_embed:
            e = e + jnp.take(self.pe, length, axis=0).astype(self.dtype)
        k_new, v_new = cache["k"], cache["v"]
        for li, layer in enumerate(self.layers):
            e, k_e, v_e = layer.step_known(
                e, qs[li], cache["k"][li], cache["v"][li], length
            )
            k_new = k_new.at[li, length].set(k_e)
            v_new = v_new.at[li, length].set(v_e)
        return {"k": k_new, "v": v_new}

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
