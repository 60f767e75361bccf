"""1-D Swin transformer encoder for EHEM (reference models/swin_transformer.py).

The reference surgically rewrote HF's 2-D Swin for sequences; this is a
native 1-D formulation:

  * window attention over (B, nW, W, C) blocks — a batched dense attention
    that XLA maps straight onto the MXU; no flattening round-trips;
  * 1-D relative position bias table of size 2W-1, bias[i, j] =
    table[i - j + W - 1] (reference swin_transformer.py:420-430);
  * shifted windows on odd blocks (roll by -W/2) with the three-zone
    additive mask (reference :603-623);
  * patch merging halves the sequence: concat even/odd -> LN(2C) ->
    Dense(C, no bias) (reference :322-367); in cross mode the SAME merging
    weights downsample the query stream in lockstep (reference :759-760);
  * cross attention reads Q from the query stream and residual-updates the
    key/value stream (reference :654-706);
  * inputs shorter than the window are zero-padded up to one window, like
    the reference's maybe_pad (reference :625-629).

All sequence lengths are static under jit; padding amounts resolve at
trace time.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 256
    depths: tuple = (4, 4, 4, 4, 2)
    num_heads: int = 4
    window_size: int = 512
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    remat: bool = False  # rematerialize blocks (training memory/HBM trade)


def _shift_mask(padded_len: int, window: int, shift: int) -> np.ndarray:
    """Additive (-100 off-zone) mask (nW, W, W) for shifted windows."""
    zones = np.zeros(padded_len, dtype=np.int32)
    zones[-window:-shift] = 1
    zones[-shift:] = 2
    zw = zones.reshape(-1, window)
    diff = zw[:, :, None] - zw[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention1D(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, query=None):
        """x: (B, nW, W, C) windows; query: same shape (cross mode) or None;
        mask: (nW, W, W) additive or None."""
        h, w = self.num_heads, self.window_size
        hd = self.dim // h
        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.zeros,
            (2 * self.window_size - 1, h),
            jnp.float32,
        )
        rel_idx = np.arange(w)[:, None] - np.arange(w)[None, :] + w - 1
        rel_bias = bias_table[rel_idx].transpose(2, 0, 1)  # (H, W, W)

        # projections ride ONE matmul where the inputs coincide (self mode:
        # q|k|v fused; cross mode: k|v fused, q from the query stream) —
        # one read of x instead of three and a wider MXU n-dim.  Old
        # checkpoints with separate query/key/value kernels are migrated at
        # load (checkpoints.fuse_qkv_params): concatenation is exact.
        if self.cross:
            q = nn.Dense(
                self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="query"
            )(query)
            kv = nn.Dense(
                2 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="kv"
            )(x)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(
                3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
            )(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, nw, ww, _ = t.shape
            # head dim stays interior — no materialized (W, H) transpose;
            # the einsums below treat (b, n, h) as batch dims and let XLA
            # pick the layout
            return t.reshape(b, nw, ww, h, hd)

        q, k, v = heads(q), heads(k), heads(v)  # (B, nW, W, H, hd)
        b, nw = q.shape[:2]
        from scp_tpu.ops import pallas_attn

        # A/B on a v5e chip: the fused kernel MATCHES XLA's lowering of this
        # block (60.7 vs 59.1 ms for the full self-encoder at 8x8192) — XLA
        # already pipelines the score tensors through VMEM here.  Kept as an
        # opt-in (SCP_PALLAS_ATTN=1) + interpret-mode tests, not the default.
        if pallas_attn.supported(w, hd) and os.environ.get("SCP_PALLAS_ATTN"):
            # fused kernel: the (W, W) score/exp/weight tensors live in
            # VMEM only — at window 512 they dominate block HBM traffic
            mask_in = (
                mask.astype(jnp.float32)
                if mask is not None
                else jnp.zeros((1, w, w), jnp.float32)
            )
            out = pallas_attn.window_attention_fused(
                q.transpose(0, 1, 3, 2, 4).reshape(b * nw, h, w, hd),
                k.transpose(0, 1, 3, 2, 4).reshape(b * nw, h, w, hd),
                v.transpose(0, 1, 3, 2, 4).reshape(b * nw, h, w, hd),
                rel_bias.astype(jnp.float32),
                mask_in,
                1.0 / float(np.sqrt(hd)),
            ).reshape(b, nw, h, w, hd).transpose(0, 1, 3, 2, 4)
        else:
            # keep the (..., W, W) score/weight tensors in the compute
            # dtype; the max-sub/exp/normalize chain fuses elementwise
            # (f32 internally)
            scores = jnp.einsum(
                "bnqhd,bnkhd->bnhqk", q, k, preferred_element_type=self.dtype
            ) * jnp.asarray(1.0 / np.sqrt(hd), self.dtype)
            scores = scores + rel_bias[None, None].astype(self.dtype)
            if mask is not None:
                scores = scores + mask[None, :, None].astype(self.dtype)
            m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
            e = jnp.exp((scores - m).astype(jnp.float32)).astype(self.dtype)
            attn = e / jnp.sum(
                e.astype(jnp.float32), axis=-1, keepdims=True
            ).astype(self.dtype)
            out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, v)
        b, nw = out.shape[:2]
        out = out.reshape(b, nw, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock1D(nn.Module):
    cfg: SwinConfig
    shift: int
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query=None):
        cfg = self.cfg
        b, n, c = x.shape
        w = cfg.window_size
        pad = (-n) % w
        padded = n + pad
        shift = self.shift if padded > w else 0

        norm1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="norm1")
        attn_mod = WindowAttention1D(
            c, cfg.num_heads, w, cfg.qkv_bias, cross=self.cross,
            dtype=self.dtype, name="attn",
        )
        from scp_tpu.ops import pallas_swin

        if (
            not self.is_initializing()
            and pad == 0
            and cfg.qkv_bias
            and pallas_swin.supported(n, w, c, cfg.num_heads)
            and not os.environ.get("SCP_NO_FUSED_ATTN")
        ):
            # fused sublayer: LN, QKV, window attention, projection and
            # the residual all stay in VMEM per window (stamped in
            # coding_params as fusedattn); shift rolls remain XLA copies
            ap = attn_mod.variables["params"]
            n1 = norm1.variables["params"]
            rel_idx = np.arange(w)[:, None] - np.arange(w)[None, :] + w - 1
            rel_bias = ap["rel_pos_bias"][rel_idx].transpose(2, 0, 1)
            mask = (
                jnp.asarray(_shift_mask(padded, w, shift))
                if shift
                else jnp.zeros((1, w, w), jnp.float32)
            )

            def to_w(t):
                if shift:
                    t = jnp.roll(t, -shift, axis=1)
                return t.reshape(b * (n // w), w, c)

            if self.cross:
                out = pallas_swin.attn_sublayer_cross(
                    to_w(x), to_w(query), n1["scale"], n1["bias"],
                    ap["query"]["kernel"].astype(self.dtype),
                    ap["query"]["bias"],
                    ap["kv"]["kernel"].astype(self.dtype), ap["kv"]["bias"],
                    rel_bias, mask,
                    ap["proj"]["kernel"].astype(self.dtype),
                    ap["proj"]["bias"],
                    cfg.num_heads, cfg.layer_norm_eps,
                )
            else:
                out = pallas_swin.attn_sublayer_self(
                    to_w(x), n1["scale"], n1["bias"],
                    ap["qkv"]["kernel"].astype(self.dtype), ap["qkv"]["bias"],
                    rel_bias, mask,
                    ap["proj"]["kernel"].astype(self.dtype),
                    ap["proj"]["bias"],
                    cfg.num_heads, cfg.layer_norm_eps,
                )
            x = out.reshape(b, n, c)
            if shift:
                x = jnp.roll(x, shift, axis=1)
        else:
            def to_windows(t):
                t = norm1(t).astype(self.dtype)
                t = jnp.pad(t, ((0, 0), (0, pad), (0, 0)))
                if shift:
                    t = jnp.roll(t, -shift, axis=1)
                return t.reshape(b, padded // w, w, c)

            xw = to_windows(x)
            qw = to_windows(query) if self.cross else None
            mask = jnp.asarray(_shift_mask(padded, w, shift)) if shift else None
            out = attn_mod(xw, mask=mask, query=qw)
            out = out.reshape(b, padded, c)
            if shift:
                out = jnp.roll(out, shift, axis=1)
            out = out[:, :n]
            x = x + out
        f = int(cfg.mlp_ratio * c)
        norm2 = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="norm2"
        )
        mlp1 = nn.Dense(f, dtype=self.dtype, name="mlp1")
        mlp2 = nn.Dense(c, dtype=self.dtype, name="mlp2")
        from scp_tpu.ops import pallas_mlp

        if (
            not self.is_initializing()
            and pallas_mlp.supported(b * n, c, f)
            and not os.environ.get("SCP_NO_FUSED_MLP")
        ):
            # fused LN+MLP+residual: the (N, 4C) intermediate and the LN
            # output never touch HBM (stamped in coding_params as
            # fusedmlp — changes rounding points vs the XLA path)
            p = lambda mod: mod.variables["params"]  # noqa: E731
            n2, m1, m2 = p(norm2), p(mlp1), p(mlp2)
            y = pallas_mlp.ln_mlp_residual(
                x.reshape(b * n, c),
                n2["scale"], n2["bias"],
                m1["kernel"].astype(self.dtype), m1["bias"],
                m2["kernel"].astype(self.dtype), m2["bias"],
                cfg.layer_norm_eps, "gelu",
            )
            return y.reshape(b, n, c)
        h = norm2(x)
        h = mlp1(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = mlp2(h)
        return x + h


class PatchMerging1D(nn.Module):
    dim: int
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        if n % 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        x = jnp.concatenate([x[:, 0::2], x[:, 1::2]], axis=-1)  # (B, n/2, 2C)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="reduce")(
            x.astype(self.dtype)
        )


class SwinStage1D(nn.Module):
    cfg: SwinConfig
    depth: int
    downsample: bool
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query=None):
        cfg = self.cfg
        block_cls = nn.remat(SwinBlock1D) if cfg.remat else SwinBlock1D
        for i in range(self.depth):
            x = block_cls(
                cfg,
                shift=0 if i % 2 == 0 else cfg.window_size // 2,
                cross=self.cross,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, query=query)
        before = x
        if self.downsample:
            merge = PatchMerging1D(cfg.embed_dim, cfg.layer_norm_eps, self.dtype, name="merge")
            x = merge(before)
            if self.cross:
                query = merge(query)
        return x, before, query


class SwinEncoder1D(nn.Module):
    """Returns per-stage pre-downsample hidden states, element 0 = input
    (reference SwinEncoder with output_hidden_states_before_downsampling)."""

    cfg: SwinConfig
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query=None):
        states = [x]
        n_stages = len(self.cfg.depths)
        for s, depth in enumerate(self.cfg.depths):
            x, before, query = SwinStage1D(
                self.cfg,
                depth,
                downsample=s < n_stages - 1,
                cross=self.cross,
                dtype=self.dtype,
                name=f"stage_{s}",
            )(x, query=query)
            states.append(before)
        return states


def concat_multiscale(states: list[jnp.ndarray]) -> jnp.ndarray:
    """Upsample every stage output to full resolution (nearest-repeat) and
    concatenate on channels (reference EHEM.concat_states, ehem.py:75-86).
    states[0] (the raw input) is excluded."""
    pyramid = states[1:]
    full_len = pyramid[0].shape[1]
    out = [pyramid[0]]
    for i in range(1, len(pyramid)):
        s = pyramid[i]
        # climb back up the pyramid, truncating to each finer level's length
        for j in range(i, 0, -1):
            target = pyramid[j - 1].shape[1]
            s = jnp.repeat(s, 2, axis=1)[:, :target]
        assert s.shape[1] == full_len
        out.append(s)
    return jnp.concatenate(out, axis=-1)
