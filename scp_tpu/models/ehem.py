"""EHEM entropy model: DGCNN features + 1-D Swin + checkerboard two-group
coding (reference models/ehem.py).

Structure (reference line refs):
  * GeoFeatGenerator -> 256-d per node                       (ehem.py:15)
  * 5-stage self Swin over the 8192 context, multiscale
    concat (1280-d) -> ancient_mlp -> 256-d                  (:17-24, 75-86)
  * checkerboard split: even nodes = group 1, odd = group 2  (:113-114)
  * group 1 logits from prob_pred_mlp1                       (:41-47, 115)
  * group 2 cross-attends (4-stage cross Swin) to keys built
    from group 1's true occupancy embedding (16-d) + 240-d
    projected features; output (1024) + query (256) ->
    prob_pred_mlp2                                           (:48-68, 117-125)
  * odd-length inputs padded with occupancy 255              (:92-99)

Decoding is functional: phase 1 returns (logits1, feat_a1, feat_a2); the
caller feeds decoded group-1 occupancies into phase 2 (the reference caches
feat_a1/feat_a2 on the module between `decode()` calls, ehem.py:138-180).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from scp_tpu.models.dgcnn import GeoFeatGenerator
from scp_tpu.models.layers import MLP
from scp_tpu.models.swin1d import SwinConfig, SwinEncoder1D


class EHEM(nn.Module):
    token_num: int = 255
    context_size: int = 8192
    max_level: int = 19
    knn_k: int = 20
    self_depths: tuple = (4, 4, 4, 4, 2)
    cross_depths: tuple = (2, 2, 1, 1)
    embed_dim: int = 256
    num_heads: int = 4
    window_size: int = 512
    mlp_ratio: float = 4.0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.geo = GeoFeatGenerator(
            k=self.knn_k, max_level=self.max_level, remat=self.remat,
            dtype=self.dtype,
        )
        self_cfg = SwinConfig(
            embed_dim=self.embed_dim,
            depths=tuple(self.self_depths),
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            remat=self.remat,
        )
        cross_cfg = SwinConfig(
            embed_dim=self.embed_dim,
            depths=tuple(self.cross_depths),
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            remat=self.remat,
        )
        self.swin_self = SwinEncoder1D(self_cfg, cross=False, dtype=self.dtype)
        self.swin_cross = SwinEncoder1D(cross_cfg, cross=True, dtype=self.dtype)
        self.ancient_mlp = MLP([1024, 512, 256], dtype=self.dtype)
        self.prob_pred_mlp1 = MLP([256, 256, self.token_num], dtype=self.dtype)
        self.pre_occ_mlp = MLP([16, 16, 16], dtype=self.dtype)
        self.pre_attn_mlp = MLP([256, 240, 240], dtype=self.dtype)
        self.prob_pred_mlp2 = MLP([768, 512, self.token_num], dtype=self.dtype)

    # ---- shared trunk -----------------------------------------------------

    @staticmethod
    def _pad_even(data, pos):
        """Odd context -> append one pad node (occ 255) (ehem.py:92-99)."""
        if data.shape[1] % 2 == 1:
            pad = jnp.zeros_like(data[:, :1]).at[:, :, :, 2].set(255)
            data = jnp.concatenate([data, pad], axis=1)
            pos = jnp.concatenate([pos, jnp.zeros_like(pos[:, :1])], axis=1)
            return data, pos, True
        return data, pos, False

    def _trunk(self, data, pos, train):
        """data (B, N, 4, 3) [level, octant, occ]; pos (B, N, 3).
        Returns (feat_a1, feat_a2): per-group 256-d features."""
        b, n = data.shape[:2]
        flat = data.reshape(b, n, -1)[:, :, :-1]  # drop current node's occ
        feat = self.geo(flat, pos, train=train)
        states = self.swin_self(feat)
        # fused multiscale head: states[1:] projected per-resolution (exact
        # repartition of ancient_mlp's first kernel; reference ehem.py:75-86)
        feat_a = self.ancient_mlp.multiscale(states[1:])
        return feat_a[:, ::2], feat_a[:, 1::2]

    def _phase2(self, feat_a1, feat_a2, pre_occ):
        """Group-2 logits given group-1 occupancies (0..254, pad 255)."""
        key = jnp.concatenate(
            [
                self.pre_occ_mlp(self.geo.embed_occ(pre_occ)),
                self.pre_attn_mlp(feat_a1),
            ],
            axis=-1,
        )  # (B, N/2, 256)
        states = self.swin_cross(key, query=feat_a2)
        # concat([multiscale (1024), feat_a2 (256)]) -> mlp2, with the
        # first kernel split per stage + query block (exact repartition)
        return self.prob_pred_mlp2.multiscale(
            states[1:], extra=feat_a2
        ).astype(jnp.float32)

    # ---- entry points -----------------------------------------------------

    def __call__(self, data, pos, train: bool = False):
        """Training/teacher-forced forward -> interleaved logits (B, N, 255)."""
        n_real = data.shape[1]
        data, pos, padded = self._pad_even(data, pos)
        pre_occ = data[:, ::2, -1, -1]
        feat_a1, feat_a2 = self._trunk(data, pos, train)
        logits1 = self.prob_pred_mlp1(feat_a1).astype(jnp.float32)
        logits2 = self._phase2(feat_a1, feat_a2, pre_occ)
        if padded:
            logits2 = logits2[:, :-1]
        out = jnp.zeros(
            (logits1.shape[0], n_real, self.token_num), jnp.float32
        )
        out = out.at[:, 0::2].set(logits1)
        out = out.at[:, 1::2].set(logits2)
        return out

    def encode_probs(self, data, pos):
        """Encode-side forward -> (logits1, logits2) (reference enc=True)."""
        data, pos, padded = self._pad_even(data, pos)
        pre_occ = data[:, ::2, -1, -1]
        feat_a1, feat_a2 = self._trunk(data, pos, train=False)
        logits1 = self.prob_pred_mlp1(feat_a1).astype(jnp.float32)
        logits2 = self._phase2(feat_a1, feat_a2, pre_occ)
        if padded:
            logits2 = logits2[:, :-1]
        return logits1, logits2

    def decode_phase1(self, data, pos):
        """Wavefront decode phase 1: current occupancies unknown (255)."""
        data, pos, _ = self._pad_even(data, pos)
        feat_a1, feat_a2 = self._trunk(data, pos, train=False)
        logits1 = self.prob_pred_mlp1(feat_a1).astype(jnp.float32)
        return logits1, feat_a1, feat_a2

    def decode_phase2(self, feat_a1, feat_a2, group1_occ, trim_last: bool):
        """Phase 2 from cached trunk features + decoded group-1 symbols."""
        logits2 = self._phase2(feat_a1, feat_a2, group1_occ)
        if trim_last:
            logits2 = logits2[:, :-1]
        return logits2

    @staticmethod
    def from_config(cfg, dtype=jnp.float32) -> "EHEM":
        m = cfg.model
        swin = m.get("swin", {})
        return EHEM(
            token_num=m.token_num,
            context_size=m.context_size,
            max_level=m.max_level,
            self_depths=tuple(swin.get("self_depths", (4, 4, 4, 4, 2))),
            cross_depths=tuple(swin.get("cross_depths", (2, 2, 1, 1))),
            embed_dim=swin.get("embed_dim", 256),
            num_heads=swin.get("num_heads", 4),
            window_size=swin.get("window_size", 512),
            mlp_ratio=swin.get("mlp_ratio", 4.0),
            remat=bool(cfg.get("remat", cfg.train.get("remat", False))),
            dtype=dtype,
        )
