"""DGCNN geometry feature extractor for EHEM (reference models/dgcnn.py).

TPU-first notes:
  * KNN lives in scp_tpu.ops.knn: tiled distance + top-k (XLA or Pallas).
  * Edge features are channel-last so every 1x1 "conv" is a Dense on the
    lane dimension (MXU-shaped matmul).
  * Graphs are dynamic per EdgeConv round (recomputed from the current
    feature tensor), the defining DGCNN behavior.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from scp_tpu.models.layers import MLP
from scp_tpu.ops.knn import (  # noqa: F401
    edge_features,
    gather_neighbors,
    knn_indices,
    max_over_neighbors,
)


class EdgeConv(nn.Module):
    """1x1 conv + BatchNorm + LeakyReLU(0.2) + max over neighbors.

    The edge Dense is linear, so `(nb - c, c) @ W` factors into
    `nb @ W1 + c @ (W2 - W1)` — the matmul runs BEFORE the neighbor
    gather.  Same function, but the (B, N, k, 2C) edge tensor never
    materializes and the MXU work drops k-fold (the gather moves the
    already-projected F channels instead of 2C input channels).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, idx, train: bool):
        """feats (B, N, C) node features; idx (B, N, k) neighbor indices."""
        dense = nn.Dense(
            self.features, use_bias=False, dtype=self.dtype, name="conv"
        )
        if self.is_initializing():
            z = jnp.zeros_like(feats)
            a = dense(jnp.concatenate([feats, z], -1))  # feats @ W1
            bc = dense(jnp.concatenate([-feats, feats], -1))  # feats @ (W2-W1)
        else:
            # same (2C, F) kernel, applied as explicit row blocks: the
            # concat([feats, zeros]) form multiplies a zero block XLA does
            # not eliminate — slicing halves the dense FLOPs
            kern = dense.variables["params"]["kernel"].astype(self.dtype)
            c = feats.shape[-1]
            f = feats.astype(self.dtype)
            a = f @ kern[:c]  # feats @ W1   (B, N, F)
            bc = f @ (kern[c:] - kern[:c])  # feats @ (W2 - W1)
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            axis_name=None,
            name="bn",
        )
        if train and not self.is_initializing() and os.environ.get(
            "SCP_FUSED_EDGECONV", "1"
        ) != "0":
            # Fused train path (ops/edgeconv_fused.py), DEFAULT for
            # training (SCP_FUSED_EDGECONV=0 restores the reference-exact
            # explicit path): same forward function, batch stats exact,
            # stop-gradient THROUGH the stats (declared divergence —
            # O(1/k) gradient terms dropped; see the op's docstring).
            # Rate-certified: 1000-step warm-adapt arms from the sknn
            # ckpt, identical batches, val 3.0981 (fused) vs 3.0980
            # (explicit) bits/node — BUILDLOG round 5.  Deletes the f32
            # (B, N, k, F) edge tensor and the BN chain over it; the
            # backward is XLA's own VJP of the folded gather->max form.
            from scp_tpu.ops.edgeconv_fused import edgeconv_train_fused

            p = bn.variables["params"]
            out, mean, var = edgeconv_train_fused(
                a, bc, p["scale"], p["bias"], idx
            )
            # Running-stat update: a 2-sample call reproduces (mean, var)
            # exactly under BatchNorm's biased-variance formula, so the
            # momentum update matches the explicit path's.
            std = jnp.sqrt(var)
            _ = bn(jnp.stack([mean + std, mean - std]))
            return out.astype(self.dtype)
        if train or self.is_initializing() or os.environ.get("SCP_NO_BNFOLD"):
            h = gather_neighbors(a, idx) + bc[:, :, None, :]  # (B, N, k, F)
            h = bn(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            return jnp.max(h, axis=2).astype(self.dtype)  # (B, N, F)
        # Inference: BatchNorm is a per-channel affine, and the edge tensor
        # is gather(a) + bc with bc constant across the k neighbors, so
        # fold BN BEFORE the gather and reduce BEFORE the affine:
        #   max_k leaky(BN(gather(a) + bc))
        #     = leaky(max_k(gather(a*s)) + (bc*s + t))
        # (the per-center term and the monotone leaky_relu both commute
        # with the neighbor max; the per-channel scale s applies uniformly
        # across k, so its sign is irrelevant to the max).  The (B, N, k, F)
        # edge tensor collapses at the gather into a single fused
        # gather+max; nothing k-wide is written back to HBM, no f32 upcast,
        # and the output stays bf16 (keeping the NEXT round's KNN distance
        # matmul on the MXU's bf16 path instead of promoting it to f32).
        p = bn.variables["params"]
        st = bn.variables["batch_stats"]
        s = (p["scale"] / jnp.sqrt(st["var"] + 1e-5)).astype(jnp.float32)
        t = (p["bias"] - st["mean"] * s).astype(jnp.float32)
        a = (a.astype(jnp.float32) * s).astype(self.dtype)
        bc = (bc.astype(jnp.float32) * s + t).astype(self.dtype)
        h = max_over_neighbors(a, idx) + bc  # (B, N, F)
        return nn.leaky_relu(h, negative_slope=0.2)


class GeoFeatGenerator(nn.Module):
    """Per-node 256-d geometry features (reference GeoFeatGenerator,
    dgcnn.py:74-154): 3 EdgeConv rounds over dynamic KNN graphs interleaved
    with per-node MLPs on the ancestor (occ, level, octant) embedding."""

    k: int = 20
    max_level: int = 19
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.occ_enc = nn.Embed(256, 16, dtype=self.dtype, name="occ_enc")
        self.level_enc = nn.Embed(self.max_level, 4, dtype=self.dtype)
        self.octant_enc = nn.Embed(9, 4, dtype=self.dtype)
        # static arg index counts self: (feats=1, idx=2, train=3)
        conv_cls = nn.remat(EdgeConv, static_argnums=(3,)) if self.remat else EdgeConv
        self.conv1 = conv_cls(64, dtype=self.dtype)
        self.conv2 = conv_cls(128, dtype=self.dtype)
        self.conv3 = conv_cls(256, dtype=self.dtype)
        self.mlp2 = MLP([80, 64, 64], dtype=self.dtype)
        self.mlp3 = MLP([128, 128, 128], dtype=self.dtype)
        self.edge_mlp1 = MLP([256, 256, 256], dtype=self.dtype)
        self.edge_mlp2 = MLP([256, 256, 128], dtype=self.dtype)

    def _lookup(self, emb: nn.Embed, ids):
        """Embed lookup as a one-hot matmul (bit-exact vs the row gather:
        exactly one nonzero per one-hot row, so the f32-accumulated product
        is the table value itself and the cast back to the compute dtype is
        lossless).  TPU row gathers cost ~4 ns/row regardless of row width
        (measured, scratch/prof_trunk_chain.py) — the 3 ancestor-embedding
        lookups at 16x8192x4 were 7.9 ms of the geo trunk, vs <1 ms as MXU
        one-hot matmuls.  SCP_NO_ONEHOT_EMBED=1 restores the gather (A/B)."""
        table = emb.embedding.astype(self.dtype)
        if os.environ.get("SCP_NO_ONEHOT_EMBED"):
            return jnp.take(table, ids, axis=0)
        oh = jax.nn.one_hot(ids, table.shape[0], dtype=self.dtype)
        out = jnp.einsum(
            "...v,vc->...c", oh, table, preferred_element_type=jnp.float32
        )
        return out.astype(self.dtype)

    def __call__(self, data, pos, train: bool = False):
        """data: (B, N, 11) int — 4x(level, octant, occ) minus current occ;
        pos: (B, N, 3) float normalized positions. Returns (B, N, 256)."""
        b, n = data.shape[:2]
        level = data[:, :, 0::3]
        octant = data[:, :, 1::3]
        occ = data[:, :, 2::3]
        x = jnp.concatenate(
            [
                self._lookup(self.occ_enc, occ).reshape(b, n, -1),
                self._lookup(self.level_enc, level).reshape(b, n, -1),
                self._lookup(self.octant_enc, octant).reshape(b, n, -1),
            ],
            axis=-1,
        )  # (B, N, 96)

        k = min(self.k, n)
        pos = pos.astype(self.dtype)
        idx1 = knn_indices(pos, k)
        # SCP_STATIC_KNN=1: reuse the position graph for all three EdgeConv
        # rounds instead of recomputing KNN on the feature tensors (the
        # dynamic graph is the reference DGCNN behavior and the default).
        # The two feature KNNs are ~14 ms of a 99 ms p1 call at 16x8192
        # (scratch/prof_trunk_chain.py); a checkpoint ADAPTED to the static
        # graph recovers the rate (receipt in BUILDLOG round 4).  Changes
        # the phase programs' float math -> stamped in coding_params.
        static = bool(os.environ.get("SCP_STATIC_KNN"))
        pos1 = self.conv1(pos, idx1, train)
        f2 = jnp.concatenate([pos1, x], -1)
        pos2 = self.conv2(f2, idx1 if static else knn_indices(f2, k), train)
        x = self.mlp2(x)
        f3 = jnp.concatenate([pos2, x], -1)
        pos3 = self.conv3(f3, idx1 if static else knn_indices(f3, k), train)
        x = self.mlp3(x)

        ec = self.edge_mlp1(jnp.concatenate([pos1, pos2, pos3], -1))
        ec = self.edge_mlp2(jnp.concatenate([pos3, ec], -1))
        return jnp.concatenate([x, ec], -1)  # (B, N, 256)

    def embed_occ(self, occ):
        return self._lookup(self.occ_enc, occ)
