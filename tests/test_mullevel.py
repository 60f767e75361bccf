"""Multi-level (3-subtree) octree codec: shared-AC-stream roundtrip.

Reference behavior (encode_mullevel.py / decode_ehem_mullevel.py): the
cloud is split by the radial axis's Morton bit prefix into near ([0,0] at
level L), mid ([0,1] at L+1), far ([1] at L+2) subtrees with progressively
finer quantization, all entropy-coded into ONE range-coder stream; decode
runs three sequential wavefronts sharing the decoder state
(decode_ehem_mullevel.py:191-206).
"""

import jax
import numpy as np
import pytest

from scp_tpu import ac
from scp_tpu.codec.ehem_codec import EHEMCodec
from scp_tpu.codec.slices import split_levels
from scp_tpu.core import (
    build_octree,
    deoctree,
    gen_context,
    morton_prefix_filter,
)
from scp_tpu.core.preprocess import preprocess_points
from scp_tpu.models.ehem import EHEM

PATHS = ([0, 0], [0, 1], [1])


def lidar_like(rng, n=500):
    r = rng.uniform(2.0, 60.0, n)
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.4, 0.2, n)
    return np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], 1
    )


def test_prefix_split_partitions(rng):
    pts = lidar_like(rng)
    res = preprocess_points(pts, system="spher", qs=60 / 255)
    q = res.grid_points
    idxs = [morton_prefix_filter(q, p) for p in PATHS]
    total = np.concatenate(idxs)
    assert len(np.unique(total)) == len(total) == len(q)


def test_mullevel_shared_stream_roundtrip(rng):
    model = EHEM(
        self_depths=(2, 2), cross_depths=(1,), embed_dim=64, num_heads=2,
        window_size=16, mlp_ratio=2.0, knn_k=4,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8, 4, 3), np.int32),
        np.zeros((1, 8, 3), np.float32),
    )
    codec = EHEMCodec(model, variables, context_size=64)

    pts = lidar_like(rng)
    subs = []
    for j, mp in enumerate(PATHS):
        res = preprocess_points(
            pts, system="spher", qs=(60 / 63) / 2**j, morton_path=mp
        )
        subs.append(split_levels(res.context, angular=True))

    # one stream over all three subtrees
    enc = codec.new_stream_encoder()
    for s in subs:
        codec.encode_into(enc, s)
    stream, bits, _ = codec.finish_stream(enc)

    n_total = codec.ac_symbols_per_node * sum(s.occ_stream.shape[0] for s in subs)
    dec = codec.new_stream_decoder(stream, n_total)
    for s in subs:
        codes = codec.decode(
            dec,
            s.max_level,
            np.array(s.pos_mm, np.int64),
            angular=True,
            ground_truth=s.occ_stream,
            level_sizes=s.level_sizes,
        )
        np.testing.assert_array_equal(codes, s.occ_stream)
        # reconstruction of this subtree
        rec = deoctree(codes.astype(np.int64) + 1)
        assert rec.shape[0] > 0


def test_octattn_mullevel_shared_stream_roundtrip(rng):
    """OctAttention over the 3-subtree split, one shared AC stream (the
    reference encode_mullevel.py OctAttention branch / decode.py loop) —
    round 2 only covered EHEM's mullevel path."""
    from scp_tpu.codec.octattn_codec import OctAttentionCodec
    from scp_tpu.models.octattention import OctAttention

    model = OctAttention(
        occ_embed_dim=16, level_embed_dim=4, octant_embed_dim=4,
        abs_pos_embed_dim=8, num_layers=2, num_heads=2, hidden_dim=64,
        context_size=32,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 4, 3), np.int32),
        np.zeros((1, 32, 4, 3), np.float32),
    )
    codec = OctAttentionCodec(model, variables)

    pts = lidar_like(rng, n=300)
    enc = ac.StreamingEncoder()
    subs = []
    for j, mp in enumerate(PATHS):
        res = preprocess_points(
            pts, system="spher", qs=(60 / 63) / 2**j, morton_path=mp
        )
        pdf, syms, _ = codec.encode(res.context)
        enc.append(pdf, syms)
        _, occ, ml = codec.split_levels(res.context)
        subs.append((occ, ml))
    stream, bits = enc.finish()
    assert bits > 0

    dec = ac.ArithmeticDecoder(stream, sum(o.shape[0] for o, _ in subs))
    for occ, ml in subs:
        codes = codec.decode(dec, ml, ground_truth=occ)
        np.testing.assert_array_equal(codes, occ)


def test_split_levels_clips_deepest_level_only(rng):
    """Reference encode_dataset_ehem.py:86 applies the lidar-level clip to
    the DEEPEST level's rows only (all K ancestor slots); inner levels pass
    through — that is exactly what keeps multi-level subtrees (depth up to
    lidar_level+2) inside the Embed(19) level table."""
    pts = np.unique(rng.integers(0, 2**5, (300, 3)), axis=0)
    tree = build_octree(pts, max_level=19)
    ctx = gen_context(tree)
    s = split_levels(ctx, angular=False, lidar_level_clip=17)
    assert s.max_level == 19
    assert s.data[-1][:, :, 0].max() == 17  # deepest: clipped
    assert s.data[-2][:, :, 0].max() == 18  # inner: untouched
    # occupancy channel must be unaffected by the clip
    np.testing.assert_array_equal(
        s.data[-1][:, 3, 2], ctx[tree.level == 19][:, 3, 0] - 1
    )


def test_ford_l17_deep_tree_clip_roundtrip(rng):
    """Ford multi-level at L17 puts the far subtree at depth 19 — exactly
    the Embed(19) bound (valid level indices 0..18).  Without the
    symmetric deepest-level clip this exercises a clamp-gather at index 19
    and desyncs; with it, the roundtrip must be lossless."""
    model = EHEM(
        self_depths=(2, 2), cross_depths=(1,), embed_dim=64, num_heads=2,
        window_size=16, mlp_ratio=2.0, knn_k=4,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8, 4, 3), np.int32),
        np.zeros((1, 8, 3), np.float32),
    )
    codec = EHEMCodec(model, variables, context_size=64)

    pts = np.unique(rng.integers(0, 2**5, (200, 3)), axis=0)
    tree = build_octree(pts, max_level=19)  # depth 19, like Ford far subtree
    ctx = gen_context(tree)
    slices = split_levels(ctx, angular=False, lidar_level_clip=17)
    stream, bits, _ = codec.encode_to_stream(slices, lidar_clip=17)
    dec = codec.new_stream_decoder(stream, slices.occ_stream.shape[0])
    codes = codec.decode(
        dec,
        slices.max_level,
        np.array(slices.pos_mm, np.int64),
        angular=False,
        lidar_clip=17,
        ground_truth=slices.occ_stream,
        level_sizes=slices.level_sizes,
    )
    np.testing.assert_array_equal(codes, slices.occ_stream)
