"""End-to-end lossless codec roundtrips on synthetic clouds.

This is the reference's own correctness oracle (decoder ground-truth
asserts, decode_ehem.py:184 / decode.py:108) turned into a test: random
cloud -> preprocess -> encode -> bitstream -> decode -> identical
occupancy stream -> identical reconstructed points.
"""

import jax
import numpy as np
import pytest

from scp_tpu import ac
from scp_tpu.codec.ehem_codec import EHEMCodec
from scp_tpu.codec.octattn_codec import OctAttentionCodec
from scp_tpu.codec.slices import split_levels
from scp_tpu.core import build_octree, deoctree, gen_context, morton_encode
from scp_tpu.core.preprocess import preprocess_points
from scp_tpu.models.ehem import EHEM
from scp_tpu.models.octattention import OctAttention


def small_cloud(rng, n=260, bits=5):
    return np.unique(rng.integers(0, 2**bits, size=(n, 3)), axis=0)


def lidar_like(rng, n=400):
    r = rng.uniform(2.0, 60.0, n)
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.4, 0.2, n)
    return np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], 1
    )


@pytest.fixture(scope="module", params=["rans", "staged", "full"])
def ehem_codec(request):
    model = EHEM(
        self_depths=(2, 2),
        cross_depths=(1,),
        embed_dim=64,
        num_heads=2,
        window_size=16,
        mlp_ratio=2.0,
        knn_k=4,
    )
    d = np.zeros((1, 8, 4, 3), np.int32)
    p = np.zeros((1, 8, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), d, p)
    return EHEMCodec(model, variables, context_size=64, mode=request.param)


def test_ehem_roundtrip_cartesian(rng, ehem_codec):
    pts = small_cloud(rng)
    tree = build_octree(pts)
    ctx = gen_context(tree)
    slices = split_levels(ctx, angular=False)
    stream, bits, _ = ehem_codec.encode_to_stream(slices)
    assert bits > 0

    n_sym = ehem_codec.ac_symbols_per_node * slices.occ_stream.shape[0]
    dec = ehem_codec.new_stream_decoder(stream, n_sym)
    mm = np.array(slices.pos_mm, np.int64)
    codes = ehem_codec.decode(
        dec,
        slices.max_level,
        mm,
        angular=False,
        ground_truth=slices.occ_stream,
        level_sizes=slices.level_sizes,
    )
    np.testing.assert_array_equal(codes, slices.occ_stream)
    rec = deoctree(codes.astype(np.int64) + 1)
    np.testing.assert_array_equal(
        np.sort(morton_encode(rec, tree.max_level)),
        np.sort(morton_encode(pts, tree.max_level)),
    )


def test_ehem_roundtrip_spherical(rng, ehem_codec):
    pts = lidar_like(rng)
    res = preprocess_points(pts, system="spher", qs=60.0 / 127)
    slices = split_levels(res.context, angular=True)
    stream, bits, _ = ehem_codec.encode_to_stream(slices)
    dec = ehem_codec.new_stream_decoder(
        stream, ehem_codec.ac_symbols_per_node * slices.occ_stream.shape[0]
    )
    codes = ehem_codec.decode(
        dec,
        slices.max_level,
        np.array(slices.pos_mm, np.int64),
        angular=True,
        ground_truth=slices.occ_stream,
        level_sizes=slices.level_sizes,
    )
    np.testing.assert_array_equal(codes, slices.occ_stream)
    # full reconstruction: occupancy stream -> grid -> Cartesian
    rec_grid = deoctree(codes.astype(np.int64) + 1)
    rec_pts = res.grid.from_grid(rec_grid)
    np.testing.assert_allclose(
        np.sort(rec_pts, axis=0), np.sort(res.recon_points, axis=0), atol=1e-4
    )


def test_ehem_sharded_codec_roundtrip(rng):
    """Chunk-parallel codec over an 8-device mesh ("data" axis): grouped
    phase calls shard their lane axis across devices; the stream must stay
    losslessly decodable by the same sharded programs."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    model = EHEM(
        self_depths=(2, 2),
        cross_depths=(1,),
        embed_dim=64,
        num_heads=2,
        window_size=16,
        mlp_ratio=2.0,
        knn_k=4,
    )
    d = np.zeros((1, 8, 4, 3), np.int32)
    p = np.zeros((1, 8, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), d, p)
    codec = EHEMCodec(
        model, variables, context_size=64, group_size=8, mesh=mesh
    )

    pts = lidar_like(rng, n=1500)  # deepest levels span multiple group calls
    res = preprocess_points(pts, system="spher", qs=60.0 / 127)
    slices = split_levels(res.context, angular=True)
    stream, bits, _ = codec.encode_to_stream(slices)
    assert bits > 0

    dec = codec.new_stream_decoder(stream, slices.occ_stream.shape[0])
    codes = codec.decode(
        dec,
        slices.max_level,
        np.array(slices.pos_mm, np.int64),
        angular=True,
        ground_truth=slices.occ_stream,
        level_sizes=slices.level_sizes,
    )
    np.testing.assert_array_equal(codes, slices.occ_stream)
    # the sharded-codec claim must rest on actually-distributed work, not
    # just a lossless roundtrip: grouped phase calls must carry a lane
    # sharding over the mesh's "data" axis
    from jax.sharding import NamedSharding, PartitionSpec

    s = codec.last_rows_sharding
    assert isinstance(s, NamedSharding), s
    assert s.spec[0] == "data", s.spec


def test_octattention_incremental_consistency(rng):
    """decode_step logits must match the full forward at every position."""
    import jax.numpy as jnp

    from scp_tpu.models.octattention import OctAttention as OA

    model = OA(
        occ_embed_dim=16, level_embed_dim=4, octant_embed_dim=4,
        abs_pos_embed_dim=8, num_layers=2, num_heads=2, hidden_dim=64,
        context_size=16,
    )
    b, n, k = 1, 12, 4
    data = np.stack(
        [rng.integers(0, 255, (b, n, k)), rng.integers(0, 13, (b, n, k)),
         rng.integers(0, 9, (b, n, k))], axis=-1,
    ).astype(np.int32)
    pos = rng.random((b, n, k, 3), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    full = np.asarray(model.apply(variables, data, pos))

    cache = model.apply(variables, method=OA.init_cache)
    for t in range(n):
        logits, qs = model.apply(
            variables, data[0, t], pos[0, t], cache, t, method=OA.decode_step
        )
        np.testing.assert_allclose(np.asarray(logits), full[0, t], atol=2e-4)
        cache = model.apply(
            variables, data[0, t], pos[0, t], cache, t, qs,
            method=OA.decode_insert,
        )


def test_octattention_incremental_roundtrip(rng):
    from scp_tpu.codec.octattn_codec import OctAttentionCodec as Codec

    model = OctAttention(
        occ_embed_dim=16, level_embed_dim=4, octant_embed_dim=4,
        abs_pos_embed_dim=8, num_layers=2, num_heads=2, hidden_dim=64,
        context_size=32,
    )
    pts = small_cloud(rng, n=60, bits=4)
    tree = build_octree(pts)
    ctx = gen_context(tree)
    d = np.zeros((1, 32, 4, 3), np.int32)
    p = np.zeros((1, 32, 4, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(1), d, p)
    codec = Codec(model, variables)

    rows, syms, _ = codec.encode_incremental(ctx)
    enc = ac.StreamingEncoder()
    enc.append_quantized(rows, syms)
    stream, bits = enc.finish()
    _, occ_stream, max_level = codec.split_levels(ctx)
    dec = ac.ArithmeticDecoder(stream, occ_stream.shape[0])
    codes = codec.decode_incremental(dec, max_level, ground_truth=occ_stream)
    np.testing.assert_array_equal(codes, occ_stream)


def test_octattention_sequential_roundtrip(rng):
    """Sliding-window schedule (reference --sequential / decode.py)."""
    model = OctAttention(
        occ_embed_dim=16, level_embed_dim=4, octant_embed_dim=4,
        abs_pos_embed_dim=8, num_layers=2, num_heads=2, hidden_dim=64,
        context_size=16,
    )
    pts = small_cloud(rng, n=40, bits=3)
    tree = build_octree(pts)
    ctx = gen_context(tree)
    d = np.zeros((1, 16, 4, 3), np.int32)
    p = np.zeros((1, 16, 4, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(1), d, p)
    from scp_tpu.codec.octattn_codec import OctAttentionCodec as Codec

    codec = Codec(model, variables)
    stream, _, _ = codec.encode_to_stream(ctx, sequential=True)
    _, occ_stream, max_level = codec.split_levels(ctx)
    dec = ac.ArithmeticDecoder(stream, occ_stream.shape[0])
    codes = codec.decode(dec, max_level, ground_truth=occ_stream, sequential=True)
    np.testing.assert_array_equal(codes, occ_stream)


def test_octattention_whole_stream_roundtrip(rng):
    """level_wise=False (obj-type default): one padded BFS stream."""
    model = OctAttention(
        occ_embed_dim=16, level_embed_dim=4, octant_embed_dim=4,
        abs_pos_embed_dim=8, num_layers=2, num_heads=2, hidden_dim=64,
        context_size=32,
    )
    pts = small_cloud(rng, n=70, bits=4)
    tree = build_octree(pts)
    ctx = gen_context(tree)
    d = np.zeros((1, 32, 4, 3), np.int32)
    p = np.zeros((1, 32, 4, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(1), d, p)
    from scp_tpu.codec.octattn_codec import OctAttentionCodec as Codec

    codec = Codec(model, variables)
    stream, bits, _ = codec.encode_to_stream(ctx, level_wise=False)
    _, occ_stream, max_level = codec.split_levels(ctx)
    dec = ac.ArithmeticDecoder(stream, occ_stream.shape[0])
    codes = codec.decode(
        dec, max_level, ground_truth=occ_stream, level_wise=False
    )
    np.testing.assert_array_equal(codes, occ_stream)


def test_octattention_roundtrip(rng):
    model = OctAttention(
        occ_embed_dim=16,
        level_embed_dim=4,
        octant_embed_dim=4,
        abs_pos_embed_dim=8,
        num_layers=2,
        num_heads=2,
        hidden_dim=64,
        context_size=32,
    )
    pts = small_cloud(rng, n=80, bits=4)
    tree = build_octree(pts)
    ctx = gen_context(tree)
    d = np.zeros((1, 32, 4, 3), np.int32)
    p = np.zeros((1, 32, 4, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(1), d, p)
    codec = OctAttentionCodec(model, variables)

    stream, bits, _ = codec.encode_to_stream(ctx)
    _, occ_stream, max_level = codec.split_levels(ctx)
    dec = ac.ArithmeticDecoder(stream, occ_stream.shape[0])
    codes = codec.decode(dec, max_level, ground_truth=occ_stream)
    np.testing.assert_array_equal(codes, occ_stream)
    rec = deoctree(codes.astype(np.int64) + 1)
    np.testing.assert_array_equal(
        np.sort(morton_encode(rec, tree.max_level)),
        np.sort(morton_encode(pts, tree.max_level)),
    )


def test_ehem_roundtrip_static_knn(rng, monkeypatch):
    """SCP_STATIC_KNN=1 (position graph reused for all EdgeConv rounds)
    threads consistently through encode and decode: lossless roundtrip and
    the knob stamped in the header."""
    monkeypatch.setenv("SCP_STATIC_KNN", "1")
    model = EHEM(
        self_depths=(2, 2), cross_depths=(1,), embed_dim=64, num_heads=2,
        window_size=16, mlp_ratio=2.0, knn_k=4,
    )
    d = np.zeros((1, 8, 4, 3), np.int32)
    p = np.zeros((1, 8, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), d, p)
    codec = EHEMCodec(model, variables, context_size=64, mode="rans")
    assert "staticknn=1" in codec.coding_params()
    pts = lidar_like(rng)
    res = preprocess_points(pts, system="spher", qs=60.0 / 127)
    slices = split_levels(res.context, angular=True)
    stream, bits, _ = codec.encode_to_stream(slices)
    dec = codec.new_stream_decoder(
        stream, codec.ac_symbols_per_node * slices.occ_stream.shape[0]
    )
    codes = codec.decode(
        dec,
        slices.max_level,
        np.array(slices.pos_mm, np.int64),
        angular=True,
        ground_truth=slices.occ_stream,
        level_sizes=slices.level_sizes,
    )
    np.testing.assert_array_equal(codes, slices.occ_stream)
