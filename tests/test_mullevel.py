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
from scp_tpu.core import deoctree, morton_prefix_filter
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
        )
        np.testing.assert_array_equal(codes, s.occ_stream)
        # reconstruction of this subtree
        rec = deoctree(codes.astype(np.int64) + 1)
        assert rec.shape[0] > 0
