"""KNN ops: XLA path vs brute force, Pallas kernel (interpret) vs XLA."""

import numpy as np
import pytest

from scp_tpu.ops.knn import _knn_xla, edge_features, gather_neighbors, knn_indices


def brute_knn(feats, k):
    b, n, c = feats.shape
    out = np.empty((b, n, k), np.int64)
    for bi in range(b):
        d = ((feats[bi][:, None, :] - feats[bi][None, :, :]) ** 2).sum(-1)
        out[bi] = np.argsort(d, axis=1, kind="stable")[:, :k]
    return out


def same_neighbor_sets(a, b, feats):
    """Indices may differ on exact-tie distances; compare distance multisets."""
    for bi in range(feats.shape[0]):
        f = feats[bi]
        da = np.sort(((f[a[bi]] - f[:, None, :]) ** 2).sum(-1), axis=1)
        db = np.sort(((f[b[bi]] - f[:, None, :]) ** 2).sum(-1), axis=1)
        np.testing.assert_allclose(da, db, atol=1e-4)


def test_knn_xla_matches_brute(rng):
    feats = rng.random((2, 100, 3), dtype=np.float32)
    idx = np.asarray(_knn_xla(feats, 8))
    ref = brute_knn(feats, 8)
    same_neighbor_sets(idx, ref, feats)
    # self is always the nearest
    assert (idx[:, :, 0] == np.arange(100)[None]).all()


def test_knn_xla_chunked_path(rng):
    feats = rng.random((1, 2500, 3), dtype=np.float32)  # > chunk size
    idx = np.asarray(_knn_xla(feats, 5))
    ref = brute_knn(feats, 5)
    same_neighbor_sets(idx, ref, feats)


def test_gather_and_edges(rng):
    feats = rng.random((2, 50, 4), dtype=np.float32)
    idx = knn_indices(feats, 6)
    nb = np.asarray(gather_neighbors(feats, idx))
    assert nb.shape == (2, 50, 6, 4)
    np.testing.assert_allclose(nb[0, 0, 0], feats[0, np.asarray(idx)[0, 0, 0]])
    e = np.asarray(edge_features(feats, 6))
    assert e.shape == (2, 50, 6, 8)
    # center channel equals the node's own features
    np.testing.assert_allclose(e[0, 3, 2, 4:], feats[0, 3])


@pytest.mark.slow
def test_pallas_knn_interpret_matches_xla(rng):
    from scp_tpu.ops.pallas_knn import knn_pallas

    feats = rng.random((1, 2048, 8), dtype=np.float32)
    k = 20
    idx_p = np.asarray(knn_pallas(feats, k, interpret=True))
    idx_x = np.asarray(_knn_xla(feats, k))
    same_neighbor_sets(idx_p, idx_x, feats)
