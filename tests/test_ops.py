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


def test_take_rows_sort_bwd_matches_scatter(rng):
    """The sort-based segment-sum VJP equals the scatter-add VJP."""
    import jax
    import jax.numpy as jnp

    from scp_tpu.ops.knn import take_rows

    table = rng.standard_normal((64, 8)).astype(np.float32)
    idx = rng.integers(0, 64, 300).astype(np.int32)  # heavy duplication
    ct = rng.standard_normal((300, 8)).astype(np.float32)

    out, vjp = jax.vjp(lambda t: take_rows(t, idx), table)
    np.testing.assert_array_equal(np.asarray(out), table[idx])
    got = np.asarray(vjp(jnp.asarray(ct))[0])

    ref_out, ref_vjp = jax.vjp(lambda t: jnp.take(t, idx, axis=0), table)
    ref = np.asarray(ref_vjp(jnp.asarray(ct))[0])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # rows never gathered get exactly zero gradient
    mask = np.ones(64, bool)
    mask[np.unique(idx)] = False
    assert (got[mask] == 0).all()


def test_gather_neighbors_grad_through_model_path(rng, monkeypatch):
    """gather_neighbors stays differentiable under the opt-in sort-based
    VJP (SCP_SORT_GATHER_BWD=1) and its gradient matches scatter-add."""
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("SCP_SORT_GATHER_BWD", "1")
    feats = rng.random((2, 40, 4), dtype=np.float32)
    idx = jnp.asarray(rng.integers(0, 40, (2, 40, 6)), jnp.int32)

    def loss(f):
        return jnp.sum(jnp.sin(gather_neighbors(f, idx)))

    g = np.asarray(jax.grad(loss)(jnp.asarray(feats)))

    def ref_loss(f):
        b, n, c = f.shape
        flat = f.reshape(b * n, c)
        base = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
        nb = jnp.take(flat, (idx + base).reshape(-1), axis=0)
        return jnp.sum(jnp.sin(nb.reshape(b, 40, 6, c)))

    ref = np.asarray(jax.grad(ref_loss)(jnp.asarray(feats)))
    # f32 prefix-sum reassociation: ~1e-5 relative vs the scatter oracle
    np.testing.assert_allclose(g, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_knn_interpret_matches_xla(rng):
    from scp_tpu.ops.pallas_knn import knn_pallas

    feats = rng.random((1, 2048, 8), dtype=np.float32)
    k = 20
    idx_p = np.asarray(knn_pallas(feats, k, interpret=True))
    idx_x = np.asarray(_knn_xla(feats, k))
    same_neighbor_sets(idx_p, idx_x, feats)


def test_knn_bf16_scores_recall(rng, monkeypatch):
    """bf16 score storage (the TPU default for bf16 features) must keep
    near-perfect neighbor recall vs f32 scores: scores are exact negated
    squared distances, so top-k candidates sit near zero where bf16 is
    fine-grained."""
    import jax.numpy as jnp

    from scp_tpu.ops.knn import knn_indices

    pts = rng.random((2, 512, 3), np.float32)
    f32_idx = np.asarray(knn_indices(jnp.asarray(pts), 8))
    bf_idx = np.asarray(knn_indices(jnp.asarray(pts, jnp.bfloat16), 8))
    agree = [
        len(set(f32_idx[b, i]) & set(bf_idx[b, i])) / 8.0
        for b in range(2)
        for i in range(512)
    ]
    assert np.mean(agree) > 0.9, np.mean(agree)
