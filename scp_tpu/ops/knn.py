"""K-nearest-neighbor ops for dynamic EdgeConv graphs.

The hot op of the EHEM trunk: pairwise squared-L2 + top-k over feature
tensors, recomputed per EdgeConv round (reference dgcnn.py:10-45 bounds the
O(N^2) matrix with 4096-column host-side chunking; here query tiles ride a
lax.map so peak memory is (B, TILE, N) while the distance product stays one
MXU-shaped matmul per tile).

`knn_indices` dispatches to a Pallas fused distance+top-k kernel on TPU for
large N when enabled (SCP_PALLAS_KNN=1), else the XLA path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_KNN_CHUNK = 1024


def _top_k(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k largest scores along the last axis.

    On TPU, lax.approx_max_k maps onto the hardware top-k unit (orders of
    magnitude cheaper than the sort-based exact top_k, deterministic for a
    given program+input, which is all codec consistency needs; neighbor
    recall ~0.95 has no measurable effect on EdgeConv features).  Exact
    everywhere else, or with SCP_EXACT_KNN=1.
    """
    if jax.default_backend() != "cpu" and not os.environ.get("SCP_EXACT_KNN"):
        # SCP_KNN_RECALL trades neighbor recall for top-k unit time (the
        # EdgeConv features are robust to approximate graphs; the stream
        # stays decodable — the backend stamp pins the compiled programs).
        # 0.85 measured rate-neutral on the trained model (bpp 23.325 vs
        # 23.327 at 0.95) while cutting the top-k pass in all 3 graphs.
        recall = float(os.environ.get("SCP_KNN_RECALL", 0.85))
        return jax.lax.approx_max_k(scores, k, recall_target=recall)[1]
    return jax.lax.top_k(scores, k)[1]


def knn_indices(feats: jnp.ndarray, k: int) -> jnp.ndarray:
    """k nearest neighbors (squared L2, self included).

    feats: (B, N, C) -> (B, N, k) int32 indices.
    """
    if (
        os.environ.get("SCP_PALLAS_KNN")
        and feats.shape[1] >= 2048
        and jax.default_backend() not in ("cpu",)
    ):
        from scp_tpu.ops.pallas_knn import knn_pallas

        return knn_pallas(feats, k)
    return _knn_xla(feats, k)


def _score_dtype(feats: jnp.ndarray) -> jnp.dtype:
    """Storage dtype for the (N, N) score matrix — the single largest HBM
    tensor of the trunk (16 lanes x 8192^2 x 3 graphs = 26 GB/call in f32).

    Scores are computed with f32 accumulation (cancellation-safe: the
    2ab - a^2 - b^2 form is exact negated squared distance, so values near
    the top-k are near ZERO where floating point is fine-grained), then
    stored in the feature dtype: bf16 halves the matmul-epilogue write and
    the top-k read.  SCP_KNN_F32=1 restores f32 storage (A/B)."""
    if feats.dtype == jnp.bfloat16 and not os.environ.get("SCP_KNN_F32"):
        return jnp.bfloat16
    return jnp.float32


def _knn_xla(feats: jnp.ndarray, k: int) -> jnp.ndarray:
    b, n, c = feats.shape
    sq = jnp.sum(
        feats.astype(jnp.float32) * feats.astype(jnp.float32), axis=-1
    )  # (B, N)
    sdt = _score_dtype(feats)

    if n <= _KNN_CHUNK:
        scores = 2.0 * jnp.einsum(
            "bnc,bmc->bnm", feats, feats, preferred_element_type=jnp.float32
        )
        scores = (scores - sq[:, :, None] - sq[:, None, :]).astype(sdt)
        return _top_k(scores, k)

    n_chunks = -(-n // _KNN_CHUNK)
    pad = n_chunks * _KNN_CHUNK - n
    q = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    q_sq = jnp.pad(sq, ((0, 0), (0, pad)))
    q = q.reshape(b, n_chunks, _KNN_CHUNK, c)
    q_sq = q_sq.reshape(b, n_chunks, _KNN_CHUNK)

    def one_chunk(args):
        qc, qsqc = args  # (B, CHUNK, C), (B, CHUNK)
        s = 2.0 * jnp.einsum(
            "bqc,bmc->bqm", qc, feats, preferred_element_type=jnp.float32
        )
        s = (s - qsqc[:, :, None] - sq[:, None, :]).astype(sdt)
        return _top_k(s, k)

    idx = jax.lax.map(one_chunk, (q.transpose(1, 0, 2, 3), q_sq.transpose(1, 0, 2)))
    idx = idx.transpose(1, 0, 2, 3).reshape(b, n_chunks * _KNN_CHUNK, k)
    return idx[:, :n]


@jax.custom_vjp
def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """`jnp.take(table, idx, axis=0)` with a sort-based segment-sum VJP.

    The default VJP of a duplicate-index gather is a scatter-add.  This
    backward contains NO scatter: sort the cotangent rows by target index
    (one lax.sort of M int32 keys), prefix-sum them in f32, and difference
    the prefix at the segment boundaries found by searchsorted — gathers
    only.  f32 accumulation over the ~1.3M-row prefix keeps the boundary
    differences accurate to ~1e-5 relative (verified against the
    scatter-add oracle in tests/test_ops.py).

    Measured on a v5e chip at batch 8x8192 (scratch/prof_p1_split.py):
    the sort-based backward is ~20% SLOWER per train step than XLA's
    scatter-add (the log-pass cumsum over 1.3M rows dominates), so
    `gather_neighbors` keeps the scatter-add VJP by default and this
    path stays available for A/B via SCP_SORT_GATHER_BWD=1.
    """
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx):
    # zero-size proxy carries the table's (rows, dtype) through residuals
    proxy = jnp.zeros((table.shape[0], 0), table.dtype)
    return jnp.take(table, idx, axis=0), (idx, proxy)


def _take_rows_bwd(res, g):
    import numpy as np

    idx, proxy = res
    rows, dt = proxy.shape[0], proxy.dtype
    m, c = g.shape
    iota = jnp.arange(m, dtype=jnp.int32)
    sidx, order = jax.lax.sort((idx.astype(jnp.int32), iota), num_keys=1)
    gs = jnp.take(g, order, axis=0).astype(jnp.float32)
    csum = jnp.concatenate(
        [jnp.zeros((1, c), jnp.float32), jnp.cumsum(gs, axis=0)], axis=0
    )
    bounds = jnp.searchsorted(sidx, jnp.arange(rows + 1, dtype=jnp.int32))
    grad = jnp.take(csum, bounds[1:], axis=0) - jnp.take(csum, bounds[:-1], axis=0)
    return grad.astype(dt), np.zeros(idx.shape, dtype=jax.dtypes.float0)


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def gather_neighbors(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats (B, N, C), idx (B, N, k) -> (B, N, k, C).

    Lowered as ONE flat row-gather over a (B*N, C) table: ~5x faster on
    TPU than the batched advanced-indexing gather vmap produces (measured
    3 ms vs 14 ms for (8, 8192, 20, 128) bf16 on a v5e chip).  The
    backward is XLA's scatter-add; SCP_SORT_GATHER_BWD=1 swaps in the
    sort-based segment-sum VJP of `take_rows` (measured slower, kept
    for A/B — see its docstring).
    """
    b, n, c = feats.shape
    flat = feats.reshape(b * n, c)
    base = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    flat_idx = (idx + base).reshape(-1)
    if os.environ.get("SCP_SORT_GATHER_BWD"):
        out = take_rows(flat, flat_idx)
    else:
        out = jnp.take(flat, flat_idx, axis=0)
    return out.reshape(b, idx.shape[1], idx.shape[2], c)


def max_over_neighbors(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats (B, N, C), idx (B, N, k) -> (B, N, C): max over the k
    gathered neighbor rows, gathered in K-MAJOR order.

    `max(gather_neighbors(...), axis=2)` makes XLA materialize the
    (B, N, k, C) node-major tensor and re-read it for the reduce; with the
    gather laid out k-major — all nodes' neighbor 0, then neighbor 1, … —
    the reduce runs over the LEADING axis of k contiguous (B, N, C)
    slabs, which XLA folds into the gather consumer.  Chip A/B at
    (8, 8192, 20), locality-matched indices (scratch/prof_gather_max.py):
    5.77/5.60/8.15 ms vs 7.23/7.09/10.46 ms for F=64/128/256.  Bit-exact
    vs the node-major form (same value multiset per node; max has no
    rounding).  SCP_NO_KMAJOR_MAX=1 restores the node-major reduce.
    Inference-path helper — its backward is fine but untuned; training
    keeps the explicit (B, N, k, C) edge tensor for BatchNorm anyway."""
    if os.environ.get("SCP_NO_KMAJOR_MAX"):
        return jnp.max(gather_neighbors(feats, idx), axis=2)
    b, n, c = feats.shape
    flat = feats.reshape(b * n, c)
    base = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    km = jnp.moveaxis(idx + base, -1, 0).reshape(-1)  # k-major flat order
    g = jnp.take(flat, km, axis=0).reshape(idx.shape[2], b, n, c)
    return jnp.max(g, axis=0)


def edge_features(feats: jnp.ndarray, k: int) -> jnp.ndarray:
    """(neighbor - center, center) edge tensor: (B, N, k, 2C)."""
    idx = knn_indices(feats, k)
    nb = gather_neighbors(feats, idx)
    center = jnp.broadcast_to(feats[:, :, None, :], nb.shape)
    return jnp.concatenate([nb - center, center], axis=-1)
