"""Fine-grained geo-trunk attribution at the bench shape (16 x 8192).

Per-stage timings with REAL KNN indices (gather locality matters: Morton
order makes true neighbors sequence-local, random indices overstate the
gather cost), plus a windowed-KNN candidate A/B: distances only against
a +-WIN sequence window instead of all 8192 (Morton order concentrates
spatial neighbors nearby; window stats printed first).

    python scratch/prof_geo2.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

G, N, K = 16, 8192, 20


def timed(name, fn, *args, n=7):
    float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:44s} {med * 1e3:8.2f} ms  (min {min(ts) * 1e3:7.2f})",
          flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from scp_tpu.codec.slices import split_levels
    from scp_tpu.core.preprocess import kitti_qs, preprocess_points
    from scp_tpu.ops.knn import _top_k, gather_neighbors, knn_indices
    from scp_tpu.tools.train_bench_ckpt import synth_kitti

    # real bench-cloud positions (Morton-ordered level slices) for
    # locality-faithful KNN graphs
    rng = np.random.default_rng(0)
    cloud = synth_kitti(rng, 120_000)
    res = preprocess_points(cloud, system="spher", qs=kitti_qs(16))
    sl = split_levels(res.context, angular=True)
    ctx = res.context  # (M, 4, 6)
    m = ctx.shape[0]
    take = np.linspace(0, m - N * G, G, dtype=np.int64)
    pos = np.stack([ctx[o : o + N, 3, 3:6] for o in take]).astype(np.float32)
    data = np.stack([ctx[o : o + N, :, :3] for o in take]).astype(np.int32)
    flat = data.reshape(G, N, -1)[:, :, :-1]
    pos_d, flat_d = jax.device_put(pos), jax.device_put(flat)

    # sequence-distance distribution of TRUE knn (CPU, one lane)
    p0 = pos[0].astype(np.float32)
    d2 = ((p0[:512, None, :] - p0[None, :, :]) ** 2).sum(-1)
    nn_idx = np.argsort(d2, axis=1)[:, :K]
    gap = np.abs(nn_idx - np.arange(512)[:, None])
    print(
        "true-KNN sequence gap (lane 0, first 512 queries): "
        f"p50 {np.percentile(gap, 50):.0f}  p95 {np.percentile(gap, 95):.0f} "
        f" p99 {np.percentile(gap, 99):.0f}  max {gap.max()}",
        flush=True,
    )

    from scp_tpu.models.ehem import EHEM

    model = EHEM(dtype=jnp.bfloat16)
    from scp_tpu.train.checkpoints import load_params_npz

    variables = jax.device_put(
        load_params_npz(os.path.join("checkpoints", "ehem_synth_f16.npz"))
    )

    geo = lambda mdl, f, p: mdl.geo(f, p, train=False)  # noqa: E731

    @jax.jit
    def geo_full(v, f, p):
        return jnp.sum(
            model.apply(v, f, p, method=geo).astype(jnp.float32)
        )

    # stage inputs captured from the real geo forward on CPU? too slow —
    # rebuild the stage tensors on device instead
    @jax.jit
    def stage_feats(v, f, p):
        """Returns (f2 144ch, f3 192ch) EXACTLY as geo builds them."""

        def run(mdl, f, p):
            b, n = f.shape[:2]
            level, octant, occ = f[:, :, 0::3], f[:, :, 1::3], f[:, :, 2::3]
            x = jnp.concatenate(
                [mdl.geo.occ_enc(occ).reshape(b, n, -1),
                 mdl.geo.level_enc(level).reshape(b, n, -1),
                 mdl.geo.octant_enc(octant).reshape(b, n, -1)], -1)
            pos1 = mdl.geo.conv1(p.astype(mdl.geo.dtype),
                                 knn_indices(p.astype(mdl.geo.dtype), K), False)
            f2 = jnp.concatenate([pos1, x], -1)
            pos2 = mdl.geo.conv2(f2, knn_indices(f2, K), False)
            x2 = mdl.geo.mlp2(x)
            f3 = jnp.concatenate([pos2, x2], -1)
            return f2, f3

        return model.apply(v, f, p, method=run)

    f2, f3 = stage_feats(variables, flat_d, pos_d)
    f2, f3 = jax.device_put(np.asarray(f2)), jax.device_put(np.asarray(f3))

    def knn_only(feats):
        @jax.jit
        def fn(f):
            return jnp.sum(knn_indices(f, K).astype(jnp.float32))
        return fn

    idx144 = jax.device_put(np.asarray(jax.jit(lambda f: knn_indices(f, K))(f2)))

    @jax.jit
    def gathermax(a, idx):
        return jnp.sum(
            jnp.max(gather_neighbors(a, idx), axis=2).astype(jnp.float32)
        )

    @jax.jit
    def dense_pair(f):
        """conv2's two row-block matmuls (144->128) alone."""
        w = jnp.zeros((144, 128), jnp.bfloat16)
        return jnp.sum((f @ w).astype(jnp.float32)) + jnp.sum(
            (f @ w).astype(jnp.float32)
        )

    a64 = jax.device_put(
        rng.normal(0, 1, (G, N, 64)).astype(np.float32).astype(jnp.bfloat16)
    )
    a128 = jax.device_put(
        rng.normal(0, 1, (G, N, 128)).astype(np.float32).astype(jnp.bfloat16)
    )
    a256 = jax.device_put(
        rng.normal(0, 1, (G, N, 256)).astype(np.float32).astype(jnp.bfloat16)
    )

    # windowed KNN candidate: queries in 1024-chunks, candidates from a
    # +-WIN sequence window around the chunk (edge chunks clamp)
    def knn_windowed(feats, win):
        b, n, c = feats.shape
        chunk = 1024
        sdt = feats.dtype
        starts = [
            min(max(q - win, 0), n - (chunk + 2 * win)) for q in
            range(0, n, chunk)
        ]
        outs = []
        for qi, s in enumerate(starts):
            q = feats[:, qi * chunk : (qi + 1) * chunk]
            cand = jax.lax.dynamic_slice_in_dim(feats, s, chunk + 2 * win, 1)
            sc = 2.0 * jnp.einsum(
                "bqc,bmc->bqm", q, cand, preferred_element_type=jnp.float32
            )
            sq_q = jnp.sum(q.astype(jnp.float32) ** 2, -1)
            sq_c = jnp.sum(cand.astype(jnp.float32) ** 2, -1)
            sc = (sc - sq_q[:, :, None] - sq_c[:, None, :]).astype(sdt)
            loc = _top_k(sc, K)
            outs.append(loc + s)
        return jnp.concatenate(outs, axis=1)

    for win in (1536,):
        @jax.jit
        def knn_win(f, _w=win):
            return jnp.sum(knn_windowed(f, _w).astype(jnp.float32))

        # neighbor agreement vs full KNN (lane 0)
        full_idx = np.asarray(jax.jit(lambda f: knn_indices(f, K))(f2))[0]
        win_idx = np.asarray(jax.jit(lambda f: knn_windowed(f, win))(f2))[0]
        agree = np.mean([
            len(set(full_idx[i]) & set(win_idx[i])) / K
            for i in range(0, N, 37)
        ])
        print(f"windowed knn win={win}: neighbor agreement {agree:.3f}",
              flush=True)
        timed(f"knn windowed({win}) c144", knn_win, f2)

    timed("geo full", geo_full, variables, flat_d, pos_d)
    timed("knn c3 (pos)", knn_only(None), pos_d.astype(jnp.bfloat16))
    timed("knn c144", knn_only(None), f2)
    timed("knn c192", knn_only(None), f3)
    timed("gather+max F64 (real idx)", gathermax, a64, idx144)
    timed("gather+max F128 (real idx)", gathermax, a128, idx144)
    timed("gather+max F256 (real idx)", gathermax, a256, idx144)
    timed("dense row-blocks 144->128 x2", dense_pair, f2)


if __name__ == "__main__":
    main()
