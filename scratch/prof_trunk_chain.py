"""Chained-dispatch trunk attribution at the bench shape (16 x 8192).

The earlier single-call profiles (prof_p1_parts, prof_geo2) sat on the
~24 ms tunnel dispatch floor, which hides everything under ~20 ms.  Here
each submodule is dispatched M times back-to-back (the device executes
programs serially in dispatch order) and we block once on the last
output: per-call device time = (wall - floor) / M, with the floor
measured the same way on a trivial program.

    python scratch/prof_trunk_chain.py
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
M = 10  # chained dispatches per measurement
FLOOR = [0.0]


def _fetch(out):
    """Axon lesson (BUILDLOG round 1, re-learned round 4): on the tunneled
    backend `block_until_ready` does NOT reliably resolve freshly-compiled
    programs — a timing must end with a real element FETCH."""
    x = out[0] if isinstance(out, (tuple, list)) else out
    return float(np.asarray(x.ravel()[0]))


def chain(name, fn, *args, reps=3):
    for _ in range(2):
        _fetch(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(M):
            out = fn(*args)
        _fetch(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = (best - FLOOR[0]) / M
    print(f"{name:40s} {per * 1e3:8.2f} ms/call  (chain {best * 1e3:7.1f})",
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    from scp_tpu.codec.ehem_codec import logits_to_cdf
    from scp_tpu.core.preprocess import kitti_qs, preprocess_points
    from scp_tpu.models.ehem import EHEM
    from scp_tpu.ops.knn import gather_neighbors, knn_indices
    from scp_tpu.tools.train_bench_ckpt import synth_kitti
    from scp_tpu.train.checkpoints import load_params_npz

    rng = np.random.default_rng(0)
    cloud = synth_kitti(rng, 120_000)
    res = preprocess_points(cloud, system="spher", qs=kitti_qs(16))
    ctx = res.context  # (M, 4, 6)
    m = ctx.shape[0]
    take = np.linspace(0, m - N, G, dtype=np.int64)
    pos = np.stack([ctx[o : o + N, 3, 3:6] for o in take]).astype(np.float32)
    pos = pos / max(1.0, pos.max())
    data = np.stack([ctx[o : o + N, :, :3] for o in take]).astype(np.int32)
    flat = data.reshape(G, N, -1)[:, :, :-1]
    pos_d, flat_d, data_d = (
        jax.device_put(pos), jax.device_put(flat), jax.device_put(data))

    model = EHEM(dtype=jnp.bfloat16)
    variables = jax.device_put(
        load_params_npz(os.path.join("checkpoints", "ehem_synth_f16.npz")))

    # dispatch floor (chained trivial programs + the one-element fetch)
    tiny = jax.jit(lambda x: x * 1.00001)
    x0 = jax.device_put(np.ones((8, 128), np.float32))
    _fetch(tiny(x0))
    t0 = time.perf_counter()
    o = x0
    for _ in range(M):
        o = tiny(o)
    _fetch(o)
    FLOOR[0] = time.perf_counter() - t0
    print(f"dispatch floor for {M} calls: {FLOOR[0] * 1e3:.1f} ms", flush=True)

    # ---- full phases ----
    @jax.jit
    def p1(v, d, p):
        logits1, f1, f2 = model.apply(v, d, p, method=EHEM.decode_phase1)
        return logits_to_cdf(logits1), f1, f2

    @jax.jit
    def geo_fn(v, f, p):
        return model.apply(v, f, p, method=lambda m, f, p: m.geo(f, p, train=False))

    feat = geo_fn(variables, flat_d, pos_d)
    feat = jax.device_put(np.asarray(feat))

    @jax.jit
    def swin_fn(v, f):
        return model.apply(v, f, method=lambda m, f: m.swin_self(f))

    states = swin_fn(variables, feat)
    states = [jax.device_put(np.asarray(s)) for s in states]

    @jax.jit
    def heads_fn(v, sts):
        def run(mdl, sts):
            fa1 = mdl.ancient_mlp.multiscale(sts[1:])
            return mdl.prob_pred_mlp1(fa1).astype(jnp.float32), fa1
        logits1, fa1 = model.apply(v, sts, method=run)
        return logits_to_cdf(logits1), fa1

    rows1, fa1 = heads_fn(variables, states)
    _, f1_d, f2_d = p1(variables, data_d, pos_d)
    f1_d = jax.device_put(np.asarray(f1_d))
    f2_d = jax.device_put(np.asarray(f2_d))
    occ = jax.device_put(
        np.ascontiguousarray(flat[:, 0::2, 2]).astype(np.int32))

    @jax.jit
    def p2(v, f1, f2, oc):
        return logits_to_cdf(
            model.apply(v, f1, f2, oc, False, method=EHEM.decode_phase2))

    chain("p1 full (trunk+head+cdf)", p1, variables, data_d, pos_d)
    chain("geo", geo_fn, variables, flat_d, pos_d)
    chain("swin_self", swin_fn, variables, feat)
    chain("heads (ancient+mlp1+cdf)", heads_fn, variables, states)
    chain("p2 (cross+mlp2+cdf)", p2, variables, f1_d, f2_d, occ)

    # ---- geo pieces ----
    @jax.jit
    def knn_fn(f):
        return knn_indices(f, K)

    @jax.jit
    def embeds_fn(v, f):
        def run(mdl, f):
            b, n = f.shape[:2]
            level, octant, occ = f[:, :, 0::3], f[:, :, 1::3], f[:, :, 2::3]
            return jnp.concatenate(
                [mdl.geo.occ_enc(occ).reshape(b, n, -1),
                 mdl.geo.level_enc(level).reshape(b, n, -1),
                 mdl.geo.octant_enc(octant).reshape(b, n, -1)], -1)
        return model.apply(v, f, method=run)

    x80 = embeds_fn(variables, flat_d)

    @jax.jit
    def conv_fn(v, f, idx):
        def run(mdl, f, idx):
            return mdl.geo.conv2(f, idx, False)
        return model.apply(v, f, idx, method=run)

    f2s = np.asarray(jnp.concatenate(
        [np.zeros((G, N, 64), np.float32), np.asarray(x80, np.float32)],
        -1)).astype(np.float32)
    f2s = jax.device_put(f2s.astype(jnp.bfloat16))
    idx144 = jax.device_put(np.asarray(knn_fn(f2s)))

    @jax.jit
    def gmax(a, idx):
        return jnp.max(gather_neighbors(a, idx), axis=2)

    a64 = jax.device_put(rng.normal(0, 1, (G, N, 64)).astype(jnp.bfloat16))
    a128 = jax.device_put(rng.normal(0, 1, (G, N, 128)).astype(jnp.bfloat16))
    a256 = jax.device_put(rng.normal(0, 1, (G, N, 256)).astype(jnp.bfloat16))

    @jax.jit
    def mlps_fn(v, x):
        def run(mdl, x):
            return mdl.geo.mlp3(mdl.geo.mlp2(x))
        return model.apply(v, x, method=run)

    chain("knn c3", knn_fn, pos_d.astype(jnp.bfloat16))
    chain("knn c144", knn_fn, f2s)
    chain("embeds (3 tables)", embeds_fn, variables, flat_d)
    chain("EdgeConv2 full (dense+gather+max)", conv_fn, variables, f2s, idx144)
    chain("gather+max F64", gmax, a64, idx144)
    chain("gather+max F128", gmax, a128, idx144)
    chain("gather+max F256", gmax, a256, idx144)
    chain("mlp2+mlp3 (per-node)", mlps_fn, variables, x80)


if __name__ == "__main__":
    main()
