"""Model unit tests: shapes, causality, dual-stream and checkerboard
information-flow properties (the properties that make the codec lossless)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scp_tpu.config import load_config
from scp_tpu.models import build_model
from scp_tpu.models.ehem import EHEM
from scp_tpu.models.octattention import OctAttention


def tiny_octattention():
    return OctAttention(
        occ_embed_dim=16,
        level_embed_dim=4,
        octant_embed_dim=4,
        abs_pos_embed_dim=8,
        num_layers=2,
        num_heads=2,
        hidden_dim=64,
        context_size=64,
    )


def make_octattn_inputs(rng, b=2, n=32, k=4):
    data = np.stack(
        [
            rng.integers(0, 256, (b, n, k)),
            rng.integers(0, 13, (b, n, k)),
            rng.integers(0, 9, (b, n, k)),
        ],
        axis=-1,
    ).astype(np.int32)
    pos = rng.random((b, n, k, 3), dtype=np.float32)
    return jnp.asarray(data), jnp.asarray(pos)


def test_octattention_shapes(rng):
    model = tiny_octattention()
    data, pos = make_octattn_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), data, pos)
    out = model.apply(params, data, pos)
    assert out.shape == (2, 32, 255)
    assert np.isfinite(np.asarray(out)).all()


def test_octattention_dropout(rng):
    """train.dropout must be live (reference attention_model.py has dropout
    throughout): training mode with different rngs gives different logits;
    eval mode is deterministic and rng-free."""
    model = OctAttention(
        occ_embed_dim=16, level_embed_dim=4, octant_embed_dim=4,
        abs_pos_embed_dim=8, num_layers=2, num_heads=2, hidden_dim=64,
        context_size=64, dropout=0.5,
    )
    data, pos = make_octattn_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), data, pos)
    a = model.apply(
        params, data, pos, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    b = model.apply(
        params, data, pos, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # eval path: no rng needed, bit-stable
    e1 = model.apply(params, data, pos)
    e2 = model.apply(params, data, pos)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_octattention_causal_and_dual_stream(rng):
    """Logits at position i must not depend on occupancies at positions >= i
    of the node stream, NOR on node i's own occupancy."""
    model = tiny_octattention()
    data, pos = make_octattn_inputs(rng, b=1, n=16)
    params = model.init(jax.random.PRNGKey(0), data, pos)
    base = np.asarray(model.apply(params, data, pos))

    # perturb own occupancy of node 7 (channel 0, ancestor row -1)
    d2 = data.at[0, 7, -1, 0].set((data[0, 7, -1, 0] + 13) % 255)
    out2 = np.asarray(model.apply(params, d2, pos))
    np.testing.assert_allclose(out2[0, :8], base[0, :8], atol=1e-5)
    assert not np.allclose(out2[0, 8:], base[0, 8:], atol=1e-5)

    # perturb a future node (position 12) entirely
    d3 = data.at[0, 12].set((data[0, 12] + 1) % 9)
    out3 = np.asarray(model.apply(params, d3, pos))
    np.testing.assert_allclose(out3[0, :12], base[0, :12], atol=1e-5)


def tiny_ehem():
    return EHEM(
        self_depths=(2, 2),
        cross_depths=(1,),
        embed_dim=64,
        num_heads=2,
        window_size=16,
        mlp_ratio=2.0,
        knn_k=4,
    )


def make_ehem_inputs(rng, b=1, n=64, k=4):
    data = np.stack(
        [
            rng.integers(0, 19, (b, n, k)),  # level
            rng.integers(0, 9, (b, n, k)),  # octant
            rng.integers(0, 255, (b, n, k)),  # occ (0..254)
        ],
        axis=-1,
    ).astype(np.int32)
    pos = rng.random((b, n, 3), dtype=np.float32)
    return jnp.asarray(data), jnp.asarray(pos)


def test_ehem_shapes(rng):
    model = tiny_ehem()
    data, pos = make_ehem_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    out = model.apply(variables, data, pos)
    assert out.shape == (1, 64, 255)
    l1, l2 = model.apply(variables, data, pos, method=EHEM.encode_probs)
    assert l1.shape == (1, 32, 255) and l2.shape == (1, 32, 255)
    # interleaving consistency
    np.testing.assert_allclose(np.asarray(out)[0, ::2], np.asarray(l1)[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[0, 1::2], np.asarray(l2)[0], atol=1e-6)


def test_ehem_odd_length(rng):
    model = tiny_ehem()
    data, pos = make_ehem_inputs(rng, n=33)
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    out = model.apply(variables, data, pos)
    assert out.shape == (1, 33, 255)
    l1, l2 = model.apply(variables, data, pos, method=EHEM.encode_probs)
    assert l1.shape == (1, 17, 255) and l2.shape == (1, 16, 255)


def test_ehem_checkerboard_information_flow(rng):
    """Group-1 logits must not depend on ANY current-node occupancy;
    group-2 logits must depend on group-1 occupancies but not group-2's."""
    model = tiny_ehem()
    data, pos = make_ehem_inputs(rng, n=32)
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    l1, l2 = model.apply(variables, data, pos, method=EHEM.encode_probs)

    # perturb a group-2 node's own occupancy -> nothing changes
    d = data.at[0, 5, -1, 2].set((data[0, 5, -1, 2] + 7) % 255)
    m1, m2 = model.apply(variables, d, pos, method=EHEM.encode_probs)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(l1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(l2), atol=1e-6)

    # perturb a group-1 node's own occupancy -> only group 2 changes
    d = data.at[0, 4, -1, 2].set((data[0, 4, -1, 2] + 7) % 255)
    m1, m2 = model.apply(variables, d, pos, method=EHEM.encode_probs)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(l1), atol=1e-6)
    assert not np.allclose(np.asarray(m2), np.asarray(l2), atol=1e-6)


def test_ehem_decode_phases_match_encode(rng):
    """Two-phase decode with cached features == one-shot encode probs."""
    model = tiny_ehem()
    data, pos = make_ehem_inputs(rng, n=32)
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    l1, l2 = model.apply(variables, data, pos, method=EHEM.encode_probs)

    # decode-side: current occupancies unknown
    d_unk = data.at[:, :, -1, 2].set(255)
    p1, f1, f2 = model.apply(variables, d_unk, pos, method=EHEM.decode_phase1)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(l1), atol=1e-5)
    group1_occ = data[:, ::2, -1, 2]
    p2 = model.apply(
        variables, f1, f2, group1_occ, False, method=EHEM.decode_phase2
    )
    np.testing.assert_allclose(np.asarray(p2), np.asarray(l2), atol=1e-5)


def test_build_model_from_config():
    cfg = load_config("train_kitti_ehem.yaml", config_dir="configs")
    m = build_model(cfg)
    assert isinstance(m, EHEM)
    cfg2 = load_config("train_kitti.yaml", config_dir="configs")
    m2 = build_model(cfg2)
    assert isinstance(m2, OctAttention)
    assert cfg.data.context_size == 8192  # interpolation resolved


def test_fused_qkv_checkpoint_migration(rng):
    """Pre-fusion checkpoints (separate query/key/value Dense scopes) must
    migrate to the fused layout with BIT-identical kernels: a column-block
    concat of (C, C) kernels IS the (C, 3C) fused projection."""
    from scp_tpu.train.checkpoints import fuse_qkv_params

    model = tiny_ehem()
    data, pos = make_ehem_inputs(rng, n=32)
    variables = model.init(jax.random.PRNGKey(3), data, pos)
    ref1, ref2 = model.apply(variables, data, pos, method=EHEM.encode_probs)

    # render the fused tree back to the legacy layout, then migrate
    def unfuse(node, in_cross=False):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "qkv":
                kern = np.asarray(v["kernel"])
                q, kk, vv = np.split(kern, 3, axis=-1)
                for name, part in (("query", q), ("key", kk), ("value", vv)):
                    out[name] = {"kernel": part}
                if "bias" in v:
                    bq, bk, bv = np.split(np.asarray(v["bias"]), 3)
                    out["query"]["bias"] = bq
                    out["key"]["bias"] = bk
                    out["value"]["bias"] = bv
            elif k == "kv":
                kern = np.asarray(v["kernel"])
                kk, vv = np.split(kern, 2, axis=-1)
                out["key"] = {"kernel": kk}
                out["value"] = {"kernel": vv}
                if "bias" in v:
                    bk, bv = np.split(np.asarray(v["bias"]), 2)
                    out["key"]["bias"] = bk
                    out["value"]["bias"] = bv
            else:
                out[k] = unfuse(v, in_cross or k == "swin_cross")
        return out

    legacy = unfuse(jax.tree_util.tree_map(np.asarray, variables))
    migrated = fuse_qkv_params(legacy)
    m1, m2 = model.apply(migrated, data, pos, method=EHEM.encode_probs)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(ref1))
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(ref2))

    # warm-start guard: filter_compatible over the migrated tree must adopt
    # EVERY pretrained leaf (a missed migration silently keeps random init
    # for all attention projections — the exact bug fixed in load_pretrain's
    # orbax branch)
    from scp_tpu.train.checkpoints import filter_compatible

    fresh = jax.tree_util.tree_map(lambda x: np.zeros_like(x), variables)
    adopted = filter_compatible(migrated, fresh)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(adopted)[0],
        jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(np.asarray, variables)
        )[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), b, err_msg=str(pa))


def test_fuse_migration_leaves_octattention_alone(rng):
    """OctAttention's _QKV scope is {query, key, value} with NO proj; the
    Swin checkpoint migration must pass it through unchanged (regression:
    it used to fuse it into a qkv the model cannot find)."""
    from scp_tpu.train.checkpoints import fuse_qkv_params

    model = tiny_octattention()
    data = jnp.zeros((1, 8, 4, 3), jnp.int32)
    pos = jnp.zeros((1, 8, 4, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    tree = jax.tree_util.tree_map(np.asarray, variables)
    migrated = fuse_qkv_params(tree)
    flat_a = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(migrated)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)


def test_ehem_fused_multiscale_matches_concat(rng, monkeypatch):
    """The fused multiscale heads (per-stage kernel repartition,
    layers.MLP.multiscale) must equal the materialized-concat oracle
    (SCP_NO_MSFUSE=1) — same parameters, same function."""
    model = tiny_ehem()
    data, pos = make_ehem_inputs(rng, n=63)  # odd: exercises pad+truncate
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    fused = np.asarray(model.apply(variables, data, pos))
    monkeypatch.setenv("SCP_NO_MSFUSE", "1")
    oracle = np.asarray(model.apply(variables, data, pos))
    np.testing.assert_allclose(fused, oracle, atol=2e-4)


def test_edgeconv_bn_fold_matches_batchnorm(rng, monkeypatch):
    """Inference BatchNorm folded into the pre-gather affine must equal the
    explicit BatchNorm path, including after a simulated training update
    that moves the running stats away from init."""
    model = tiny_ehem()
    data, pos = make_ehem_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), data, pos)
    # move running stats off their (0, 1) init so the fold is non-trivial
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    folded = np.asarray(model.apply(variables, data, pos))
    monkeypatch.setenv("SCP_NO_BNFOLD", "1")
    oracle = np.asarray(model.apply(variables, data, pos))
    np.testing.assert_allclose(folded, oracle, atol=2e-4)


def test_onehot_embed_matches_gather(rng, monkeypatch):
    """The one-hot-matmul embedding lookup must be BIT-exact vs the row
    gather (exactly one nonzero per one-hot row: the f32-accumulated
    product is the table value itself), in f32 and bf16."""
    for dtype in (jnp.float32, jnp.bfloat16):
        model = tiny_ehem().clone(dtype=dtype)
        data, pos = make_ehem_inputs(rng, n=64)
        variables = model.init(jax.random.PRNGKey(0), data, pos)

        def geo(mdl, d, p):
            flat = d.reshape(d.shape[0], d.shape[1], -1)[:, :, :-1]
            return mdl.geo(flat, p, train=False)

        onehot = np.asarray(
            model.apply(variables, data, pos, method=geo), np.float32
        )
        monkeypatch.setenv("SCP_NO_ONEHOT_EMBED", "1")
        oracle = np.asarray(
            model.apply(variables, data, pos, method=geo), np.float32
        )
        monkeypatch.delenv("SCP_NO_ONEHOT_EMBED")
        np.testing.assert_array_equal(onehot, oracle)


def test_kmajor_max_matches_node_major(rng, monkeypatch):
    """max_over_neighbors (k-major gather, reduce over the leading axis)
    must be BIT-exact vs max(gather_neighbors(...), axis=2): each node
    reduces the same value multiset and max has no rounding — in f32 and
    bf16, including duplicate and self indices."""
    from scp_tpu.ops.knn import gather_neighbors, max_over_neighbors

    b, n, k = 3, 64, 7
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    idx = idx.at[:, :, 0].set(jnp.arange(n)[None, :])  # self + duplicates
    for dtype in (jnp.float32, jnp.bfloat16):
        feats = jnp.asarray(rng.standard_normal((b, n, 32)), dtype)
        fast = np.asarray(max_over_neighbors(feats, idx), np.float32)
        monkeypatch.setenv("SCP_NO_KMAJOR_MAX", "1")
        oracle = np.asarray(max_over_neighbors(feats, idx), np.float32)
        monkeypatch.delenv("SCP_NO_KMAJOR_MAX")
        np.testing.assert_array_equal(fast, oracle)
        np.testing.assert_array_equal(
            oracle, np.asarray(jnp.max(gather_neighbors(feats, idx), axis=2), np.float32)
        )
