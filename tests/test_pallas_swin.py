"""Fused Swin attention-sublayer kernel vs the plain-XLA reference and
vs the real SwinBlock1D path (interpret mode; chip A/B in scratch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scp_tpu.ops import pallas_swin


def _mk(rng, bn=3, w=128, c=128, heads=4, n_masks=1):
    x = jnp.asarray(rng.normal(0, 1, (bn, w, c)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1, 0.1, c), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, c), jnp.float32)
    rel = jnp.asarray(rng.normal(0, 0.2, (heads, w, w)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((n_masks, w, w)) < 0.1, -100.0, 0.0), jnp.float32
    )
    wp = jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.bfloat16)
    bp = jnp.asarray(rng.normal(0, 0.05, c), jnp.float32)
    return x, scale, bias, rel, mask, wp, bp


def test_self_matches_reference(rng):
    bn, w, c, h = 3, 128, 128, 4
    x, scale, bias, rel, mask, wp, bp = _mk(rng, bn, w, c, h, n_masks=2)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (c, 3 * c)), jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(0, 0.05, 3 * c), jnp.float32)
    want = pallas_swin._reference_self(
        x, scale, bias, wqkv, bqkv, rel, mask, wp, bp, h, 1e-5
    )
    got = pallas_swin._self_impl(
        x, scale, bias, wqkv, bqkv, rel, mask, wp, bp, h, 1e-5, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_cross_matches_reference(rng):
    bn, w, c, h = 2, 128, 128, 4
    x, scale, bias, rel, mask, wp, bp = _mk(rng, bn, w, c, h)
    qs = jnp.asarray(rng.normal(0, 1, (bn, w, c)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.bfloat16)
    bq = jnp.asarray(rng.normal(0, 0.05, c), jnp.float32)
    wkv = jnp.asarray(rng.normal(0, 0.05, (c, 2 * c)), jnp.bfloat16)
    bkv = jnp.asarray(rng.normal(0, 0.05, 2 * c), jnp.float32)
    want = pallas_swin._reference_cross(
        x, qs, scale, bias, wq, bq, wkv, bkv, rel, mask, wp, bp, h, 1e-5
    )
    got = pallas_swin._cross_impl(
        x, qs, scale, bias, wq, bq, wkv, bkv, rel, mask, wp, bp, h, 1e-5,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_reference_matches_swin_block(rng):
    """The kernel's XLA reference must equal the real SwinBlock1D
    attention sublayer (same params), shifted and unshifted — this pins
    the fused path's semantics to the model's."""
    from scp_tpu.models.swin1d import SwinBlock1D, SwinConfig, _shift_mask

    cfg = SwinConfig(embed_dim=64, depths=(2,), num_heads=2, window_size=32)
    b, n, c = 2, 96, 64
    x = jnp.asarray(rng.normal(0, 1, (b, n, c)), jnp.float32)
    for shift in (0, 16):
        block = SwinBlock1D(cfg, shift=shift, dtype=jnp.float32)
        variables = block.init(jax.random.PRNGKey(0), x)
        p = variables["params"]
        full = block.apply(variables, x)  # XLA path on CPU

        # rebuild via the kernel reference: attention sublayer + MLP
        ap, n1 = p["attn"], p["norm1"]
        w = cfg.window_size
        rel_idx = np.arange(w)[:, None] - np.arange(w)[None, :] + w - 1
        rel = ap["rel_pos_bias"][rel_idx].transpose(2, 0, 1)
        mask = (
            jnp.asarray(_shift_mask(n, w, shift))
            if shift
            else jnp.zeros((1, w, w), jnp.float32)
        )
        xw = (jnp.roll(x, -shift, axis=1) if shift else x).reshape(-1, w, c)
        out = pallas_swin._reference_self(
            xw, n1["scale"], n1["bias"],
            ap["qkv"]["kernel"], ap["qkv"]["bias"], rel, mask,
            ap["proj"]["kernel"], ap["proj"]["bias"], cfg.num_heads, 1e-5,
        ).reshape(b, n, c)
        if shift:
            out = jnp.roll(out, shift, axis=1)
        h = out
        n2 = p["norm2"]
        mu = jnp.mean(h, -1, keepdims=True)
        var = jnp.var(h, -1, keepdims=True)
        hn = (h - mu) * jax.lax.rsqrt(var + 1e-5) * n2["scale"] + n2["bias"]
        m = hn @ p["mlp1"]["kernel"] + p["mlp1"]["bias"]
        m = jax.nn.gelu(m, approximate=False)
        m = m @ p["mlp2"]["kernel"] + p["mlp2"]["bias"]
        want = h + m
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(want), atol=2e-4, rtol=2e-4
        )


def test_supported_gate():
    assert not pallas_swin.supported(512, 512, 256, 4)  # cpu backend


@pytest.mark.parametrize(
    "block,bn,n_masks",
    [
        (2, 4, 2),  # block % n_masks == 0 -> whole-table fetch
        (4, 8, 2),  # same, multiple mask cycles per block
        (2, 8, 4),  # block < n_masks, n_masks % block == 0 -> run fetch
        (4, 6, 2),  # 4 doesn't divide 6 -> degrades to 2
        (4, 3, 1),  # 4 doesn't divide 3 -> degrades to block 3
    ],
)
def test_self_blocked_matches_reference(rng, monkeypatch, block, bn, n_masks):
    """Multi-window blocking must be a pure schedule change: outputs equal
    the reference for every (block, window count, mask period) layout."""
    monkeypatch.setenv("SCP_ATTN_BLOCK", str(block))
    w, c, h = 128, 128, 4
    x, scale, bias, rel, mask, wp, bp = _mk(rng, bn, w, c, h, n_masks=n_masks)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (c, 3 * c)), jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(0, 0.05, 3 * c), jnp.float32)
    want = pallas_swin._reference_self(
        x, scale, bias, wqkv, bqkv, rel, mask, wp, bp, h, 1e-5
    )
    got = pallas_swin._self_impl(
        x, scale, bias, wqkv, bqkv, rel, mask, wp, bp, h, 1e-5, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


@pytest.mark.parametrize("block,bn,n_masks", [(2, 4, 2), (2, 8, 4)])
def test_cross_blocked_matches_reference(rng, monkeypatch, block, bn, n_masks):
    monkeypatch.setenv("SCP_ATTN_BLOCK", str(block))
    w, c, h = 128, 128, 4
    x, scale, bias, rel, mask, wp, bp = _mk(rng, bn, w, c, h, n_masks=n_masks)
    qs = jnp.asarray(rng.normal(0, 1, (bn, w, c)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(0, 0.05, (c, c)), jnp.bfloat16)
    bq = jnp.asarray(rng.normal(0, 0.05, c), jnp.float32)
    wkv = jnp.asarray(rng.normal(0, 0.05, (c, 2 * c)), jnp.bfloat16)
    bkv = jnp.asarray(rng.normal(0, 0.05, 2 * c), jnp.float32)
    want = pallas_swin._reference_cross(
        x, qs, scale, bias, wq, bq, wkv, bkv, rel, mask, wp, bp, h, 1e-5
    )
    got = pallas_swin._cross_impl(
        x, qs, scale, bias, wq, bq, wkv, bkv, rel, mask, wp, bp, h, 1e-5,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_pick_block_degrades(monkeypatch):
    monkeypatch.setenv("SCP_ATTN_BLOCK", "4")
    assert pallas_swin._pick_block(256, 1) == 4
    assert pallas_swin._pick_block(6, 2) == 2  # 4 doesn't divide 6
    assert pallas_swin._pick_block(3, 1) == 3  # any divisor works unmasked
    assert pallas_swin._pick_block(5, 2) == 1  # nothing aligns
    assert pallas_swin._pick_block(8, 4) == 4  # mask-period aligned


def test_mlp_tile_pick(monkeypatch):
    from scp_tpu.ops import pallas_mlp

    assert pallas_mlp._pick_tile(8192) == 1024  # round-5 A/B default
    assert pallas_mlp._pick_tile(512 * 3) == 512  # 1024 doesn't divide
    monkeypatch.setenv("SCP_MLP_TILE", "2048")
    assert pallas_mlp._pick_tile(8192) == 2048
    assert pallas_mlp._pick_tile(512 * 3) == 512  # 2048/1024 don't divide
