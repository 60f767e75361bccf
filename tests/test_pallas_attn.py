"""Fused window-attention kernel vs the XLA reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from scp_tpu.ops.pallas_attn import _fused_fwd_impl, _reference


def _rand(rng, shape):
    return jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))


def test_fused_matches_reference_with_mask():
    rng = np.random.default_rng(0)
    bn, h, w, hd = 6, 2, 128, 32  # bn = 2 batches x 3 windows
    q, k, v = (_rand(rng, (bn, h, w, hd)) for _ in range(3))
    bias = _rand(rng, (h, w, w))
    mask = jnp.asarray(
        np.where(rng.random((3, w, w)) > 0.8, -100.0, 0.0).astype(np.float32)
    )
    out = _fused_fwd_impl(q, k, v, bias, mask, 0.125, interpret=True)
    ref = _reference(q, k, v, bias, mask, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_matches_reference_no_mask_bf16():
    rng = np.random.default_rng(1)
    bn, h, w, hd = 4, 4, 128, 64
    q, k, v = (
        _rand(rng, (bn, h, w, hd)).astype(jnp.bfloat16) for _ in range(3)
    )
    bias = _rand(rng, (h, w, w))
    mask = jnp.zeros((1, w, w), jnp.float32)
    out = _fused_fwd_impl(q, k, v, bias, mask, 0.125, interpret=True)
    ref = _reference(q, k, v, bias, mask, 0.125)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_fused_backward_runs():
    import jax

    from scp_tpu.ops import pallas_attn

    rng = np.random.default_rng(2)
    bn, h, w, hd = 2, 2, 128, 32
    q, k, v = (_rand(rng, (bn, h, w, hd)) for _ in range(3))
    bias = _rand(rng, (h, w, w))
    mask = jnp.zeros((1, w, w), jnp.float32)

    orig = pallas_attn._fused_fwd_impl
    pallas_attn._fused_fwd_impl = lambda *a, **k2: orig(*a, interpret=True)
    try:
        def loss(q):
            return jnp.sum(
                pallas_attn.window_attention_fused(q, k, v, bias, mask, 0.125)
                .astype(jnp.float32) ** 2
            )

        g = jax.grad(loss)(q)
        g_ref = jax.grad(
            lambda q: jnp.sum(_reference(q, k, v, bias, mask, 0.125) ** 2)
        )(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)
    finally:
        pallas_attn._fused_fwd_impl = orig


def test_window_attention_module_pallas_branch_matches_xla(monkeypatch):
    """WindowAttention1D's pallas branch (kernel in interpret mode) must
    equal its XLA branch — guards the head-layout plumbing between the
    transpose-free einsum path and the kernel's (B*nW, H, W, hd) layout."""
    import jax

    from scp_tpu.models.swin1d import SwinConfig, SwinEncoder1D
    from scp_tpu.ops import pallas_attn

    cfg = SwinConfig(embed_dim=32, depths=(2,), num_heads=2, window_size=128)
    enc = SwinEncoder1D(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 256, 32)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), x)
    ref = enc.apply(v, x)

    orig = pallas_attn._fused_fwd_impl
    monkeypatch.setattr(pallas_attn, "supported", lambda w, hd: True)
    monkeypatch.setattr(
        pallas_attn, "_fused_fwd_impl",
        lambda *a, **kw: orig(*a, interpret=True),
    )
    monkeypatch.setenv("SCP_PALLAS_ATTN", "1")
    out = enc.apply(v, x)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
