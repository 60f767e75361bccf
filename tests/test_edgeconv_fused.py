"""Fused train-mode EdgeConv (ops/edgeconv_fused.py) vs the explicit path.

The fused op must reproduce the explicit gather+BN+leaky+max forward
(values AND batch statistics) and match the gradients of the
stop-grad-stats oracle it is specified against (its one declared
divergence from the reference backward — see the op docstring).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scp_tpu.ops.edgeconv_fused import edgeconv_train_fused

EPS, SLOPE = 1e-5, 0.2


def _explicit(a, bc, scale, bias, idx, stop_stats):
    """Reference train-mode EdgeConv math (dgcnn.py explicit branch)."""
    b, n, f = a.shape
    k = idx.shape[-1]
    flat = a.reshape(b * n, f)
    base = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    g = jnp.take(flat, (idx + base).reshape(-1), axis=0)
    h = g.reshape(b, n, k, f) + bc[:, :, None, :]  # (B, N, k, F)
    h = h.astype(jnp.float32)  # BN runs in f32 (dgcnn.py dtype=jnp.float32)
    mean = jnp.mean(h, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(h), axis=(0, 1, 2)) - jnp.square(mean)
    if stop_stats:
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
    y = scale * (h - mean) / jnp.sqrt(var + EPS) + bias
    y = jnp.where(y > 0, y, SLOPE * y)
    return jnp.max(y, axis=2), mean, var


def _inputs(seed=0, b=2, n=64, f=16, k=5, neg_scale=True):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((b, n, f)).astype(np.float32)
    bc = rng.standard_normal((b, n, f)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, f).astype(np.float32)
    if neg_scale:  # exercise the min/argmin selection branch
        scale[::3] *= -1.0
    bias = rng.standard_normal(f).astype(np.float32)
    idx = rng.integers(0, n, (b, n, k)).astype(np.int32)
    return a, bc, scale, bias, idx


def test_forward_matches_explicit():
    a, bc, scale, bias, idx = _inputs()
    out, mean, var = edgeconv_train_fused(a, bc, scale, bias, idx)
    ref, mref, vref = _explicit(a, bc, scale, bias, idx, stop_stats=False)
    np.testing.assert_allclose(mean, mref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var, vref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_grads_match_stopgrad_oracle():
    a, bc, scale, bias, idx = _inputs(seed=1)
    w = np.random.default_rng(9).standard_normal(a.shape).astype(np.float32)

    def loss_fused(a_, bc_, s_, b_):
        out, _, _ = edgeconv_train_fused(a_, bc_, s_, b_, idx)
        return jnp.sum(out * w)

    def loss_oracle(a_, bc_, s_, b_):
        out, _, _ = _explicit(a_, bc_, s_, b_, idx, stop_stats=True)
        return jnp.sum(out * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(a, bc, scale, bias)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(a, bc, scale, bias)
    for got, ref, name in zip(gf, go, ["a", "bc", "scale", "bias"]):
        np.testing.assert_allclose(
            got, ref, rtol=1e-4, atol=1e-5, err_msg=f"grad wrt {name}"
        )


def test_grad_routes_to_argmax_winners_only():
    # one batch row, identity-ish graph: each center's neighbors are known,
    # so da must land exactly on the winning rows
    a, bc, scale, bias, idx = _inputs(seed=2, b=1, n=8, f=4, k=3,
                                      neg_scale=False)

    def loss(a_):
        out, _, _ = edgeconv_train_fused(a_, bc, scale, bias, idx)
        return jnp.sum(out)

    da = np.asarray(jax.grad(loss)(a))

    # the analytic da must match the oracle's analytic da
    def loss_oracle(a_):
        out, _, _ = _explicit(a_, bc, scale, bias, idx, stop_stats=True)
        return jnp.sum(out)

    do = np.asarray(jax.grad(loss_oracle)(a))
    np.testing.assert_allclose(da, do, rtol=1e-4, atol=1e-5)


def test_edgeconv_module_fused_matches_explicit(monkeypatch):
    from scp_tpu.models.dgcnn import EdgeConv

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 64, 8)).astype(np.float32)
    idx = rng.integers(0, 64, (2, 64, 5)).astype(np.int32)
    conv = EdgeConv(features=16, dtype=jnp.float32)
    variables = conv.init(jax.random.PRNGKey(0), feats, idx, True)
    # perturb BN params away from identity so the fold is exercised
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    p = variables["params"]["bn"]
    p["scale"] = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    p["bias"] = jnp.asarray(rng.standard_normal(16).astype(np.float32))

    monkeypatch.setenv("SCP_FUSED_EDGECONV", "0")  # explicit oracle arm
    ref, refvars = conv.apply(
        variables, feats, idx, True, mutable=["batch_stats"]
    )
    monkeypatch.setenv("SCP_FUSED_EDGECONV", "1")
    got, gotvars = conv.apply(
        variables, feats, idx, True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # running-stat updates agree (the 2-sample update trick)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            gotvars["batch_stats"]["bn"][key],
            refvars["batch_stats"]["bn"][key],
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"batch_stats {key}",
        )


def test_bf16_smoke():
    a, bc, scale, bias, idx = _inputs(seed=4)
    out, mean, var = edgeconv_train_fused(
        a.astype(jnp.bfloat16), bc.astype(jnp.bfloat16), scale, bias, idx
    )
    ref, _, _ = _explicit(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(bc, jnp.bfloat16),
        scale, bias, idx, stop_stats=False,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
