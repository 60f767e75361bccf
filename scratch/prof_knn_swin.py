"""Bisect KNN cost (einsum vs top-k, dtypes, recall) + Swin score dtype."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

rng = np.random.default_rng(0)
B, N, C, K = 8, 8192, 192, 20
feats = jax.device_put(rng.random((B, N, C), np.float32))


def timed(name, fn, *args, n=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:36s} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms", flush=True)


@jax.jit
def scores_only_f32(x):
    x = x.astype(jnp.bfloat16)
    s = jnp.einsum("bnc,bmc->bnm", x, x, preferred_element_type=jnp.float32)
    return jnp.sum(s) * 1e-9


@jax.jit
def scores_topk_f32(x):
    xb = x.astype(jnp.bfloat16)
    sq = jnp.sum(xb.astype(jnp.float32) * xb.astype(jnp.float32), -1)
    s = 2.0 * jnp.einsum("bnc,bmc->bnm", xb, xb, preferred_element_type=jnp.float32)
    s = s - sq[:, :, None] - sq[:, None, :]
    idx = jax.lax.approx_max_k(s, K)[1]
    return jnp.sum(idx.astype(jnp.float32)) * 1e-9


@jax.jit
def scores_topk_bf16(x):
    xb = x.astype(jnp.bfloat16)
    sq = jnp.sum(xb * xb, -1)
    s = 2.0 * jnp.einsum("bnc,bmc->bnm", xb, xb, preferred_element_type=jnp.bfloat16)
    s = s - sq[:, :, None] - sq[:, None, :]
    idx = jax.lax.approx_max_k(s, K)[1]
    return jnp.sum(idx.astype(jnp.float32)) * 1e-9


@jax.jit
def topk_recall07(x):
    xb = x.astype(jnp.bfloat16)
    sq = jnp.sum(xb.astype(jnp.float32) * xb.astype(jnp.float32), -1)
    s = 2.0 * jnp.einsum("bnc,bmc->bnm", xb, xb, preferred_element_type=jnp.float32)
    s = s - sq[:, :, None] - sq[:, None, :]
    idx = jax.lax.approx_max_k(s, K, recall_target=0.7)[1]
    return jnp.sum(idx.astype(jnp.float32)) * 1e-9


timed("einsum only (f32 out)", scores_only_f32, feats)
timed("knn f32 scores + approx_max_k", scores_topk_f32, feats)
timed("knn bf16 scores + approx_max_k", scores_topk_bf16, feats)
timed("knn f32 scores + recall 0.7", topk_recall07, feats)

# Swin block: f32 vs bf16 score materialization
H, W, HD = 4, 512, 64
nW = N // W
q = jax.device_put(rng.random((B, nW, H, W, HD), np.float32).astype(np.float32))


@jax.jit
def attn_f32(q):
    qb = q.astype(jnp.bfloat16)
    s = jnp.einsum("bnhqd,bnhkd->bnhqk", qb, qb, preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bnhqk,bnhkd->bnhqd", a, qb)
    return jnp.sum(o.astype(jnp.float32)) * 1e-9


@jax.jit
def attn_bf16(q):
    qb = q.astype(jnp.bfloat16)
    s = jnp.einsum("bnhqd,bnhkd->bnhqk", qb, qb, preferred_element_type=jnp.bfloat16)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m).astype(jnp.bfloat16))
    a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    o = jnp.einsum("bnhqk,bnhkd->bnhqd", a, qb)
    return jnp.sum(o.astype(jnp.float32)) * 1e-9


timed("window attn f32 scores (1 block eq)", attn_f32, q)
timed("window attn bf16 scores", attn_bf16, q)
