"""Decompose the self-Swin encoder's device time by component.

Each candidate runs as a CHAIN of dependent jit calls (output feeds the
next input, same shape) with ONE single-element fetch at the end, so the
~25 ms tunnel latency is paid once per measurement and the per-call cost
is (t - latency) / n_chain.  Random params — timing does not depend on
weight values.

    python scratch/prof_swin_parts.py
"""

from __future__ import annotations

import functools
import json
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

CHAIN = 6


def _med(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from scp_tpu.models.swin1d import (
        SwinBlock1D,
        SwinConfig,
        WindowAttention1D,
    )

    lanes, n, c = int(os.environ.get("LANES", 16)), 8192, 256
    cfg = SwinConfig()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    x0 = jax.device_put(
        rng.standard_normal((lanes, n, c)).astype(np.float32)
    ).astype(jnp.bfloat16)

    results = {}

    def bench(tag, module, x, chain=CHAIN, latency=None):
        v = module.init(key, x)

        def chained(v, x):
            for _ in range(chain):
                x = module.apply(v, x)
                if isinstance(x, (list, tuple)):
                    x = x[-1] if x[-1].shape == x[0].shape else x[0]
                x = x.astype(jnp.bfloat16)
            return x

        jfn = jax.jit(chained)
        np.asarray(jfn(v, x).ravel()[0])
        np.asarray(jfn(v, x).ravel()[0])
        t = _med(lambda: np.asarray(jfn(v, x).ravel()[0]))
        per = (t - (latency or 0.0)) / chain
        results[tag] = {
            "s_total": round(t, 4),
            "ms_per_call": round(per * 1e3, 2),
        }
        print(tag, json.dumps(results[tag]), flush=True)
        return t

    # latency floor: a trivial chained elementwise program
    class Noop(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x + jnp.asarray(1.0, x.dtype)

    lat = bench("latency_floor", Noop(), x0, chain=CHAIN)
    results["latency_floor"]["ms_per_call"] = 0.0

    # one block at stage-0 shape (no shift / with shift)
    blk0 = SwinBlock1D(cfg, shift=0, dtype=jnp.bfloat16)
    bench("block_noshift", blk0, x0, latency=lat)
    blk1 = SwinBlock1D(cfg, shift=cfg.window_size // 2, dtype=jnp.bfloat16)
    bench("block_shift", blk1, x0, latency=lat)

    # attention sublayer only (norm1 + windows + attn + residual)
    class AttnOnly(nn.Module):
        shift: int = 0

        @nn.compact
        def __call__(self, x):
            b, nn_, c_ = x.shape
            w = cfg.window_size
            from scp_tpu.models.swin1d import _shift_mask

            norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
            t = norm1(x).astype(jnp.bfloat16)
            if self.shift:
                t = jnp.roll(t, -self.shift, axis=1)
            t = t.reshape(b, nn_ // w, w, c_)
            mask = (
                jnp.asarray(_shift_mask(nn_, w, self.shift))
                if self.shift
                else None
            )
            out = WindowAttention1D(
                c_, cfg.num_heads, w, True, cross=False, dtype=jnp.bfloat16
            )(t, mask=mask)
            out = out.reshape(b, nn_, c_)
            if self.shift:
                out = jnp.roll(out, self.shift, axis=1)
            return x + out

    bench("attn_sublayer", AttnOnly(), x0, latency=lat)
    bench("attn_sublayer_shift", AttnOnly(shift=cfg.window_size // 2), x0, latency=lat)

    # MLP sublayer only (norm2 + mlp + residual)
    class MlpOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x)
            h = nn.Dense(int(cfg.mlp_ratio * c), dtype=jnp.bfloat16)(
                h.astype(jnp.bfloat16)
            )
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(c, dtype=jnp.bfloat16)(h)
            return x + h

    bench("mlp_sublayer", MlpOnly(), x0, latency=lat)

    # raw attention math at window shape, current layout vs head-major
    class AttnCore(nn.Module):
        layout: str = "interior"  # or "headmajor" / "merged"

        @nn.compact
        def __call__(self, x):
            b, nn_, c_ = x.shape
            w = cfg.window_size
            h = cfg.num_heads
            hd = c_ // h
            t = x.reshape(b, nn_ // w, w, c_)
            # dummy rel-pos bias: same add the real WindowAttention1D pays
            bias = self.param(
                "bias", nn.initializers.zeros, (h, w, w), jnp.float32
            )
            qkv = nn.Dense(3 * c_, dtype=jnp.bfloat16)(t)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            nw = nn_ // w
            if self.layout == "interior":
                q = q.reshape(b, nw, w, h, hd)
                k = k.reshape(b, nw, w, h, hd)
                v = v.reshape(b, nw, w, h, hd)
                s = jnp.einsum(
                    "bnqhd,bnkhd->bnhqk", q, k,
                    preferred_element_type=jnp.bfloat16,
                ) * jnp.asarray(hd ** -0.5, jnp.bfloat16)
                s = s + bias[None, None].astype(jnp.bfloat16)
                m = jax.lax.stop_gradient(jnp.max(s, -1, keepdims=True))
                e = jnp.exp((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
                a = e / jnp.sum(e.astype(jnp.float32), -1, keepdims=True).astype(
                    jnp.bfloat16
                )
                o = jnp.einsum("bnhqk,bnkhd->bnqhd", a, v)
                o = o.reshape(b, nn_, c_)
            else:
                def hm(t_):
                    return (
                        t_.reshape(b, nw, w, h, hd)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(b * nw * h, w, hd)
                    )

                q, k, v = hm(q), hm(k), hm(v)
                s = jnp.einsum(
                    "zqd,zkd->zqk", q, k, preferred_element_type=jnp.bfloat16
                ) * jnp.asarray(hd ** -0.5, jnp.bfloat16)
                s = s.reshape(b * nw, h, w, w) + bias[None].astype(jnp.bfloat16)
                s = s.reshape(b * nw * h, w, w)
                m = jax.lax.stop_gradient(jnp.max(s, -1, keepdims=True))
                e = jnp.exp((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
                a = e / jnp.sum(e.astype(jnp.float32), -1, keepdims=True).astype(
                    jnp.bfloat16
                )
                o = jnp.einsum("zqk,zkd->zqd", a, v)
                o = (
                    o.reshape(b, nw, h, w, hd)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(b, nn_, c_)
                )
            return nn.Dense(c_, dtype=jnp.bfloat16)(o)

    bench("attn_core_interior", AttnCore(), x0, latency=lat)
    bench("attn_core_headmajor", AttnCore(layout="headmajor"), x0, latency=lat)

    # LayerNorm f32 vs bf16-compute
    class LN(nn.Module):
        f32: bool = True

        @nn.compact
        def __call__(self, x):
            dt = jnp.float32 if self.f32 else jnp.bfloat16
            return nn.LayerNorm(epsilon=1e-5, dtype=dt)(x).astype(jnp.bfloat16)

    bench("ln_f32", LN(True), x0, chain=16, latency=lat)
    bench("ln_bf16", LN(False), x0, chain=16, latency=lat)

    print(json.dumps({"lanes": lanes, "latency_s": round(lat, 4), **results}))


if __name__ == "__main__":
    main()
