"""Orbax checkpointing + partial warm-start.

Replaces Lightning's ModelCheckpoint / load_from_checkpoint (reference
train.py:50, encode.py:254) and the shape-filtered `load_pretrain`
(reference ehem.py:212-222).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(run_dir: str) -> str:
    return os.path.abspath(os.path.join(run_dir, "ckpt"))


def save(run_dir: str, state, constants, epoch: int, step: int, final: bool = False):
    path = os.path.join(_ckpt_dir(run_dir), f"epoch={epoch}-step={step}")
    if os.path.exists(path):
        return path
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats) or {},
        "constants": jax.device_get(constants) or {},
        # full optimizer state -> true mid-training resume (the reference
        # left this unwired, train.py:26)
        "opt_state": jax.device_get(state.opt_state) or {},
        "meta": {"epoch": epoch, "step": step},
    }
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, payload)
    if final:
        latest = os.path.join(_ckpt_dir(run_dir), "latest.txt")
        with open(latest, "w") as f:
            f.write(os.path.basename(path))
    return path


def latest_checkpoint(run_dir: str) -> str | None:
    d = _ckpt_dir(run_dir)
    if not os.path.isdir(d):
        return None
    # a killed run can leave an incomplete "<name>.orbax-checkpoint-tmp"
    # dir behind; only complete checkpoints (integer step suffix) count
    names = [
        n for n in os.listdir(d)
        if n.startswith("epoch=") and n.split("step=")[-1].isdigit()
    ]
    if not names:
        return None

    def key(n):
        return int(n.split("step=")[-1])

    return os.path.join(d, max(names, key=key))


def load(path: str) -> dict:
    with ocp.StandardCheckpointer() as loader:
        return loader.restore(os.path.abspath(path))


def load_variables(path: str) -> dict:
    """Checkpoint -> flax variables dict for model.apply."""
    payload = load(path)
    variables = {"params": fuse_qkv_params(payload["params"])}
    if payload.get("batch_stats"):
        variables["batch_stats"] = payload["batch_stats"]
    if payload.get("constants"):
        variables.update(payload["constants"])
    return variables


def restore_state(path: str, template_state):
    """Restore a full TrainState (params + batch_stats + opt_state + step)
    into the structure of `template_state`."""
    import dataclasses

    payload = load(path)
    meta = payload.get("meta", {})
    step = int(meta.get("step", 0))
    new = dataclasses.replace(
        template_state,
        params=fuse_qkv_params(payload["params"]),
        batch_stats=payload.get("batch_stats") or template_state.batch_stats,
        opt_state=_restore_like(template_state.opt_state, payload.get("opt_state")),
        step=np.asarray(step, np.int32),
    )
    return new, meta


def _restore_like(template: Any, saved: Any) -> Any:
    """Rebuild `template`'s pytree structure (e.g. optax NamedTuples) from a
    checkpoint's plain-dict rendering of it."""
    if saved is None or saved == {}:
        return template
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    s_leaves = jax.tree_util.tree_leaves(saved)
    if len(t_leaves) != len(s_leaves):
        return template  # structure changed; keep fresh optimizer state
    return jax.tree_util.tree_unflatten(treedef, s_leaves)


def save_params_npz(path: str, params: Any) -> None:
    """Flatten a variables pytree (params [+ batch_stats]) into one
    compressed .npz (float16 leaves) — a compact, git-committable
    distribution format for bench checkpoints.  Encoder and decoder both
    load the SAME rounded values, so the half-precision storage cannot
    desynchronize the codec."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = {}
    for kp, v in leaves:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        v = np.asarray(v)
        flat[key] = v.astype(np.float16) if v.dtype.kind == "f" else v
    np.savez_compressed(path, **flat)


def load_params_npz(path: str) -> dict:
    """Inverse of save_params_npz; float leaves come back as float32."""
    z = np.load(path)
    params: dict = {}
    for key in z.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        v = z[key]
        node[parts[-1]] = v.astype(np.float32) if v.dtype.kind == "f" else v
    return fuse_qkv_params(params)


def fuse_qkv_params(tree: Any) -> Any:
    """Migrate pre-fusion Swin attention params in place of load.

    WindowAttention1D now projects with one fused Dense (self: q|k|v;
    cross: q separate, k|v fused).  Checkpoints written before the fusion
    carry separate query/key/value Dense scopes; concatenating their
    kernels/biases along the output axis reproduces the fused projection
    EXACTLY (a (C, C) x3 column-block concat is the (C, 3C) matmul).
    Scopes under a `swin_cross` subtree keep `query` and get `kv`."""

    def walk(node, in_cross):
        if not isinstance(node, dict):
            return node
        # Only pre-fusion WindowAttention1D scopes qualify: they always
        # carry the output projection `proj` alongside query/key/value.
        # OctAttention's _QKV scope is {query, key, value} ONLY and must
        # stay separate (its model splits the heads itself).
        if {"query", "key", "value", "proj"} <= set(node):

            def cat(names):
                parts = [node[n] for n in names]
                out = {
                    "kernel": np.concatenate(
                        [np.asarray(p["kernel"]) for p in parts], axis=-1
                    )
                }
                if all("bias" in p for p in parts):
                    out["bias"] = np.concatenate(
                        [np.asarray(p["bias"]) for p in parts], axis=-1
                    )
                return out

            rest = {
                k: walk(v, in_cross)
                for k, v in node.items()
                if k not in ("query", "key", "value")
            }
            if in_cross:
                return {**rest, "query": node["query"], "kv": cat(["key", "value"])}
            return {**rest, "qkv": cat(["query", "key", "value"])}
        return {
            k: walk(v, in_cross or k == "swin_cross") for k, v in node.items()
        }

    return walk(tree, False)


def filter_compatible(pretrained: Any, reference: Any) -> Any:
    """Keep only leaves whose path+shape match the reference tree
    (the reference's partial-checkpoint warm start, ehem.py:212-222)."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    flat_r, treedef = jax.tree_util.tree_flatten_with_path(reference)
    out = []
    for path, ref_leaf in flat_r:
        leaf = flat_p.get(path)
        if leaf is not None and np.shape(leaf) == np.shape(ref_leaf):
            out.append(leaf)
        else:
            out.append(ref_leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
