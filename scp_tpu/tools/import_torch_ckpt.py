"""Torch -> Flax weight importer for reference SCP checkpoints.

The reference publishes trained torch/Lightning checkpoints
(reference README.md:90, loaded by models/ehem.py:212-222).  This tool
maps a reference state_dict onto scp_tpu's Flax variable tree so those
checkpoints run under this framework:

    python -m scp_tpu.tools.import_torch_ckpt \
        --ckpt epoch=7-step=xxxx.ckpt --model ehem --out ehem_ref.npz

The .npz loads through train.checkpoints.load_params_npz (the bench/CLI
loader).  Mapping is pure key/layout rewriting — torch Linear weights
(out, in) transpose to Flax kernels (in, out), Conv2d 1x1 kernels
(F, C, 1, 1) become (C, F) Dense kernels, LayerNorm weight becomes
scale, BatchNorm running stats land in batch_stats — no numerics.
Separate Swin query/key/value projections are emitted in the pre-fusion
layout and fused by checkpoints.fuse_qkv_params (bit-exact column-block
concat), the same migration path as old Flax checkpoints.

Logit-level parity of the transplant is certified by
tests/test_torch_import.py: a RANDOM-init reference torch model is
exported, imported, and both forwards compared on shared inputs.
"""

from __future__ import annotations

import argparse
import re

import numpy as np

# torch buffers with no Flax counterpart (recomputed or baked into code)
_SKIP = (
    "num_batches_tracked",
    "relative_position_index",  # recomputed (swin1d.py rel_idx)
    "position_enc.pe",  # sinusoidal table, recomputed
    "criterion",
)
_SKIP_EXACT = ("mask",)  # OctAttention causal-mask buffer


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _id(w):
    return np.asarray(w)


def _conv1x1(w):
    return np.ascontiguousarray(np.asarray(w)[:, :, 0, 0].T)


def _seq(i: str) -> str:
    """nn.Sequential Linear index (0, 2, 4) -> MLP dense index."""
    return f"dense_{int(i) // 2}"


_WB = {"weight": "kernel", "bias": "bias"}
_LN = {"weight": "scale", "bias": "bias"}

_EHEM_RULES = [
    (
        r"geo_feat_generator\.conv(\d)\.0\.weight",
        lambda m: f"params/geo/conv{m[1]}/conv/kernel",
        _conv1x1,
    ),
    (
        r"geo_feat_generator\.conv(\d)\.1\.(weight|bias)",
        lambda m: f"params/geo/conv{m[1]}/bn/{_LN[m[2]]}",
        _id,
    ),
    (
        r"geo_feat_generator\.conv(\d)\.1\.running_(mean|var)",
        lambda m: f"batch_stats/geo/conv{m[1]}/bn/{m[2]}",
        _id,
    ),
    (
        r"geo_feat_generator\.(occ|level|octant)_enc\.weight",
        lambda m: f"params/geo/{m[1]}_enc/embedding",
        _id,
    ),
    (
        r"geo_feat_generator\.(mlp2|mlp3|edge_mlp1|edge_mlp2)\.(\d)\.(weight|bias)",
        lambda m: f"params/geo/{m[1]}/{_seq(m[2])}/{_WB[m[3]]}",
        None,
    ),
    (
        r"(ancient_mlp|prob_pred_mlp1|prob_pred_mlp2|pre_occ_mlp|pre_attn_mlp)"
        r"\.(\d)\.(weight|bias)",
        lambda m: f"params/{m[1]}/{_seq(m[2])}/{_WB[m[3]]}",
        None,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.blocks\.(\d+)\."
        r"layernorm_(before|after)\.(weight|bias)",
        lambda m: (
            f"params/swin_{m[1]}/stage_{m[2]}/block_{m[3]}/"
            f"norm{'1' if m[4] == 'before' else '2'}/{_LN[m[5]]}"
        ),
        _id,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.blocks\.(\d+)\."
        r"attention\.self\.(query|key|value)\.(weight|bias)",
        lambda m: (
            f"params/swin_{m[1]}/stage_{m[2]}/block_{m[3]}/attn/{m[4]}/{_WB[m[5]]}"
        ),
        None,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.blocks\.(\d+)\."
        r"attention\.self\.relative_position_bias_table",
        lambda m: f"params/swin_{m[1]}/stage_{m[2]}/block_{m[3]}/attn/rel_pos_bias",
        _id,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.blocks\.(\d+)\."
        r"attention\.output\.dense\.(weight|bias)",
        lambda m: f"params/swin_{m[1]}/stage_{m[2]}/block_{m[3]}/attn/proj/{_WB[m[4]]}",
        None,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.blocks\.(\d+)\."
        r"intermediate\.dense\.(weight|bias)",
        lambda m: f"params/swin_{m[1]}/stage_{m[2]}/block_{m[3]}/mlp1/{_WB[m[4]]}",
        None,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.blocks\.(\d+)\."
        r"output\.dense\.(weight|bias)",
        lambda m: f"params/swin_{m[1]}/stage_{m[2]}/block_{m[3]}/mlp2/{_WB[m[4]]}",
        None,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.downsample\."
        r"reduction\.weight",
        lambda m: f"params/swin_{m[1]}/stage_{m[2]}/merge/reduce/kernel",
        _t,
    ),
    (
        r"swin_(self|cross)_transformer\.layers\.(\d+)\.downsample\."
        r"norm\.(weight|bias)",
        lambda m: f"params/swin_{m[1]}/stage_{m[2]}/merge/norm/{_LN[m[3]]}",
        _id,
    ),
]

_OCTATTN_RULES = [
    (
        r"transformer_encoder\.layers\.(\d+)\.attn\.mlp_(query|key|value)"
        r"\.(weight|bias)",
        lambda m: f"params/layer_{m[1]}/attn/{m[2]}/{_WB[m[3]]}",
        None,
    ),
    (
        r"transformer_encoder\.layers\.(\d+)\.linear([12])\.(weight|bias)",
        lambda m: f"params/layer_{m[1]}/ffn{m[2]}/{_WB[m[3]]}",
        None,
    ),
    (
        r"transformer_encoder\.layers\.(\d+)\.norm([12])\.(weight|bias)",
        lambda m: f"params/layer_{m[1]}/norm{m[2]}/{_LN[m[3]]}",
        _id,
    ),
    (
        r"(occ|level|octant)_enc\.weight",
        lambda m: f"params/{m[1]}_enc/embedding",
        _id,
    ),
    (
        r"(abs_pos_enc|decoder0|decoder1)\.(weight|bias)",
        lambda m: f"params/{m[1]}/{_WB[m[2]]}",
        None,
    ),
]


def _apply_rules(sd: dict, rules) -> dict:
    """state_dict (str -> array-like) -> flat {"params/...": np.ndarray}."""
    flat: dict[str, np.ndarray] = {}
    unmatched = []
    for key, val in sd.items():
        if any(s in key for s in _SKIP) or key in _SKIP_EXACT:
            continue
        for pat, dst, xf in rules:
            m = re.fullmatch(pat, key)
            if m:
                if xf is None:  # Linear: weight transposes, bias passes
                    xf = _t if key.endswith("weight") else _id
                flat[dst(m)] = np.asarray(xf(val), np.float32)
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise ValueError(f"unmapped reference keys: {unmatched[:8]}"
                         f"{' ...' if len(unmatched) > 8 else ''}")
    return flat


def _to_tree(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def import_state_dict(sd: dict, model: str = "ehem") -> dict:
    """Reference state_dict -> Flax variables {params[, batch_stats]}.

    Swin q/k/v projections come back FUSED (WindowAttention1D layout) via
    the same exact migration old Flax checkpoints use."""
    from scp_tpu.train.checkpoints import fuse_qkv_params

    rules = {"ehem": _EHEM_RULES, "octattention": _OCTATTN_RULES}[model]
    tree = _to_tree(_apply_rules(sd, rules))
    return fuse_qkv_params(tree) if model == "ehem" else tree


def verify_tree(variables: dict, model_name: str, model_kwargs=None) -> None:
    """Assert the imported tree matches the target model's variable
    structure exactly (paths AND shapes) — the transplant guard."""
    import jax
    import jax.numpy as jnp

    kw = model_kwargs or {}
    if model_name == "ehem":
        from scp_tpu.models.ehem import EHEM

        m = EHEM(**kw)
        args = (
            jnp.zeros((1, 16, 4, 3), jnp.int32),
            jnp.zeros((1, 16, 3), jnp.float32),
        )
    else:
        from scp_tpu.models.octattention import OctAttention

        m = OctAttention(**kw)
        args = (
            jnp.zeros((1, 8, 4, 3), jnp.int32),
            jnp.zeros((1, 8, 4, 3), jnp.float32),
        )
    want = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), *args))

    def flatten(t):
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp): tuple(v.shape)
            for kp, v in jax.tree_util.tree_flatten_with_path(t)[0]
        }

    got_s, want_s = flatten(variables), flatten(want)
    missing = sorted(set(want_s) - set(got_s))
    extra = sorted(set(got_s) - set(want_s))
    bad = sorted(
        k for k in set(got_s) & set(want_s) if got_s[k] != want_s[k]
    )
    if missing or extra or bad:
        raise ValueError(
            f"import mismatch: missing={missing[:5]} extra={extra[:5]} "
            f"shape={[(k, got_s[k], want_s[k]) for k in bad[:5]]}"
        )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .ckpt/.pt file")
    ap.add_argument("--model", choices=["ehem", "octattention"], default="ehem")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--no_verify", action="store_true",
                    help="skip the structure check (non-default model dims)")
    ap.add_argument("--trust_pickle", action="store_true",
                    help="allow full (unsafe) unpickling for checkpoints that "
                    "weights_only=True cannot load.  Published checkpoints are "
                    "untrusted public content: full unpickling executes "
                    "arbitrary code from the file — only pass this for "
                    "checkpoints you produced yourself.")
    args = ap.parse_args(argv)

    import torch

    try:
        blob = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    except Exception as e:  # Lightning metadata outside the safe allowlist
        if not args.trust_pickle:
            raise SystemExit(
                f"weights_only=True load failed ({type(e).__name__}: {e}).\n"
                "Re-run with --trust_pickle ONLY if you trust this file: "
                "full unpickling executes arbitrary code from the checkpoint."
            )
        blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    variables = import_state_dict(sd, args.model)
    if not args.no_verify:
        verify_tree(variables, args.model)

    import jax

    flat = {}
    for kp, v in jax.tree_util.tree_flatten_with_path(variables)[0]:
        flat["/".join(str(getattr(k, "key", k)) for k in kp)] = np.asarray(v)
    np.savez_compressed(args.out, **flat)
    print(f"wrote {args.out}: {len(flat)} arrays "
          f"({sum(v.size for v in flat.values()):,} params)")


if __name__ == "__main__":
    main()
