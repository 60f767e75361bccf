"""Lightweight YAML config system (Hydra-like surface, zero dependencies).

Supports what the reference relies on (`configs/*.yaml`, reference
train.py:11 + encode.py:242-244):
  * a `defaults:` list composing a base file and config groups
    (`- model: ehem.yaml` loads `configs/model/ehem.yaml` under key `model`)
  * `${a.b.c}` interpolation
  * dotted CLI overrides (`train.lr=3e-4`, `gpus=[0,1]`)
  * run-dir archival (`save(cfg, dir)`) and round-trip at eval time.

Model selection is a registry lookup (`scp_tpu.models.get_model`), not
`eval()` of a class name.
"""

from __future__ import annotations

import ast
import copy
import os
import re
from typing import Any

import yaml


class Config(dict):
    """dict with attribute access and dotted-path get/set."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def get_path(self, path: str, default=None):
        cur: Any = self
        for part in path.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    def set_path(self, path: str, value):
        parts = path.split(".")
        cur: Any = self
        for p in parts[:-1]:
            if p not in cur or not isinstance(cur[p], dict):
                cur[p] = Config()
            cur = cur[p]
        cur[parts[-1]] = value

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_plain(self):
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _deep_merge(base: dict, extra: dict) -> dict:
    out = copy.deepcopy(dict(base))
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve_interp(cfg: Config):
    def resolve(value, root, depth=0):
        if depth > 20:
            raise ValueError("interpolation cycle")
        if isinstance(value, str):
            m = _INTERP.fullmatch(value.strip())
            if m:
                ref = root.get_path(m.group(1))
                if ref is None:
                    raise KeyError(f"interpolation target missing: {value}")
                return resolve(ref, root, depth + 1)
            return _INTERP.sub(
                lambda m2: str(resolve(root.get_path(m2.group(1)), root, depth + 1)),
                value,
            )
        if isinstance(value, dict):
            for k in list(value.keys()):
                value[k] = resolve(value[k], root, depth)
        if isinstance(value, list):
            return [resolve(v, root, depth) for v in value]
        return value

    resolve(cfg, cfg)
    return cfg


def _parse_value(text: str):
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def _load_file(path: str, config_dir: str) -> dict:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    defaults = raw.pop("defaults", [])
    merged: dict = {}
    for entry in defaults:
        if isinstance(entry, str):
            # plain entries resolve relative to the including file's dir
            # (e.g. data/kitti_ehem.yaml -> data/default.yaml)
            merged = _deep_merge(
                merged,
                _load_file(os.path.join(os.path.dirname(path), entry), config_dir),
            )
        elif isinstance(entry, dict):
            for group, name in entry.items():
                sub = _load_file(os.path.join(config_dir, group, name), config_dir)
                merged = _deep_merge(merged, {group: sub})
    return _deep_merge(merged, raw)


def load_config(
    config_name: str,
    config_dir: str = "configs",
    overrides: list[str] | None = None,
) -> Config:
    """Compose a config file with its defaults list and CLI overrides."""
    if not config_name.endswith((".yaml", ".yml")):
        config_name += ".yaml"
    merged = _load_file(os.path.join(config_dir, config_name), config_dir)
    cfg = Config.wrap(merged)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, val = ov.split("=", 1)
        cfg.set_path(key.strip(), Config.wrap(_parse_value(val.strip())))
    return _resolve_interp(cfg)


def save_config(cfg: Config, run_dir: str) -> str:
    """Archive the resolved config in the run dir (eval re-reads it)."""
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_plain(), f, sort_keys=False)
    return path


def load_run_config(run_dir: str) -> Config:
    with open(os.path.join(run_dir, "config.yaml")) as f:
        return _resolve_interp(Config.wrap(yaml.safe_load(f)))
