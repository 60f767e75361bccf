"""Entropy model registry (replaces the reference's `eval(class_name)`,
reference train.py:22-23)."""

from __future__ import annotations

from scp_tpu.models.ehem import EHEM
from scp_tpu.models.octattention import OctAttention

_REGISTRY = {
    "OctAttention": OctAttention,
    "EHEM": EHEM,
    # checkpoint-compat alias (the reference's encode.py:249 accepts it)
    "EHEMVoxel": EHEM,
}


def get_model_class(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build_model(cfg, dtype=None):
    import jax.numpy as jnp

    cls = get_model_class(cfg.model.class_name)
    return cls.from_config(cfg, dtype=dtype or jnp.float32)


__all__ = ["EHEM", "OctAttention", "get_model_class", "build_model"]
