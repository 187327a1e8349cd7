"""Multimodal projector (vision feature -> LLM embedding space).

Rebuild of the reference's projector builder (`finetuning/llava/model/
multimodal_projector/builder.py:33-63`): supports "linear", "mlp{N}x_gelu"
(RadVLM: mlp2x_gelu), and "identity". GELU here is the exact (erf) variant, matching
torch `nn.GELU()` used by the reference.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from radvlm_tpu.config import ProjectorConfig

Params = Dict[str, Any]


def init_params(
    cfg: ProjectorConfig, vision_dim: int, text_dim: int, key: jax.Array, dtype=jnp.float32
) -> Params:
    depth = cfg.mlp_depth
    if cfg.kind == "identity":
        return {}
    params: Params = {}
    dims = [vision_dim] + [text_dim] * depth
    keys = jax.random.split(key, max(depth, 1))
    for i in range(depth):
        params[f"fc{i}"] = {
            "kernel": (jax.random.normal(keys[i], (dims[i], dims[i + 1]), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((dims[i + 1],), dtype),
        }
    return params


def forward(params: Params, cfg: ProjectorConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., vision_dim] -> [..., text_dim]."""
    if cfg.kind == "identity":
        return x
    depth = cfg.mlp_depth
    for i in range(depth):
        x = x @ params[f"fc{i}"]["kernel"] + params[f"fc{i}"]["bias"]
        if i < depth - 1:
            x = jax.nn.gelu(x, approximate=False)
    return x
