"""Vision-token resamplers (reduce tokens-per-tile before the projector).

Rebuild of the reference's resampler builder (`finetuning/llava/model/
multimodal_resampler/builder.py:21-33`: identity default, masked_drop,
spatial_pool, perceiver, qformer). RadVLM itself uses the identity; the
spatial_pool variant is implemented (it is the one the LLaVA family actually
deploys for token reduction); perceiver/qformer remain future work (the
reference carries ~1,600 vendored LoC it never enables).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    kind: str = "identity"  # "identity" | "spatial_pool"
    # spatial_pool settings (reference mm_spatial_pool_stride/mode)
    stride: int = 2
    mode: str = "average"  # "average" | "max"


def init_params(cfg: ResamplerConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    return {}  # both implemented kinds are parameter-free


def output_tokens(cfg: ResamplerConfig, tokens_per_tile: int) -> int:
    if cfg.kind == "identity":
        return tokens_per_tile
    side = int(math.isqrt(tokens_per_tile))
    return (side // cfg.stride) * (side // cfg.stride)


def forward(
    params: Dict, cfg: ResamplerConfig, feats: jnp.ndarray
) -> jnp.ndarray:
    """feats: [N, T, D] per-tile vision features (T a square grid)."""
    if cfg.kind == "identity":
        return feats
    if cfg.kind != "spatial_pool":
        raise NotImplementedError(
            f"resampler {cfg.kind!r} not implemented (reference ships but never "
            "enables perceiver/qformer)"
        )
    n, t, d = feats.shape
    side = int(math.isqrt(t))
    assert side * side == t, f"spatial_pool needs a square grid, got {t}"
    s = cfg.stride
    out = side // s
    x = feats[:, : out * s * side].reshape(n, side, side, d)
    x = x[:, : out * s, : out * s].reshape(n, out, s, out, s, d)
    if cfg.mode == "average":
        return x.mean(axis=(2, 4)).reshape(n, out * out, d)
    return x.max(axis=(2, 4)).reshape(n, out * out, d)
