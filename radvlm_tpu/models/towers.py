"""Vision tower dispatch (the reference's `build_vision_tower`,
`finetuning/llava/model/multimodal_encoder/builder.py:13-36`).

Towers are selected by the config's `kind` attribute: SigLIP (the flagship
RadVLM tower, `models/siglip.py`) or CLIP / CLIP+S2 (`models/clip.py`).
All towers share the functional contract:

    init_params(cfg, key, dtype) -> Params
    forward(params, cfg, pixels, *, remat, attn_impl) -> [B, tokens_per_tile, F]

where F = `feature_size(cfg)` (= hidden_size, times the number of scales for
S2). The projector consumes F; everything downstream (anyres merge, splice) is
tower-agnostic.
"""

from __future__ import annotations

from radvlm_tpu.models import clip, siglip


def kind(vision_cfg) -> str:
    return getattr(vision_cfg, "kind", "siglip")


def feature_size(vision_cfg) -> int:
    return getattr(vision_cfg, "feature_size", vision_cfg.hidden_size)


def mean_std(vision_cfg):
    """Per-tower pixel normalization (SigLIP: 0.5/0.5; CLIP: OpenAI stats)."""
    from radvlm_tpu.ops.image_ops import SIGLIP_MEAN, SIGLIP_STD

    mean = getattr(vision_cfg, "mean", None)
    std = getattr(vision_cfg, "std", None)
    if mean is None:
        return SIGLIP_MEAN, SIGLIP_STD
    return tuple(mean), tuple(std)


def _module(vision_cfg):
    k = kind(vision_cfg)
    if k == "siglip":
        return siglip
    if k == "clip":
        return clip
    raise ValueError(f"unknown vision tower kind: {k!r}")


def init_params(vision_cfg, key, dtype):
    return _module(vision_cfg).init_params(vision_cfg, key, dtype)


def forward(params, vision_cfg, pixels, *, remat=False, attn_impl="auto"):
    return _module(vision_cfg).forward(
        params, vision_cfg, pixels, remat=remat, attn_impl=attn_impl
    )
