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


# open_clip hub models the reference names (`open_clip_encoder.py:14-16`
# HIDDEN_SIZE_DICT lists exactly ViT-H-14-378-quickgelu). Structure is the
# CLIP ViT (`hf_import.import_open_clip` handles the weight layout).
_OPEN_CLIP_MODELS = {
    # name: (hidden, intermediate, pretrained_layers, heads, image, patch)
    "ViT-H-14-378-quickgelu": (1280, 5120, 32, 16, 378, 14),
    "ViT-H-14-quickgelu": (1280, 5120, 32, 16, 224, 14),
    "ViT-L-14-336-quickgelu": (1024, 4096, 24, 16, 336, 14),
}


def _eva_config(name: str):
    """Vision configs transcribed from the reference's vendored
    `dev_eva_clip/eva_clip/model_configs/*.json` (the EvaViTWrapper /
    EvaClipVisionTower names, `builder.py:31-34`); intermediate_size uses the
    torch truncation int(width * mlp_ratio) (`eva_vit_model.py:276`)."""
    from radvlm_tpu.models.eva import EVAVisionConfig

    eva02 = dict(qkv_bias=True, subln=True, swiglu=True, rope=True,
                 rope_pt_seq_len=16, rope_intp_freq=True, norm="layernorm")
    eva8b = dict(qkv_bias=False, subln=False, swiglu=False, rope=False,
                 norm="rms")
    table = {
        "EVA02-CLIP-L-14-336": dict(
            hidden_size=1024, head_dim=64, num_layers=24,
            intermediate_size=int(1024 * 2.6667), image_size=336,
            patch_size=14, **eva02),
        "EVA02-CLIP-L-14": dict(
            hidden_size=1024, head_dim=64, num_layers=24,
            intermediate_size=int(1024 * 2.6667), image_size=224,
            patch_size=14, **eva02),
        "EVA02-CLIP-B-16": dict(
            hidden_size=768, head_dim=64, num_layers=12,
            intermediate_size=int(768 * 2.6667), image_size=224,
            patch_size=16, **eva02),
        "EVA-CLIP-8B": dict(
            hidden_size=4096, head_dim=128, num_layers=32,
            intermediate_size=4096 * 5, image_size=224, patch_size=14,
            **eva8b),
        "EVA-CLIP-8B-plus": dict(
            hidden_size=4096, head_dim=128, num_layers=32,
            intermediate_size=4096 * 5, image_size=448, patch_size=14,
            **eva8b),
    }
    key = next((k for k in table if k.lower() in name.lower()
                and not (k == "EVA-CLIP-8B" and "plus" in name.lower())), None)
    if key is None:
        raise ValueError(
            f"unknown EVA tower {name!r}; known: {sorted(table)}"
        )
    return EVAVisionConfig(**table[key])


def config_from_tower_name(name: str, *, select_layer: int = -2,
                           s2: bool = False, s2_scales=()):
    """String -> vision tower config, the reference's `build_vision_tower`
    dispatch (`multimodal_encoder/builder.py:13-36`):

    - absolute path / "openai..." / "laion..." / "...ShareGPT4V..." -> CLIP
      (S2 wrapper when `s2`),
    - name containing "siglip" -> SigLIP (flagship),
    - "hf:<dir>" -> generic HF vision config dir (clip_vision_model /
      siglip_vision_model archs; the reference's HFVisionTower wraps
      AutoModel the same way, `hf_vision.py:20-60`),
    - "imagebind_huge" -> ImageBind vision trunk + head,
    - "open_clip_hub:<model>" -> open_clip visual transformer.

    `select_layer=-2` (the reference's mm_vision_select_layer default) maps
    to running pretrained_layers - 1 (the repo-wide num_layers convention).
    Only negative selection is supported; SigLIP ignores it (the reference's
    SigLipVisionTower hard-drops the last layer regardless,
    `siglip_encoder.py:570-582`), as does ImageBind (pooled head output)."""
    import os

    if select_layer >= 0:
        raise ValueError(
            f"select_layer must be negative (hidden_states[-k]); "
            f"got {select_layer}"
        )
    drop = -select_layer - 1  # -2 -> run all but the last layer
    if name == "imagebind_huge":
        from radvlm_tpu.models.imagebind import ImageBindVisionConfig

        return ImageBindVisionConfig()
    if name.startswith("open_clip_hub:"):
        model = name[len("open_clip_hub:"):]
        if model not in _OPEN_CLIP_MODELS:
            raise ValueError(
                f"unknown open_clip model {model!r}; known: "
                f"{sorted(_OPEN_CLIP_MODELS)}"
            )
        h, ffn, layers, heads, img, patch = _OPEN_CLIP_MODELS[model]
        return clip.CLIPVisionConfig(
            hidden_size=h, intermediate_size=ffn, num_layers=layers - drop,
            num_heads=heads, image_size=img, patch_size=patch,
            s2_scales=tuple(s2_scales) if s2 else (),
        )
    if name.startswith("hf:"):
        import json

        with open(os.path.join(name[3:], "config.json")) as f:
            data = json.load(f)
        vis = data.get("vision_config", data)
        mt = vis.get("model_type", data.get("model_type", ""))
        if mt == "clip_vision_model":
            return clip.CLIPVisionConfig(
                hidden_size=vis.get("hidden_size", 1024),
                intermediate_size=vis.get("intermediate_size", 4096),
                num_layers=vis.get("num_hidden_layers", 24) - drop,
                num_heads=vis.get("num_attention_heads", 16),
                image_size=vis.get("image_size", 336),
                patch_size=vis.get("patch_size", 14),
            )
        if mt == "siglip_vision_model":
            from radvlm_tpu.config import SigLIPConfig

            return SigLIPConfig(
                hidden_size=vis.get("hidden_size", 1152),
                intermediate_size=vis.get("intermediate_size", 4304),
                num_layers=vis.get("num_hidden_layers", 27) - drop,
                num_heads=vis.get("num_attention_heads", 16),
                image_size=vis.get("image_size", 384),
                patch_size=vis.get("patch_size", 14),
            )
        raise ValueError(
            f"hf: tower arch {mt!r} unsupported (clip/siglip vision models)"
        )
    if "siglip" in name.lower():
        from radvlm_tpu.config import SigLIPConfig

        return SigLIPConfig()
    if (os.path.isabs(name) or name.startswith(("openai", "laion"))
            or "ShareGPT4V" in name):
        # ViT-L/14-336 class (24 pretrained layers); the reference's
        # CLIPVisionTower honors select_layer via hidden_states[k].
        return clip.CLIPVisionConfig(
            num_layers=24 - drop,
            s2_scales=tuple(s2_scales) if s2 else (),
        )
    if ("internal-eva" in name.lower() or "eva02" in name.lower()
            or name in ("EVA-CLIP-8B", "EVA-CLIP-8B-plus")):
        # The reference's two EVA branches, matched with the builder's OWN
        # predicates (`builder.py:31-34`) so a mere "eva" substring (e.g. an
        # /evals/... checkpoint path) cannot shadow the CLIP/hf: branches.
        # select_layer is unused by the wrapper's final feature path
        # (feature_select's layer indexing is commented out,
        # `dev_eva_clip/eva_vit.py:79-90` — all blocks run).
        return _eva_config(name)
    raise ValueError(f"Unknown vision tower: {name}")


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


def with_tower(model_cfg, name: str, *, select_layer: int = -2,
               s2: bool = False, s2_scales=()):
    """Return `model_cfg` (RadVLMConfig) rebuilt around the named tower —
    the training CLI's `--vision-tower` override (the reference's
    `--vision_tower`/`--mm_vision_select_layer` flags, `train.py` ModelArguments).

    Keeps the anyres tile size in sync with the tower's input resolution;
    pooled-token towers (ImageBind: one joint-space token, no spatial grid)
    force `image_aspect_ratio="pad"` since anyres unpad/newline merging needs
    a feature grid."""
    import dataclasses

    vis = config_from_tower_name(
        name, select_layer=select_layer, s2=s2, s2_scales=s2_scales
    )
    kwargs = {}
    if vis.tokens_per_tile == 1:
        kwargs["image_aspect_ratio"] = "pad"
    return dataclasses.replace(
        model_cfg,
        vision=vis,
        anyres=dataclasses.replace(model_cfg.anyres, tile_size=vis.image_size),
        **kwargs,
    )


def _module(vision_cfg):
    k = kind(vision_cfg)
    if k == "siglip":
        return siglip
    if k == "clip":
        return clip
    if k == "imagebind":
        from radvlm_tpu.models import imagebind

        return imagebind
    if k == "eva":
        from radvlm_tpu.models import eva

        return eva
    raise ValueError(f"unknown vision tower kind: {k!r}")


def init_params(vision_cfg, key, dtype):
    return _module(vision_cfg).init_params(vision_cfg, key, dtype)


def forward(params, vision_cfg, pixels, *, remat=False, attn_impl="auto"):
    return _module(vision_cfg).forward(
        params, vision_cfg, pixels, remat=remat, attn_impl=attn_impl
    )
