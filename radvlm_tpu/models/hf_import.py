"""HF checkpoint import: safetensors / torch state-dicts -> radvlm_tpu param pytrees.

TPU-native counterpart of the reference's converter
(`radvlm/evaluation/convert_llava_onevision_weights_to_hf.py:49-59` key-remap table).
Accepts either naming scheme:

- original LLaVA-OneVision training layout:  `model.layers.*`,
  `model.vision_tower.vision_tower.vision_model.*`, `model.mm_projector.{0,2}.*`,
  `model.image_newline`, `lm_head.weight`;
- converted HF `LlavaOnevisionForConditionalGeneration` layout:
  `language_model.model.layers.*` (or `model.language_model.layers.*` in newer
  transformers), `vision_tower.vision_model.*`, `multi_modal_projector.linear_{1,2}.*`,
  `image_newline`.

Outputs our layout: per-layer weights stacked along a leading layer axis (scan-ready),
linear kernels transposed to [in, out], conv patch embedding reshaped to a
patchify-matmul kernel.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Mapping

import numpy as np

import jax.numpy as jnp

from radvlm_tpu.config import ProjectorConfig, Qwen2Config, RadVLMConfig, SigLIPConfig


def _to_np(x) -> np.ndarray:
    """Torch tensor / numpy array -> numpy (bf16 -> ml_dtypes.bfloat16)."""
    if isinstance(x, np.ndarray):
        return x
    try:
        import torch

        if isinstance(x, torch.Tensor):
            x = x.detach().cpu()
            if x.dtype == torch.bfloat16:
                import ml_dtypes

                return x.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            return x.numpy()
    except ImportError:
        pass
    raise TypeError(f"unsupported tensor type {type(x)}")


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load every *.safetensors file under `path` into one flat numpy dict."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors files in {path}")
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                state[k] = sf.get_tensor(k)
    return state


def normalize_keys(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Map either checkpoint layout onto canonical prefixes.

    Canonical: `text.layers.N.*`, `text.embed_tokens.weight`, `text.norm.weight`,
    `text.lm_head.weight`, `vision.*` (HF SigLIP names below vision_model),
    `projector.fc{0,1}.*`, `image_newline`.
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        nk = k
        # --- original LLaVA-OV training layout ---
        nk = nk.replace("model.vision_tower.vision_tower.vision_model.", "vision.")
        # EVA/ImageBind towers have no vision_model level: their importers
        # take the wrapper-local keys (visual.* / modality_*.*) directly.
        nk = nk.replace("model.vision_tower.vision_tower.", "")
        nk = nk.replace("model.vision_resampler.", "vision_resampler.")
        nk = nk.replace("model.mm_projector.0.", "projector.fc0.")
        nk = nk.replace("model.mm_projector.2.", "projector.fc1.")
        nk = nk.replace("model.image_newline", "image_newline")
        # --- converted HF layout (two transformers generations) ---
        nk = nk.replace("model.language_model.layers.", "text.layers.")
        nk = nk.replace("model.language_model.embed_tokens.", "text.embed_tokens.")
        nk = nk.replace("model.language_model.norm.", "text.norm.")
        nk = nk.replace("language_model.model.", "text.")
        nk = nk.replace("language_model.lm_head.", "text.lm_head.")
        nk = nk.replace("model.vision_tower.vision_model.", "vision.")
        nk = nk.replace("vision_tower.vision_model.", "vision.")
        nk = nk.replace("model.multi_modal_projector.linear_1.", "projector.fc0.")
        nk = nk.replace("model.multi_modal_projector.linear_2.", "projector.fc1.")
        nk = nk.replace("multi_modal_projector.linear_1.", "projector.fc0.")
        nk = nk.replace("multi_modal_projector.linear_2.", "projector.fc1.")
        # --- MPT (HF MptForCausalLM: transformer.wte/blocks/norm_f) ---
        nk = nk.replace("transformer.wte.weight", "text.embed_tokens.weight")
        nk = nk.replace("transformer.norm_f.weight", "text.norm.weight")
        nk = nk.replace("transformer.blocks.", "text.layers.")
        # --- plain Qwen2 / plain HF model ---
        nk = re.sub(r"^model\.", "text.", nk)
        nk = re.sub(r"^lm_head\.", "text.lm_head.", nk)
        # strip leading vision_model. when importing a bare SigLIP tower
        nk = re.sub(r"^vision_model\.", "vision.", nk)
        out[nk] = _to_np(v)
    return out


def _lin(state, key, dtype):
    """HF Linear weight [out, in] -> kernel [in, out]."""
    return jnp.asarray(np.ascontiguousarray(state[key].T), dtype)


def _vec(state, key, dtype):
    return jnp.asarray(state[key], dtype)


def import_qwen2(
    state: Mapping[str, np.ndarray], cfg: Qwen2Config, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Canonical-key state dict -> stacked Qwen2 params."""
    L = cfg.num_layers

    def stack_lin(fmt):
        return jnp.stack([_lin(state, fmt.format(i), dtype) for i in range(L)])

    def stack_vec(fmt):
        return jnp.stack([_vec(state, fmt.format(i), dtype) for i in range(L)])

    p = "text.layers.{}."
    if cfg.pos_embedding == "alibi":  # MPT layout (HF MptBlock subkeys)
        return _import_mpt(state, cfg, p, stack_lin, stack_vec, dtype)

    def attn_proj(name):
        node = {"kernel": stack_lin(p + f"self_attn.{name}_proj.weight")}
        if cfg.attention_bias:  # Llama family checkpoints carry no QKV bias
            node["bias"] = stack_vec(p + f"self_attn.{name}_proj.bias")
        return node

    params: Dict[str, Any] = {
        "embed": {"embedding": _vec(state, "text.embed_tokens.weight", dtype)},
        "layers": {
            "ln1": stack_vec(p + "input_layernorm.weight"),
            "ln2": stack_vec(p + "post_attention_layernorm.weight"),
            "attn": {
                "q": attn_proj("q"),
                "k": attn_proj("k"),
                "v": attn_proj("v"),
                "o": {"kernel": stack_lin(p + "self_attn.o_proj.weight")},
            },
            "mlp": (
                _import_moe_mlp(state, cfg, p, dtype)
                if cfg.num_experts
                else {
                    "gate": {"kernel": stack_lin(p + "mlp.gate_proj.weight")},
                    "up": {"kernel": stack_lin(p + "mlp.up_proj.weight")},
                    "down": {"kernel": stack_lin(p + "mlp.down_proj.weight")},
                }
            ),
        },
        "norm": _vec(state, "text.norm.weight", dtype),
    }
    if not cfg.tie_word_embeddings and "text.lm_head.weight" in state:
        params["lm_head"] = {"kernel": _lin(state, "text.lm_head.weight", dtype)}
    return params


def _import_mpt(state, cfg, p, stack_lin, stack_vec, dtype):
    """MPT family (HF MptForCausalLM): fused Wqkv split into q/k/v, no biases
    anywhere (no_bias), weight-only LayerNorms, non-gated ffn, tied lm_head.
    Reference counterpart: `language_model/llava_mpt.py` wrapping HF MPT."""
    wqkv = stack_lin(p + "attn.Wqkv.weight")  # [L, d, 3d] after transpose
    q, k, v = jnp.split(wqkv, 3, axis=-1)
    return {
        "embed": {"embedding": _vec(state, "text.embed_tokens.weight", dtype)},
        "layers": {
            "ln1": stack_vec(p + "norm_1.weight"),
            "ln2": stack_vec(p + "norm_2.weight"),
            "attn": {
                "q": {"kernel": q},
                "k": {"kernel": k},
                "v": {"kernel": v},
                "o": {"kernel": stack_lin(p + "attn.out_proj.weight")},
            },
            "mlp": {
                "up": {"kernel": stack_lin(p + "ffn.up_proj.weight")},
                "down": {"kernel": stack_lin(p + "ffn.down_proj.weight")},
            },
        },
        "norm": _vec(state, "text.norm.weight", dtype),
    }


def import_siglip(
    state: Mapping[str, np.ndarray], cfg: SigLIPConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Canonical-key state dict -> stacked SigLIP params.

    Imports only the first `cfg.num_layers` encoder layers, implementing the
    reference's drop-last-layer policy (`siglip_encoder.py:570-571`). The patch conv
    kernel [D, 3, p, p] becomes a [(p*p*3), D] matmul kernel matching
    `siglip.patchify`'s (ph, pw, C) flatten order.
    """
    L = cfg.num_layers
    conv_w = state["vision.embeddings.patch_embedding.weight"]  # [D, C, p, p]
    d = conv_w.shape[0]
    kernel = np.transpose(conv_w, (2, 3, 1, 0)).reshape(-1, d)  # (ph, pw, C) flat

    def stack_lin(fmt):
        return jnp.stack([_lin(state, fmt.format(i), dtype) for i in range(L)])

    def stack_vec(fmt):
        return jnp.stack([_vec(state, fmt.format(i), dtype) for i in range(L)])

    p = "vision.encoder.layers.{}."
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": jnp.asarray(np.ascontiguousarray(kernel), dtype),
            "bias": _vec(state, "vision.embeddings.patch_embedding.bias", dtype),
        },
        "pos_embed": _vec(state, "vision.embeddings.position_embedding.weight", dtype),
        "layers": {
            "ln1": {
                "scale": stack_vec(p + "layer_norm1.weight"),
                "bias": stack_vec(p + "layer_norm1.bias"),
            },
            "ln2": {
                "scale": stack_vec(p + "layer_norm2.weight"),
                "bias": stack_vec(p + "layer_norm2.bias"),
            },
            "attn": {
                "q": {
                    "kernel": stack_lin(p + "self_attn.q_proj.weight"),
                    "bias": stack_vec(p + "self_attn.q_proj.bias"),
                },
                "k": {
                    "kernel": stack_lin(p + "self_attn.k_proj.weight"),
                    "bias": stack_vec(p + "self_attn.k_proj.bias"),
                },
                "v": {
                    "kernel": stack_lin(p + "self_attn.v_proj.weight"),
                    "bias": stack_vec(p + "self_attn.v_proj.bias"),
                },
                "o": {
                    "kernel": stack_lin(p + "self_attn.out_proj.weight"),
                    "bias": stack_vec(p + "self_attn.out_proj.bias"),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": stack_lin(p + "mlp.fc1.weight"),
                    "bias": stack_vec(p + "mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": stack_lin(p + "mlp.fc2.weight"),
                    "bias": stack_vec(p + "mlp.fc2.bias"),
                },
            },
        },
        "post_ln": {
            "scale": (
                _vec(state, "vision.post_layernorm.weight", dtype)
                if "vision.post_layernorm.weight" in state
                else jnp.ones((d,), dtype)
            ),
            "bias": (
                _vec(state, "vision.post_layernorm.bias", dtype)
                if "vision.post_layernorm.bias" in state
                else jnp.zeros((d,), dtype)
            ),
        },
    }
    return params


def _import_moe_mlp(state, cfg, p: str, dtype):
    """Sparse-MoE block import. Two HF layouts, detected by key probe:

    - Qwen2MoeForCausalLM: router `mlp.gate`, per-expert
      `mlp.experts.{i}.{gate,up,down}_proj`, shared expert + sigmoid gate;
    - MixtralForCausalLM (the reference's llava_mixtral,
      `language_model/llava_mixtral.py`): router `block_sparse_moe.gate`,
      per-expert `block_sparse_moe.experts.{i}.{w1,w3,w2}` (w1=gate, w3=up,
      w2=down), no shared expert.

    Experts stack along a leading E axis ([L, E, in, out]) so the expert
    dimension can shard over the mesh's `expert` axis."""
    L, E = cfg.num_layers, cfg.num_experts
    mixtral = p.format(0) + "block_sparse_moe.gate.weight" in state
    moe_p = "block_sparse_moe." if mixtral else "mlp."
    names = ("w1", "w3", "w2") if mixtral else ("gate_proj", "up_proj", "down_proj")

    def stack_lin(fmt):
        return jnp.stack([_lin(state, fmt.format(i), dtype) for i in range(L)])

    def expert_stack(name):
        return jnp.stack([
            jnp.stack([
                _lin(state, p.format(i) + f"{moe_p}experts.{e}.{name}.weight", dtype)
                for e in range(E)
            ])
            for i in range(L)
        ])  # [L, E, in, out]

    moe = {
        "router": {"kernel": stack_lin(p + moe_p + "gate.weight")},
        "experts": {
            "gate": expert_stack(names[0]),
            "up": expert_stack(names[1]),
            "down": expert_stack(names[2]),
        },
    }
    if not mixtral:
        moe["shared"] = {
            "gate": {"kernel": stack_lin(p + "mlp.shared_expert.gate_proj.weight")},
            "up": {"kernel": stack_lin(p + "mlp.shared_expert.up_proj.weight")},
            "down": {"kernel": stack_lin(p + "mlp.shared_expert.down_proj.weight")},
        }
        moe["shared_gate"] = {"kernel": stack_lin(p + "mlp.shared_expert_gate.weight")}
    return {"moe": moe}


def import_clip(
    state: Mapping[str, np.ndarray], cfg, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Canonical-key state dict -> stacked CLIP tower params (`models/clip.py`).

    Imports the first `cfg.num_layers` encoder layers (select_layer=-2 on a
    24-layer pretrained ViT-L means 23 — the reference takes hidden_states[-2],
    `clip_encoder.py:24-33`). HF CLIPVisionModel layout: patch conv without
    bias, class_embedding, position_embedding over cls+patches, pre_layrnorm.
    """
    L = cfg.num_layers
    conv_w = state["vision.embeddings.patch_embedding.weight"]  # [D, C, p, p]
    d = conv_w.shape[0]
    kernel = np.transpose(conv_w, (2, 3, 1, 0)).reshape(-1, d)

    def stack_lin(fmt):
        return jnp.stack([_lin(state, fmt.format(i), dtype) for i in range(L)])

    def stack_vec(fmt):
        return jnp.stack([_vec(state, fmt.format(i), dtype) for i in range(L)])

    p = "vision.encoder.layers.{}."
    return {
        "patch_embed": {
            "kernel": jnp.asarray(np.ascontiguousarray(kernel), dtype)
        },
        "class_embed": _vec(state, "vision.embeddings.class_embedding", dtype),
        "pos_embed": _vec(
            state, "vision.embeddings.position_embedding.weight", dtype
        ),
        "pre_ln": {
            "scale": _vec(state, "vision.pre_layrnorm.weight", dtype),
            "bias": _vec(state, "vision.pre_layrnorm.bias", dtype),
        },
        "layers": {
            "ln1": {
                "scale": stack_vec(p + "layer_norm1.weight"),
                "bias": stack_vec(p + "layer_norm1.bias"),
            },
            "ln2": {
                "scale": stack_vec(p + "layer_norm2.weight"),
                "bias": stack_vec(p + "layer_norm2.bias"),
            },
            "attn": {
                "q": {
                    "kernel": stack_lin(p + "self_attn.q_proj.weight"),
                    "bias": stack_vec(p + "self_attn.q_proj.bias"),
                },
                "k": {
                    "kernel": stack_lin(p + "self_attn.k_proj.weight"),
                    "bias": stack_vec(p + "self_attn.k_proj.bias"),
                },
                "v": {
                    "kernel": stack_lin(p + "self_attn.v_proj.weight"),
                    "bias": stack_vec(p + "self_attn.v_proj.bias"),
                },
                "o": {
                    "kernel": stack_lin(p + "self_attn.out_proj.weight"),
                    "bias": stack_vec(p + "self_attn.out_proj.bias"),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": stack_lin(p + "mlp.fc1.weight"),
                    "bias": stack_vec(p + "mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": stack_lin(p + "mlp.fc2.weight"),
                    "bias": stack_vec(p + "mlp.fc2.bias"),
                },
            },
        },
    }


def import_open_clip(
    state: Mapping[str, np.ndarray], cfg, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """open_clip `visual.*` checkpoint -> stacked CLIP tower params.

    The reference's OpenCLIPVisionTower wraps `open_clip.create_model(...)
    .visual` (`multimodal_encoder/open_clip_encoder.py:40-60`); its visual
    transformer is math-identical to the HF CLIP ViT (`models/clip.py`), only
    the state-dict layout differs:

    - `conv1.weight` [D, 3, p, p] patch conv (no bias),
    - `class_embedding` [D], `positional_embedding` [N, D] (raw tensors, not
      nn.Embedding),
    - `ln_pre.{weight,bias}`,
    - resblocks with torch MultiheadAttention: FUSED `attn.in_proj_weight`
      [3D, D] / `in_proj_bias` [3D] (q, k, v concatenated in that order) and
      `attn.out_proj.*`; MLP as `c_fc`/`c_proj`.

    Imports the first `cfg.num_layers` resblocks (select_layer=-2 convention,
    same as `import_clip`)."""
    L = cfg.num_layers
    d = cfg.hidden_size
    conv_w = state["visual.conv1.weight"]  # [D, C, p, p]
    kernel = np.transpose(conv_w, (2, 3, 1, 0)).reshape(-1, d)

    def qkv_part(i, part):  # part: 0=q, 1=k, 2=v
        w = state[f"visual.transformer.resblocks.{i}.attn.in_proj_weight"]
        b = state[f"visual.transformer.resblocks.{i}.attn.in_proj_bias"]
        return (
            np.ascontiguousarray(w[part * d:(part + 1) * d].T),
            b[part * d:(part + 1) * d],
        )

    def stack_qkv(part):
        ws, bs = zip(*(qkv_part(i, part) for i in range(L)))
        return {
            "kernel": jnp.asarray(np.stack(ws), dtype),
            "bias": jnp.asarray(np.stack(bs), dtype),
        }

    def stack_lin(fmt):
        return jnp.stack([_lin(state, fmt.format(i), dtype) for i in range(L)])

    def stack_vec(fmt):
        return jnp.stack([_vec(state, fmt.format(i), dtype) for i in range(L)])

    p = "visual.transformer.resblocks.{}."
    return {
        "patch_embed": {
            "kernel": jnp.asarray(np.ascontiguousarray(kernel), dtype)
        },
        "class_embed": _vec(state, "visual.class_embedding", dtype),
        "pos_embed": _vec(state, "visual.positional_embedding", dtype),
        "pre_ln": {
            "scale": _vec(state, "visual.ln_pre.weight", dtype),
            "bias": _vec(state, "visual.ln_pre.bias", dtype),
        },
        "layers": {
            "ln1": {
                "scale": stack_vec(p + "ln_1.weight"),
                "bias": stack_vec(p + "ln_1.bias"),
            },
            "ln2": {
                "scale": stack_vec(p + "ln_2.weight"),
                "bias": stack_vec(p + "ln_2.bias"),
            },
            "attn": {
                "q": stack_qkv(0),
                "k": stack_qkv(1),
                "v": stack_qkv(2),
                "o": {
                    "kernel": stack_lin(p + "attn.out_proj.weight"),
                    "bias": stack_vec(p + "attn.out_proj.bias"),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": stack_lin(p + "mlp.c_fc.weight"),
                    "bias": stack_vec(p + "mlp.c_fc.bias"),
                },
                "fc2": {
                    "kernel": stack_lin(p + "mlp.c_proj.weight"),
                    "bias": stack_vec(p + "mlp.c_proj.bias"),
                },
            },
        },
    }


def import_imagebind(
    state: Mapping[str, np.ndarray], cfg, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Public ImageBind checkpoint -> `models/imagebind.py` params.

    Layout (the external package the reference wraps, `imagebind.py:28-33`):
    `modality_preprocessors.vision.{cls_token, rgbt_stem.proj.1.weight,
    pos_embedding_helper.pos_embed}`, `modality_trunks.vision.
    {pre_transformer_layer.0.*, blocks.N.*}` (torch MultiheadAttention with
    fused in_proj, like open_clip), `modality_heads.vision.{0 (LayerNorm),
    2 (Linear, no bias)}`. The Conv3d stem is collapsed to the still-image
    2D patchify matmul (see `imagebind.collapse_video_stem`)."""
    from radvlm_tpu.models.imagebind import collapse_video_stem

    L = cfg.num_layers
    d = cfg.hidden_size
    pre = "modality_preprocessors.vision."
    trunk = "modality_trunks.vision."
    head = "modality_heads.vision."

    def qkv_part(i, part):
        w = state[f"{trunk}blocks.{i}.attn.in_proj_weight"]
        b = state[f"{trunk}blocks.{i}.attn.in_proj_bias"]
        return (
            np.ascontiguousarray(w[part * d:(part + 1) * d].T),
            b[part * d:(part + 1) * d],
        )

    def stack_qkv(part):
        ws, bs = zip(*(qkv_part(i, part) for i in range(L)))
        return {
            "kernel": jnp.asarray(np.stack(ws), dtype),
            "bias": jnp.asarray(np.stack(bs), dtype),
        }

    def stack_lin(fmt):
        return jnp.stack([_lin(state, fmt.format(i), dtype) for i in range(L)])

    def stack_vec(fmt):
        return jnp.stack([_vec(state, fmt.format(i), dtype) for i in range(L)])

    p = trunk + "blocks.{}."
    return {
        "patch_embed": {
            "kernel": jnp.asarray(
                collapse_video_stem(state[pre + "rgbt_stem.proj.1.weight"]),
                dtype,
            )
        },
        "class_embed": jnp.asarray(
            np.asarray(state[pre + "cls_token"]).reshape(-1), dtype
        ),
        "pos_embed": jnp.asarray(
            np.asarray(state[pre + "pos_embedding_helper.pos_embed"]).reshape(
                -1, d
            ),
            dtype,
        ),
        "pre_ln": {
            "scale": _vec(state, trunk + "pre_transformer_layer.0.weight", dtype),
            "bias": _vec(state, trunk + "pre_transformer_layer.0.bias", dtype),
        },
        "layers": {
            "ln1": {
                "scale": stack_vec(p + "norm_1.weight"),
                "bias": stack_vec(p + "norm_1.bias"),
            },
            "ln2": {
                "scale": stack_vec(p + "norm_2.weight"),
                "bias": stack_vec(p + "norm_2.bias"),
            },
            "attn": {
                "q": stack_qkv(0),
                "k": stack_qkv(1),
                "v": stack_qkv(2),
                "o": {
                    "kernel": stack_lin(p + "attn.out_proj.weight"),
                    "bias": stack_vec(p + "attn.out_proj.bias"),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": stack_lin(p + "mlp.fc1.weight"),
                    "bias": stack_vec(p + "mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": stack_lin(p + "mlp.fc2.weight"),
                    "bias": stack_vec(p + "mlp.fc2.bias"),
                },
            },
        },
        "head": {
            "ln": {
                "scale": _vec(state, head + "0.weight", dtype),
                "bias": _vec(state, head + "0.bias", dtype),
            },
            "proj": {"kernel": _lin(state, head + "2.weight", dtype)},
        },
    }


def import_eva(
    state: Mapping[str, np.ndarray], cfg, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """EVA checkpoint (`EVAVisionTransformer` layout, with or without the
    CLIP `visual.` prefix) -> `models/eva.py` params.

    Handles both attention layouts: subln's separate `q_proj/k_proj/v_proj`
    weights (bias-free; q_bias/v_bias separate) and the fused `qkv.weight`
    [3D, D] (`eva_vit_model.py:117-129`), plus the optional inner_attn_ln /
    ffn_ln (subln), SwiGLU w1/w2/w3 vs fc1/fc2, weight-only RMS norms
    (EVA-CLIP-8B), and layerscale gamma_1/gamma_2."""
    state = {
        (k[len("visual."):] if k.startswith("visual.") else k): v
        for k, v in state.items()
    }
    L = cfg.num_layers
    d = cfg.hidden_size
    conv_w = state["patch_embed.proj.weight"]  # [D, C, p, p]
    kernel = np.transpose(conv_w, (2, 3, 1, 0)).reshape(-1, d)

    def stack_lin(fmt):
        return jnp.stack([_lin(state, fmt.format(i), dtype) for i in range(L)])

    def stack_vec(fmt):
        return jnp.stack([_vec(state, fmt.format(i), dtype) for i in range(L)])

    def norm_stack(fmt):
        n = {"scale": stack_vec(fmt + ".weight")}
        if cfg.norm != "rms":
            n["bias"] = stack_vec(fmt + ".bias")
        return n

    p = "blocks.{}."
    if cfg.subln:
        attn = {
            "q": {"kernel": stack_lin(p + "attn.q_proj.weight")},
            "k": {"kernel": stack_lin(p + "attn.k_proj.weight")},
            "v": {"kernel": stack_lin(p + "attn.v_proj.weight")},
        }
    else:
        def qkv_part(i, part):
            w = state[f"blocks.{i}.attn.qkv.weight"]
            return np.ascontiguousarray(w[part * d:(part + 1) * d].T)

        attn = {
            name: {"kernel": jnp.asarray(
                np.stack([qkv_part(i, j) for i in range(L)]), dtype)}
            for j, name in enumerate(("q", "k", "v"))
        }
    if cfg.qkv_bias:
        attn["q"]["bias"] = stack_vec(p + "attn.q_bias")
        attn["v"]["bias"] = stack_vec(p + "attn.v_bias")
    attn["o"] = {
        "kernel": stack_lin(p + "attn.proj.weight"),
        "bias": stack_vec(p + "attn.proj.bias"),
    }
    if cfg.subln:
        attn["inner_ln"] = norm_stack(p + "attn.inner_attn_ln")

    if cfg.swiglu:
        mlp = {
            w: {"kernel": stack_lin(p + f"mlp.{w}.weight"),
                "bias": stack_vec(p + f"mlp.{w}.bias")}
            for w in ("w1", "w2", "w3")
        }
    else:
        mlp = {
            w: {"kernel": stack_lin(p + f"mlp.{w}.weight"),
                "bias": stack_vec(p + f"mlp.{w}.bias")}
            for w in ("fc1", "fc2")
        }
    if cfg.subln:
        mlp["ffn_ln"] = norm_stack(p + "mlp.ffn_ln")

    layers: Dict[str, Any] = {
        "ln1": norm_stack(p + "norm1"),
        "ln2": norm_stack(p + "norm2"),
        "attn": attn,
        "mlp": mlp,
    }
    if cfg.ls_init_value is not None:
        layers["gamma_1"] = stack_vec(p + "gamma_1")
        layers["gamma_2"] = stack_vec(p + "gamma_2")
    return {
        "patch_embed": {
            "kernel": jnp.asarray(np.ascontiguousarray(kernel), dtype),
            "bias": _vec(state, "patch_embed.proj.bias", dtype),
        },
        "class_embed": jnp.asarray(
            np.asarray(state["cls_token"]).reshape(-1), dtype
        ),
        "pos_embed": jnp.asarray(
            np.asarray(state["pos_embed"]).reshape(-1, d), dtype
        ),
        "layers": layers,
    }


def import_qformer(
    state: Mapping[str, np.ndarray], cfg, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """BLIP-2 Qformer checkpoint (the vendored wrapper's state dict:
    `ln_vision.*`, `query_tokens`, `Qformer.bert.*` — `multimodal_resampler/
    qformer.py:1102-1133`) -> `models/resampler.py` qformer params. The text
    path (word/position embeddings, per-layer intermediate/output) is None'd
    by build_Qformer, so those keys are absent by construction."""
    def lin(prefix):
        return {"kernel": _lin(state, prefix + ".weight", dtype),
                "bias": _vec(state, prefix + ".bias", dtype)}

    def ln(prefix):
        return {"scale": _vec(state, prefix + ".weight", dtype),
                "bias": _vec(state, prefix + ".bias", dtype)}

    layers = []
    for i in range(cfg.qformer_layers):
        p = f"Qformer.bert.encoder.layer.{i}."
        layer: Dict[str, Any] = {
            "self": {
                "q": lin(p + "attention.self.query"),
                "k": lin(p + "attention.self.key"),
                "v": lin(p + "attention.self.value"),
                "out": lin(p + "attention.output.dense"),
                "ln": ln(p + "attention.output.LayerNorm"),
            },
            "ffn": {
                "up": lin(p + "intermediate_query.dense"),
                "down": lin(p + "output_query.dense"),
                "ln": ln(p + "output_query.LayerNorm"),
            },
        }
        if p + "crossattention.self.query.weight" in state:
            layer["cross"] = {
                "q": lin(p + "crossattention.self.query"),
                "k": lin(p + "crossattention.self.key"),
                "v": lin(p + "crossattention.self.value"),
                "out": lin(p + "crossattention.output.dense"),
                "ln": ln(p + "crossattention.output.LayerNorm"),
            }
        layers.append(layer)
    return {
        "ln_vision": ln("ln_vision"),
        "query_tokens": jnp.asarray(
            np.asarray(state["query_tokens"]).reshape(
                -1, np.asarray(state["query_tokens"]).shape[-1]
            ),
            dtype,
        ),
        "emb_ln": ln("Qformer.bert.embeddings.LayerNorm"),
        "layers": layers,
    }


def import_projector(
    state: Mapping[str, np.ndarray], cfg: ProjectorConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for i in range(cfg.mlp_depth):
        params[f"fc{i}"] = {
            "kernel": _lin(state, f"projector.fc{i}.weight", dtype),
            "bias": _vec(state, f"projector.fc{i}.bias", dtype),
        }
    return params


def import_radvlm(
    raw_state: Mapping[str, Any], cfg: RadVLMConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Full VLM import from either checkpoint layout (see module docstring)."""
    from radvlm_tpu.models import towers

    state = normalize_keys(raw_state)
    import_tower = {
        "clip": import_clip,
        "siglip": import_siglip,
        "eva": import_eva,
        "imagebind": import_imagebind,
    }[towers.kind(cfg.vision)]
    params = {
        "vision_tower": import_tower(state, cfg.vision, dtype),
        "projector": import_projector(state, cfg.projector, dtype),
        "text": import_qwen2(state, cfg.text, dtype),
    }
    rk = cfg.resampler.kind
    if rk == "qformer":
        # the wrapper's weights live under model.vision_resampler.* in the
        # reference layout (normalize_keys strips the model. prefix)
        sub = {
            k[len("vision_resampler."):]: v
            for k, v in state.items() if k.startswith("vision_resampler.")
        }
        if not sub and "query_tokens" in state:  # bare Qformer checkpoint
            sub = dict(state)
        if not sub:
            raise ValueError(
                "config requests the qformer resampler but the checkpoint "
                "has no vision_resampler.* weights"
            )
        params["resampler"] = import_qformer(sub, cfg.resampler, dtype)
    elif rk == "perceiver":
        raise ValueError(
            "perceiver resampler checkpoints have no HF import layout "
            "(the reference never ships one); load via the orbax "
            "checkpointer (training/checkpoint.py) instead"
        )
    if "image_newline" in state:
        params["image_newline"] = jnp.asarray(state["image_newline"], dtype)
    else:
        params["image_newline"] = jnp.zeros((cfg.text.hidden_size,), dtype)
    return params


def load_radvlm_checkpoint(path: str, cfg: RadVLMConfig, dtype=jnp.bfloat16):
    """Load a safetensors checkpoint directory into a RadVLM param pytree."""
    return import_radvlm(load_safetensors_dir(path), cfg, dtype)


def config_from_hf_dir(path: str) -> RadVLMConfig:
    """Build a RadVLMConfig from an HF config.json (both layouts)."""
    with open(os.path.join(path, "config.json")) as f:
        data = json.load(f)
    text_cfg = data.get("text_config", data)
    vis_cfg = data.get("vision_config", {})
    # Family dispatch: the one functional GQA decoder covers Qwen2 and Llama;
    # Llama checkpoints carry no attention bias and may use llama3 rope scaling.
    model_type = text_cfg.get("model_type", "qwen2")
    rope_kwargs = {}
    rope = text_cfg.get("rope_scaling")
    if isinstance(rope, dict):
        rtype = rope.get("rope_type", rope.get("type", "linear"))
        if rtype == "llama3":
            rope_kwargs = dict(
                rope_scaling=rope.get("factor", 8.0),
                rope_scaling_type="llama3",
                rope_low_freq_factor=rope.get("low_freq_factor", 1.0),
                rope_high_freq_factor=rope.get("high_freq_factor", 4.0),
                rope_original_max_position=rope.get(
                    "original_max_position_embeddings", 8192
                ),
            )
        elif rtype == "linear":
            rope_kwargs = dict(rope_scaling=rope.get("factor", 1.0))
    moe_kwargs = {}
    if text_cfg.get("num_experts"):  # qwen2_moe checkpoints
        moe_kwargs = dict(
            num_experts=text_cfg["num_experts"],
            num_experts_per_tok=text_cfg.get("num_experts_per_tok", 4),
            moe_intermediate_size=text_cfg.get("moe_intermediate_size", 0),
            shared_expert_intermediate_size=text_cfg.get(
                "shared_expert_intermediate_size", 0
            ),
            norm_topk_prob=text_cfg.get("norm_topk_prob", False),
        )
    elif text_cfg.get("num_local_experts"):  # mixtral checkpoints
        # Mixtral: every-layer sparse MoE, no shared expert, top-k weights
        # always renormalized (HF `MixtralSparseMoeBlock`), expert ffn width
        # = intermediate_size.
        moe_kwargs = dict(
            num_experts=text_cfg["num_local_experts"],
            num_experts_per_tok=text_cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=text_cfg.get("intermediate_size", 14336),
            shared_expert_intermediate_size=0,
            norm_topk_prob=True,
        )
    # Family knobs (one functional decoder covers qwen2/llama/mistral/gemma —
    # the reference wraps a class per family, `language_model/llava_*.py`).
    family_kwargs = {}
    if model_type in ("mistral", "mixtral"):
        family_kwargs = dict(sliding_window=text_cfg.get("sliding_window") or 0)
    elif model_type == "gemma":
        family_kwargs = dict(
            hidden_act="gelu_tanh",
            rms_norm_offset=True,
            embed_normalizer=True,
        )
    if model_type == "mpt":
        # MPT configs use their own vocabulary (d_model/n_heads/n_layers/
        # expansion_ratio/max_seq_len); MHA + ALiBi + weight-only LayerNorm +
        # non-gated exact-GELU ffn, always-tied lm_head.
        d = text_cfg.get("d_model", 4096)
        n_heads = text_cfg.get("n_heads", 32)
        attn_cfg = text_cfg.get("attn_config") or {}
        return _finish_config_from_hf(data, Qwen2Config(
            vocab_size=text_cfg.get("vocab_size", 50432),
            hidden_size=d,
            intermediate_size=int(text_cfg.get("expansion_ratio", 4) * d),
            num_layers=text_cfg.get("n_layers", 32),
            num_heads=n_heads,
            num_kv_heads=n_heads,
            head_dim=d // n_heads,
            rms_norm_eps=text_cfg.get("layer_norm_epsilon", 1e-5),
            attention_bias=False,
            tie_word_embeddings=True,
            hidden_act="gelu",
            pos_embedding="alibi",
            norm_kind="layernorm",
            mlp_gated=False,
            alibi_bias_max=int(attn_cfg.get("alibi_bias_max", 8)),
            max_position_embeddings=text_cfg.get("max_seq_len", 2048),
        ), vis_cfg)
    text = Qwen2Config(
        attention_bias=text_cfg.get(
            "attention_bias",
            model_type not in ("llama", "mistral", "mixtral", "gemma"),
        ),
        **rope_kwargs,
        **moe_kwargs,
        **family_kwargs,
        vocab_size=text_cfg.get("vocab_size", 152064),
        hidden_size=text_cfg.get("hidden_size", 3584),
        intermediate_size=text_cfg.get("intermediate_size", 18944),
        num_layers=text_cfg.get("num_hidden_layers", 28),
        num_heads=text_cfg.get("num_attention_heads", 28),
        num_kv_heads=text_cfg.get("num_key_value_heads", 4),
        head_dim=text_cfg.get(
            "head_dim",
            text_cfg.get("hidden_size", 3584) // text_cfg.get("num_attention_heads", 28),
        ),
        rope_theta=text_cfg.get("rope_theta", 1e6),
        rms_norm_eps=text_cfg.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=text_cfg.get("tie_word_embeddings", False),
        max_position_embeddings=text_cfg.get("max_position_embeddings", 32768),
    )
    return _finish_config_from_hf(data, text, vis_cfg)


def _finish_config_from_hf(data, text: Qwen2Config, vis_cfg) -> RadVLMConfig:
    """Shared tail of `config_from_hf_dir`: vision tower + anyres policy."""
    if vis_cfg.get("model_type") == "clip_vision_model":
        from radvlm_tpu.models.clip import CLIPVisionConfig

        # select_layer=-2 contract: run one fewer layer than pretrained
        # (`clip_encoder.py:24-33`, mirrored in models/clip.py).
        vision = CLIPVisionConfig(
            hidden_size=vis_cfg.get("hidden_size", 1024),
            intermediate_size=vis_cfg.get("intermediate_size", 4096),
            num_layers=vis_cfg.get("num_hidden_layers", 24) - 1,
            num_heads=vis_cfg.get("num_attention_heads", 16),
            image_size=vis_cfg.get("image_size", 336),
            patch_size=vis_cfg.get("patch_size", 14),
        )
    else:
        vision = SigLIPConfig(
            hidden_size=vis_cfg.get("hidden_size", 1152),
            intermediate_size=vis_cfg.get("intermediate_size", 4304),
            num_layers=vis_cfg.get("num_hidden_layers", 26),
            num_heads=vis_cfg.get("num_attention_heads", 16),
            image_size=vis_cfg.get("image_size", 384),
            patch_size=vis_cfg.get("patch_size", 14),
        )
    # Anyres policy from the HF fields (`image_grid_pinpoints` lists
    # (height, width) pixel candidates = grid cells x tile size;
    # `vision_aspect_ratio` carries the anyres_max_N token cap).
    from radvlm_tpu.config import AnyResConfig

    tile = vision.image_size
    kwargs = {}
    grid = (1, 6)
    anyres_max = 9
    pinpoints = data.get("image_grid_pinpoints")
    if pinpoints:
        grid = (1, max(max(max(p) for p in pinpoints) // tile, 1))
    aspect = data.get("vision_aspect_ratio", data.get("image_aspect_ratio"))
    if isinstance(aspect, str):
        m = re.match(r"anyres_max_(\d+)", aspect)
        if m:
            anyres_max = int(m.group(1))
        kwargs["image_aspect_ratio"] = (
            aspect if aspect.startswith("anyres") or aspect in ("pad", "square")
            else "anyres_max_9"
        )
    anyres = AnyResConfig(tile_size=tile, grid_range=grid, anyres_max=anyres_max)
    return RadVLMConfig(vision=vision, text=text, anyres=anyres, **kwargs)
