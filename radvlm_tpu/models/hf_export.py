"""HF checkpoint export: radvlm_tpu param pytrees -> HF-layout safetensors.

Reverse of `models/hf_import.py`, covering the reference converter's role
(`radvlm/evaluation/convert_llava_onevision_weights_to_hf.py`): after training
here, weights export to the converted HF `LlavaOnevisionForConditionalGeneration`
layout (`language_model.model.*`, `vision_tower.vision_model.*`,
`multi_modal_projector.linear_{1,2}.*`, `image_newline`) so HF transformers can
load and verify them. Round-trip (export -> import) is tested bit-exact.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import numpy as np

from radvlm_tpu.config import RadVLMConfig


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _lin(kernel) -> np.ndarray:
    """Our [in, out] kernel -> HF Linear weight [out, in]."""
    return np.ascontiguousarray(_np(kernel).T)


def export_mpt(params: Mapping[str, Any], prefix: str = "transformer.") -> Dict[str, np.ndarray]:
    """MPT family export (HF MptForCausalLM layout): q/k/v re-fused into
    Wqkv, weight-only LayerNorms, non-gated ffn; lm_head is tied to wte.
    Round-trips bit-exact with `hf_import._import_mpt`."""
    out: Dict[str, np.ndarray] = {}
    out[prefix + "wte.weight"] = _np(params["embed"]["embedding"])
    lp = params["layers"]
    L = lp["ln1"].shape[0]
    for i in range(L):
        p = f"{prefix}blocks.{i}."
        out[p + "norm_1.weight"] = _np(lp["ln1"][i])
        out[p + "norm_2.weight"] = _np(lp["ln2"][i])
        wqkv = np.concatenate(
            [_np(lp["attn"][n]["kernel"][i]) for n in ("q", "k", "v")], axis=-1
        )  # [d, 3d]
        out[p + "attn.Wqkv.weight"] = np.ascontiguousarray(wqkv.T)
        out[p + "attn.out_proj.weight"] = _lin(lp["attn"]["o"]["kernel"][i])
        out[p + "ffn.up_proj.weight"] = _lin(lp["mlp"]["up"]["kernel"][i])
        out[p + "ffn.down_proj.weight"] = _lin(lp["mlp"]["down"]["kernel"][i])
    out[prefix + "norm_f.weight"] = _np(params["norm"])
    return out


def export_qwen2(params: Mapping[str, Any], prefix: str = "language_model.model.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    out[prefix + "embed_tokens.weight"] = _np(params["embed"]["embedding"])
    lp = params["layers"]
    L = lp["ln1"].shape[0]
    for i in range(L):
        p = f"{prefix}layers.{i}."
        out[p + "input_layernorm.weight"] = _np(lp["ln1"][i])
        out[p + "post_attention_layernorm.weight"] = _np(lp["ln2"][i])
        for name in ("q", "k", "v"):
            out[p + f"self_attn.{name}_proj.weight"] = _lin(lp["attn"][name]["kernel"][i])
            if "bias" in lp["attn"][name]:  # absent for the Llama family
                out[p + f"self_attn.{name}_proj.bias"] = _np(lp["attn"][name]["bias"][i])
        out[p + "self_attn.o_proj.weight"] = _lin(lp["attn"]["o"]["kernel"][i])
        if "moe" in lp["mlp"]:
            # Shared-expert presence picks the HF layout: Qwen2MoE
            # (`mlp.gate` + `*_proj` experts + shared expert) vs Mixtral
            # (`block_sparse_moe.gate` + w1/w3/w2 experts, no shared).
            moe = lp["mlp"]["moe"]
            mixtral = "shared" not in moe
            moe_p = "block_sparse_moe." if mixtral else "mlp."
            names = ("w1", "w3", "w2") if mixtral else (
                "gate_proj", "up_proj", "down_proj"
            )
            out[p + moe_p + "gate.weight"] = _lin(moe["router"]["kernel"][i])
            n_exp = moe["experts"]["gate"].shape[1]
            for e in range(n_exp):
                ep = p + f"{moe_p}experts.{e}."
                out[ep + f"{names[0]}.weight"] = _lin(moe["experts"]["gate"][i, e])
                out[ep + f"{names[1]}.weight"] = _lin(moe["experts"]["up"][i, e])
                out[ep + f"{names[2]}.weight"] = _lin(moe["experts"]["down"][i, e])
            if not mixtral:
                sh = moe["shared"]
                out[p + "mlp.shared_expert.gate_proj.weight"] = _lin(sh["gate"]["kernel"][i])
                out[p + "mlp.shared_expert.up_proj.weight"] = _lin(sh["up"]["kernel"][i])
                out[p + "mlp.shared_expert.down_proj.weight"] = _lin(sh["down"]["kernel"][i])
                out[p + "mlp.shared_expert_gate.weight"] = _lin(moe["shared_gate"]["kernel"][i])
        else:
            out[p + "mlp.gate_proj.weight"] = _lin(lp["mlp"]["gate"]["kernel"][i])
            out[p + "mlp.up_proj.weight"] = _lin(lp["mlp"]["up"]["kernel"][i])
            out[p + "mlp.down_proj.weight"] = _lin(lp["mlp"]["down"]["kernel"][i])
    out[prefix + "norm.weight"] = _np(params["norm"])
    if "lm_head" in params:
        head_prefix = prefix.replace(".model.", ".")
        out[head_prefix + "lm_head.weight"] = _lin(params["lm_head"]["kernel"])
    return out


def export_siglip(
    params: Mapping[str, Any],
    cfg: RadVLMConfig,
    prefix: str = "vision_tower.vision_model.",
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    vis = cfg.vision
    p_sz = vis.patch_size
    kernel = _np(params["patch_embed"]["kernel"])  # [(p*p*3), D]
    d = kernel.shape[1]
    conv = kernel.reshape(p_sz, p_sz, 3, d).transpose(3, 2, 0, 1)  # [D, C, p, p]
    out[prefix + "embeddings.patch_embedding.weight"] = np.ascontiguousarray(conv)
    out[prefix + "embeddings.patch_embedding.bias"] = _np(params["patch_embed"]["bias"])
    out[prefix + "embeddings.position_embedding.weight"] = _np(params["pos_embed"])
    lp = params["layers"]
    L = lp["ln1"]["scale"].shape[0]
    for i in range(L):
        p = f"{prefix}encoder.layers.{i}."
        out[p + "layer_norm1.weight"] = _np(lp["ln1"]["scale"][i])
        out[p + "layer_norm1.bias"] = _np(lp["ln1"]["bias"][i])
        out[p + "layer_norm2.weight"] = _np(lp["ln2"]["scale"][i])
        out[p + "layer_norm2.bias"] = _np(lp["ln2"]["bias"][i])
        for name, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                         ("o", "out_proj")):
            out[p + f"self_attn.{hf}.weight"] = _lin(lp["attn"][name]["kernel"][i])
            out[p + f"self_attn.{hf}.bias"] = _np(lp["attn"][name]["bias"][i])
        out[p + "mlp.fc1.weight"] = _lin(lp["mlp"]["fc1"]["kernel"][i])
        out[p + "mlp.fc1.bias"] = _np(lp["mlp"]["fc1"]["bias"][i])
        out[p + "mlp.fc2.weight"] = _lin(lp["mlp"]["fc2"]["kernel"][i])
        out[p + "mlp.fc2.bias"] = _np(lp["mlp"]["fc2"]["bias"][i])
    out[prefix + "post_layernorm.weight"] = _np(params["post_ln"]["scale"])
    out[prefix + "post_layernorm.bias"] = _np(params["post_ln"]["bias"])
    return out


def export_radvlm(params: Mapping[str, Any], cfg: RadVLMConfig) -> Dict[str, np.ndarray]:
    state = {}
    state.update(export_qwen2(params["text"]))
    state.update(export_siglip(params["vision_tower"], cfg))
    for i in range(cfg.projector.mlp_depth):
        state[f"multi_modal_projector.linear_{i + 1}.weight"] = _lin(
            params["projector"][f"fc{i}"]["kernel"]
        )
        state[f"multi_modal_projector.linear_{i + 1}.bias"] = _np(
            params["projector"][f"fc{i}"]["bias"]
        )
    state["image_newline"] = _np(params["image_newline"])
    return state


def resize_vocab_for_hf(
    state: Dict[str, np.ndarray],
    *,
    extra_tokens: int = 2,
    pad_to_multiple: int = 64,
    seed: int = 0,
) -> int:
    """Grow the embedding (and untied lm_head) for HF processor compatibility.

    The reference converter adds `<image>` and `<video>` token rows and pads the
    vocab to a multiple of 64, initializing new rows from a multivariate normal
    fit (mean + covariance * 1e-5) of the existing embedding
    (`convert_llava_onevision_weights_to_hf.py:158-180`). Without these rows an
    exported checkpoint cannot be driven by stock HF LLaVA-OV processors (the
    processor emits the new token ids).

    Mutates `state` in place; returns the new vocab size.
    """
    rng = np.random.default_rng(seed)

    def grow(key: str, n_new: int):
        orig_dtype = state[key].dtype
        w = state[key].astype(np.float32)
        mu = w.mean(axis=0)
        centered = w - mu
        # covariance of the rows (d x d), scaled down as in the reference
        sigma = (centered.T @ centered) / max(w.shape[0] - 1, 1)
        d = w.shape[1]
        chol = np.linalg.cholesky(
            sigma * 1e-5 + np.eye(d, dtype=np.float32) * 1e-12
        )
        new_rows = mu + rng.standard_normal((n_new, d)).astype(np.float32) @ chol.T
        # back to the CHECKPOINT dtype (w.dtype here is the f32 working copy;
        # using it stored grown embeddings as f32 in an otherwise-f16 file)
        state[key] = np.concatenate([w, new_rows], axis=0).astype(orig_dtype)

    embed_key = "language_model.model.embed_tokens.weight"
    vocab = state[embed_key].shape[0]
    target = vocab + extra_tokens
    target = -(-target // pad_to_multiple) * pad_to_multiple
    n_new = target - vocab
    if n_new > 0:
        grow(embed_key, n_new)
        head_key = "language_model.lm_head.weight"
        if head_key in state:
            grow(head_key, n_new)
    return target


def save_safetensors(state: Dict[str, np.ndarray], path: str) -> None:
    """Write one model.safetensors (+ config stub) into `path`."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    # safetensors.numpy rejects ml_dtypes bfloat16 arrays in some versions;
    # upcast those to float32 for portability.
    clean = {}
    for k, v in state.items():
        if v.dtype.kind not in "fiu":
            v = v.astype(np.float32)
        elif v.dtype.itemsize == 2 and v.dtype.kind == "f" and v.dtype.name == "bfloat16":
            v = v.astype(np.float32)
        clean[k] = v
    save_file(clean, os.path.join(path, "model.safetensors"))


def save_radvlm_hf(params, cfg: RadVLMConfig, path: str,
                   *, resize_vocab: bool = False) -> None:
    """Write an HF-loadable LLaVA-OneVision checkpoint directory.

    resize_vocab=True applies the reference converter's +2-token (<image>,
    <video>) pad-to-64 growth so stock HF processors can drive the checkpoint;
    image/video token ids are then the first two new rows.
    """
    state = export_radvlm(params, cfg)
    vocab = cfg.text.vocab_size
    image_token_index = video_token_index = None
    if resize_vocab:
        resize_vocab_for_hf(state)
        image_token_index, video_token_index = vocab, vocab + 1
        vocab = state["language_model.model.embed_tokens.weight"].shape[0]
    save_safetensors(state, path)
    config = {
        "architectures": ["LlavaOnevisionForConditionalGeneration"],
        "model_type": "llava_onevision",
        "projector_hidden_act": "gelu",
        "vision_feature_select_strategy": "full",
        "vision_feature_layer": -1,
        "vision_aspect_ratio": cfg.image_aspect_ratio,
        "image_token_index": image_token_index,
        "video_token_index": video_token_index,
        "tie_word_embeddings": cfg.text.tie_word_embeddings,
        "text_config": {
            "model_type": "qwen2_moe" if cfg.text.num_experts else "qwen2",
            "vocab_size": vocab,
            "hidden_size": cfg.text.hidden_size,
            "intermediate_size": cfg.text.intermediate_size,
            "num_hidden_layers": cfg.text.num_layers,
            "num_attention_heads": cfg.text.num_heads,
            "num_key_value_heads": cfg.text.num_kv_heads,
            "head_dim": cfg.text.head_dim,
            "rope_theta": cfg.text.rope_theta,
            "rms_norm_eps": cfg.text.rms_norm_eps,
            "tie_word_embeddings": cfg.text.tie_word_embeddings,
            "max_position_embeddings": cfg.text.max_position_embeddings,
            # MoE fields (weights export under mlp.experts.*/mlp.gate; the
            # config must agree or HF instantiates a dense decoder)
            **({
                "num_experts": cfg.text.num_experts,
                "num_experts_per_tok": cfg.text.num_experts_per_tok,
                "moe_intermediate_size": cfg.text.moe_intermediate_size,
                "shared_expert_intermediate_size":
                    cfg.text.shared_expert_intermediate_size,
                "norm_topk_prob": cfg.text.norm_topk_prob,
                "decoder_sparse_step": 1,
                "mlp_only_layers": [],
            } if cfg.text.num_experts else {}),
        },
        "vision_config": {
            "model_type": "siglip_vision_model",
            "hidden_size": cfg.vision.hidden_size,
            "intermediate_size": cfg.vision.intermediate_size,
            "num_hidden_layers": cfg.vision.num_layers,
            "num_attention_heads": cfg.vision.num_heads,
            "image_size": cfg.vision.image_size,
            "patch_size": cfg.vision.patch_size,
            "vision_use_head": False,
        },
        "image_grid_pinpoints": [list(p) for p in cfg.anyres.pinpoints],
    }
    config = {k: v for k, v in config.items() if v is not None}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
