"""SigLIP ViT vision tower, functional JAX (TPU-native rebuild).

Mirrors the reference tower's *contract* (`finetuning/llava/model/multimodal_encoder/
siglip_encoder.py:538-620`): SO400M patch14/384, run only the first 26 of the 27
pretrained encoder layers and skip the pooling head; the output is the full 729-token
hidden-state grid per 384x384 tile.

TPU-first details:
- patch embedding is a patchify-reshape + single matmul (identical math to the
  reference's strided conv, but lands directly on the MXU with no im2col);
- the encoder stack is scanned over stacked per-layer params, like the Qwen2 stack;
- attention runs through `radvlm_tpu.ops.attention.mha` (no padding inside a tile, so
  no mask is needed: every tile is exactly 729 tokens).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from radvlm_tpu.config import SigLIPConfig
from radvlm_tpu.ops.attention import layer_norm, mha

Params = Dict[str, Any]


def _dense(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def init_params(cfg: SigLIPConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 12)
    d, L = cfg.hidden_size, cfg.num_layers
    p = cfg.patch_size
    n_pos = cfg.tokens_per_tile

    def stack(shape, k):
        return _dense(k, (L,) + shape).astype(dtype)

    return {
        "patch_embed": {
            # [patch_h * patch_w * 3, d] — flattened-patch matmul form.
            "kernel": _dense(keys[0], (p * p * 3, d)).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "pos_embed": _dense(keys[1], (n_pos, d)).astype(dtype),
        "layers": {
            "ln1": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "ln2": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "attn": {
                "q": {"kernel": stack((d, d), keys[2]), "bias": jnp.zeros((L, d), dtype)},
                "k": {"kernel": stack((d, d), keys[3]), "bias": jnp.zeros((L, d), dtype)},
                "v": {"kernel": stack((d, d), keys[4]), "bias": jnp.zeros((L, d), dtype)},
                "o": {"kernel": stack((d, d), keys[5]), "bias": jnp.zeros((L, d), dtype)},
            },
            "mlp": {
                "fc1": {
                    "kernel": stack((d, cfg.intermediate_size), keys[6]),
                    "bias": jnp.zeros((L, cfg.intermediate_size), dtype),
                },
                "fc2": {
                    "kernel": stack((cfg.intermediate_size, d), keys[7]),
                    "bias": jnp.zeros((L, d), dtype),
                },
            },
        },
        # Final post_layernorm is part of the pretrained tower; the reference applies
        # it never (it takes hidden states *before* the dropped last layer's output
        # norm). We keep it in the pytree for checkpoint round-tripping but do not
        # apply it in forward().
        "post_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def fuse_projections(params: Params) -> Params:
    """Fuse the tower's per-layer q/k/v into one `qkv` projection (output-axis
    concat; per-output-channel int8 scales concatenate the same way, so
    quantization commutes with fusion). Inference-time transform mirroring
    `qwen2.fuse_projections`: one quantize-activations pass + one wide MXU
    launch instead of three D×D launches per layer (the tower runs 26 of
    them per image fill). Training / HF import-export keep the unfused
    layout."""
    from radvlm_tpu.ops.quant import Q_KEY, SCALE_KEY, is_qnode

    layers = params["layers"]
    attn = layers["attn"]
    if "qkv" in attn:  # already fused
        return params

    def cat(nodes):
        if is_qnode(nodes[0]):
            return {
                Q_KEY: jnp.concatenate([n[Q_KEY] for n in nodes], axis=-1),
                SCALE_KEY: jnp.concatenate([n[SCALE_KEY] for n in nodes], axis=-1),
            }
        return jnp.concatenate(nodes, axis=-1)

    qkv = {
        "kernel": cat([attn[k]["kernel"] for k in ("q", "k", "v")]),
        "bias": jnp.concatenate(
            [attn[k]["bias"] for k in ("q", "k", "v")], axis=-1
        ),
    }
    out = dict(params)
    out["layers"] = dict(layers)
    out["layers"]["attn"] = {"qkv": qkv, "o": attn["o"]}
    return out


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, (H/p)*(W/p), p*p*3], row-major patch order.

    Flattening order per patch matches a torch Conv2d kernel reshaped as
    [out, in_ch*kh*kw] -> we emit (kh, kw, in_ch) flattened as (in_ch, kh, kw)?  No:
    we emit patches flattened as (ph, pw, C) and the HF importer permutes the conv
    kernel to match (see models/hf_import.py).
    """
    b, h, w, c = pixels.shape
    gh, gw = h // patch, w // patch
    # Conv2d(stride=patch, kernel=patch) semantics: trailing pixels that don't fill
    # a full patch are dropped (384 % 14 == 6 for SO400M-p14-384 -> 27x27 patches).
    x = pixels[:, : gh * patch, : gw * patch, :]
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, C]
    return x.reshape(b, gh * gw, patch * patch * c)


def forward(
    params: Params,
    cfg: SigLIPConfig,
    pixels: jnp.ndarray,
    *,
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """pixels: [B, H, W, 3] normalized ((x/255 - 0.5) / 0.5). Returns [B, 729, D]."""
    if attn_impl == "ring":
        attn_impl = "auto"  # ring is for the seq-sharded LLM only; tiles are 729 tok
    x = patchify(pixels, cfg.patch_size)
    x = x @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    x = x + params["pos_embed"][None]

    eps = cfg.layer_norm_eps

    def body(carry, lp):
        # Quantized kernels route through quant.qmm per matmul site: tile
        # batches are thousands of rows, so int8 weights take the W8A8
        # int8-MXU path (1.6x the bf16 rate) instead of a dequant round trip.
        from radvlm_tpu.ops.quant import qmm

        x = carry
        res = x
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        b, s, d = y.shape
        h, hd = cfg.num_heads, cfg.head_dim
        if "qkv" in lp["attn"]:  # fused serving layout (fuse_projections)
            qkv = qmm(y, lp["attn"]["qkv"]["kernel"]) + lp["attn"]["qkv"]["bias"]
            q, k, v = (t.reshape(b, s, h, hd) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = (qmm(y, lp["attn"]["q"]["kernel"]) + lp["attn"]["q"]["bias"]).reshape(b, s, h, hd)
            k = (qmm(y, lp["attn"]["k"]["kernel"]) + lp["attn"]["k"]["bias"]).reshape(b, s, h, hd)
            v = (qmm(y, lp["attn"]["v"]["kernel"]) + lp["attn"]["v"]["bias"]).reshape(b, s, h, hd)
        attn = mha(q, k, v, causal=False, impl=attn_impl).reshape(b, s, d)
        x = res + qmm(attn, lp["attn"]["o"]["kernel"]) + lp["attn"]["o"]["bias"]
        res = x
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        y = qmm(y, lp["mlp"]["fc1"]["kernel"]) + lp["mlp"]["fc1"]["bias"]
        y = jax.nn.gelu(y, approximate=True)  # gelu_pytorch_tanh
        y = qmm(y, lp["mlp"]["fc2"]["kernel"]) + lp["mlp"]["fc2"]["bias"]
        x = res + y
        return x, None

    if remat:
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.nothing_saveable)
    x, _ = jax.lax.scan(body, x, params["layers"])
    # NOTE: no post-LN, no head — reference returns penultimate hidden states
    # (siglip_encoder.py:570-571,582).
    return x
