"""CLIP ViT vision tower (+ S2 multi-scale wrapper), functional JAX.

Rebuild of the reference's selectable CLIP tower
(`finetuning/llava/model/multimodal_encoder/clip_encoder.py:1-173`): an OpenAI
CLIP ViT (`openai/clip-vit-large-patch14-336` class) evaluated at
`select_layer=-2` with `select_feature="patch"` (class token dropped), plus the
`CLIPVisionTowerS2` multi-scale variant (s2wrapper semantics: run the tower at
several scales, tile the larger scales into base-size crops, merge + resize the
feature grids back to base resolution and concatenate along channels).

Architecture differences vs SigLIP (`models/siglip.py`):
- a learned class embedding prepended to the patch sequence (dropped on output);
- patch conv has NO bias; learned position embeddings cover cls + patches;
- a pre-encoder LayerNorm (`pre_layrnorm` in the HF graph);
- quick_gelu activation (x * sigmoid(1.702 x)) instead of tanh-gelu;
- `num_layers` counts layers actually RUN: select_layer=-2 on a 24-layer
  pretrained tower means 23 (mirrors the SigLIP drop-last-layer convention).

TPU-first details match the SigLIP tower: patchify-matmul instead of a strided
conv, the encoder stack scanned over stacked per-layer params, attention through
`ops.attention.mha`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from radvlm_tpu.ops.attention import layer_norm, mha

Params = Dict[str, Any]

# HF CLIPImageProcessor normalization (openai/clip-vit-large-patch14-336).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP vision tower config (ViT-L/14-336 defaults, select_layer=-2)."""

    kind: str = "clip"
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23  # 24 pretrained layers, select_layer=-2 -> run 23
    num_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    # S2 scales (multiples of image_size); () disables S2. E.g. (336, 672, 1008).
    s2_scales: Tuple[int, ...] = ()
    mean: Tuple[float, float, float] = CLIP_MEAN
    std: Tuple[float, float, float] = CLIP_STD

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size  # 24

    @property
    def tokens_per_tile(self) -> int:
        return self.patches_per_side ** 2  # 576

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def feature_size(self) -> int:
        """Per-token output width (channels concat across S2 scales)."""
        return self.hidden_size * max(len(self.s2_scales), 1)


def _dense(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def init_params(cfg: CLIPVisionConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 12)
    d, L = cfg.hidden_size, cfg.num_layers
    p = cfg.patch_size
    n_pos = cfg.tokens_per_tile + 1  # cls + patches

    def stack(shape, k):
        return _dense(k, (L,) + shape).astype(dtype)

    return {
        "patch_embed": {
            # [p*p*3, d]; NO bias (HF CLIPVisionEmbeddings Conv2d(bias=False)).
            "kernel": _dense(keys[0], (p * p * 3, d)).astype(dtype),
        },
        "class_embed": _dense(keys[1], (d,)).astype(dtype),
        "pos_embed": _dense(keys[2], (n_pos, d)).astype(dtype),
        "pre_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": {
            "ln1": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "ln2": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
            "attn": {
                "q": {"kernel": stack((d, d), keys[3]), "bias": jnp.zeros((L, d), dtype)},
                "k": {"kernel": stack((d, d), keys[4]), "bias": jnp.zeros((L, d), dtype)},
                "v": {"kernel": stack((d, d), keys[5]), "bias": jnp.zeros((L, d), dtype)},
                "o": {"kernel": stack((d, d), keys[6]), "bias": jnp.zeros((L, d), dtype)},
            },
            "mlp": {
                "fc1": {
                    "kernel": stack((d, cfg.intermediate_size), keys[7]),
                    "bias": jnp.zeros((L, cfg.intermediate_size), dtype),
                },
                "fc2": {
                    "kernel": stack((cfg.intermediate_size, d), keys[8]),
                    "bias": jnp.zeros((L, d), dtype),
                },
            },
        },
    }


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _encode(params: Params, cfg: CLIPVisionConfig, pixels: jnp.ndarray,
            *, remat: bool, attn_impl: str) -> jnp.ndarray:
    """Single-scale encode: [B, S, S, 3] normalized -> [B, tokens_per_tile, D]."""
    from radvlm_tpu.models.siglip import patchify

    b = pixels.shape[0]
    x = patchify(pixels, cfg.patch_size) @ params["patch_embed"]["kernel"]
    cls = jnp.broadcast_to(
        params["class_embed"][None, None, :], (b, 1, cfg.hidden_size)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                   cfg.layer_norm_eps)

    eps = cfg.layer_norm_eps

    def body(carry, lp):
        # qmm per matmul site (quantized kernels take the W8A8 int8-MXU path
        # at tile-batch row counts; dense kernels pass through).
        from radvlm_tpu.ops.quant import qmm

        x = carry
        res = x
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        b, s, d = y.shape
        h, hd = cfg.num_heads, cfg.head_dim
        q = (qmm(y, lp["attn"]["q"]["kernel"]) + lp["attn"]["q"]["bias"]).reshape(b, s, h, hd)
        k = (qmm(y, lp["attn"]["k"]["kernel"]) + lp["attn"]["k"]["bias"]).reshape(b, s, h, hd)
        v = (qmm(y, lp["attn"]["v"]["kernel"]) + lp["attn"]["v"]["bias"]).reshape(b, s, h, hd)
        attn = mha(q, k, v, causal=False, impl=attn_impl).reshape(b, s, d)
        x = res + qmm(attn, lp["attn"]["o"]["kernel"]) + lp["attn"]["o"]["bias"]
        res = x
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        y = qmm(y, lp["mlp"]["fc1"]["kernel"]) + lp["mlp"]["fc1"]["bias"]
        y = quick_gelu(y)
        y = qmm(y, lp["mlp"]["fc2"]["kernel"]) + lp["mlp"]["fc2"]["bias"]
        x = res + y
        return x, None

    if remat:
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.nothing_saveable)
    x, _ = jax.lax.scan(body, x, params["layers"])
    # select_feature="patch": drop the class token; no post-LN (select_layer=-2
    # hidden states, before the final layer + norm — clip_encoder.py:24-33).
    return x[:, 1:, :]


def forward(
    params: Params,
    cfg: CLIPVisionConfig,
    pixels: jnp.ndarray,
    *,
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """pixels: [B, S, S, 3] normalized, S == image_size. Returns
    [B, tokens_per_tile, feature_size] (channels concat over S2 scales)."""
    if attn_impl == "ring":
        attn_impl = "auto"  # tiles are a fixed few hundred tokens; no seq sharding
    if not cfg.s2_scales:
        return _encode(params, cfg, pixels, remat=remat, attn_impl=attn_impl)
    return _forward_s2(params, cfg, pixels, remat=remat, attn_impl=attn_impl)


def _forward_s2(params, cfg, pixels, *, remat, attn_impl):
    """s2wrapper `multiscale_forward` semantics (clip_encoder.py:98-116):
    for each scale: bilinear-resize the input, split into base-size crops, run
    the tower batched, reassemble the crops' feature grids into one large grid,
    bilinear-resize back to the base grid, then concat scales channel-wise."""
    b = pixels.shape[0]
    base = cfg.image_size
    g = cfg.patches_per_side
    outs = []
    for scale in cfg.s2_scales:
        n = scale // base  # crops per side
        if scale != pixels.shape[1]:
            x = jax.image.resize(
                pixels, (b, scale, scale, pixels.shape[-1]), "bilinear"
            )
        else:
            x = pixels
        # [B, n, base, n, base, C] -> [B*n*n, base, base, C] (row-major crops)
        c = x.shape[-1]
        crops = x.reshape(b, n, base, n, base, c).transpose(0, 1, 3, 2, 4, 5)
        crops = crops.reshape(b * n * n, base, base, c)
        feats = _encode(params, cfg, crops, remat=remat, attn_impl=attn_impl)
        d = feats.shape[-1]
        # Reassemble crop grids: [B, n, n, g, g, D] -> [B, n*g, n*g, D]
        grid = feats.reshape(b, n, n, g, g, d).transpose(0, 1, 3, 2, 4, 5)
        grid = grid.reshape(b, n * g, n * g, d)
        if n > 1:
            grid = jax.image.resize(grid, (b, g, g, d), "bilinear")
        outs.append(grid.reshape(b, g * g, d))
    return jnp.concatenate(outs, axis=-1)
