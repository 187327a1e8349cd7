"""ImageBind vision tower (functional JAX), the `imagebind_huge` branch of the
reference's tower dispatch.

Rebuild of `finetuning/llava/model/multimodal_encoder/imagebind.py:14-73` +
`builder.py:26-27`: the reference wraps the external `imagebind` package's
vision pipeline and returns the joint-space embedding as a single pooled
token ([B, 1, 1024] — `imagebind.py:49-56`). Vision-only: the wrapper's
audio path (dict input with "audios") is never reachable from RadVLM's image
datasets and is out of scope; `forward` takes pixels only.

Pipeline (public ImageBind-huge vision branch):

- stem: images are padded to 2 identical frames and patchified by a
  Conv3d(kernel=(2, 14, 14), stride=same, bias=False). For still images the
  two temporal taps see the SAME frame, so the 3D conv collapses EXACTLY to a
  2D patchify-matmul with the temporal taps summed — the TPU-native stem is
  that collapsed matmul (`collapse_video_stem`), mathematically identical
  (test: tests/test_towers.py::test_imagebind_stem_collapse).
- cls token + learned pos embeddings (257 = 1 + (224/14)^2), pre-LN,
  32 pre-norm blocks (width 1280, 16 heads, mlp ratio 4, exact GELU),
- head: LayerNorm -> select cls -> Linear(1280 -> 1024, no bias),
- postprocess: L2 normalize over the feature dim.

Output: [B, 1, 1024] — one joint-embedding token per image, matching the
reference wrapper's `vision_embedding.unsqueeze(1)` contract. Weight import:
`hf_import.import_imagebind` follows the public checkpoint layout
(modality_preprocessors/trunks/heads.vision.*); golden parity is
weight-blocked in this environment (no egress), like the other towers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from radvlm_tpu.ops.attention import layer_norm, mha

Params = Dict[str, Any]

# The imagebind preprocessor normalizes with the CLIP stats.
IMAGEBIND_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGEBIND_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ImageBindVisionConfig:
    """imagebind_huge vision trunk + head."""

    kind: str = "imagebind"
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1024  # joint embedding space (head output)
    layer_norm_eps: float = 1e-6
    mean = IMAGEBIND_MEAN
    std = IMAGEBIND_STD

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size  # 16

    @property
    def tokens_per_tile(self) -> int:
        # ONE pooled joint-space token per image (reference wrapper contract:
        # `vision_embedding.unsqueeze(1)`, imagebind.py:53).
        return 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def feature_size(self) -> int:
        return self.embed_dim


def collapse_video_stem(conv3d_kernel) -> jnp.ndarray:
    """[D, C, T, p, p] Conv3d kernel -> [p*p*C, D] patchify matmul kernel for
    still images: every temporal tap sees the same (repeated) frame, so the
    taps sum. Inverse check lives in the stem-collapse test."""
    import numpy as np

    w = np.asarray(conv3d_kernel).sum(axis=2)  # [D, C, p, p]
    d = w.shape[0]
    return np.transpose(w, (2, 3, 1, 0)).reshape(-1, d)  # [p*p*C, D]


def _dense(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def init_params(cfg: ImageBindVisionConfig, key: jax.Array,
                dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 12)
    d, L, p = cfg.hidden_size, cfg.num_layers, cfg.patch_size
    n_pos = cfg.patches_per_side ** 2 + 1

    def stack(shape, k):
        return _dense(k, (L,) + shape).astype(dtype)

    return {
        "patch_embed": {"kernel": _dense(keys[0], (p * p * 3, d)).astype(dtype)},
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
        "head": {
            "ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "proj": {"kernel": _dense(keys[9], (d, cfg.embed_dim)).astype(dtype)},
        },
    }


def forward(
    params: Params,
    cfg: ImageBindVisionConfig,
    pixels: jnp.ndarray,
    *,
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """pixels: [B, S, S, 3] normalized -> [B, 1, embed_dim] L2-normalized
    joint-space embedding (the reference wrapper's pooled-token contract)."""
    from radvlm_tpu.models.siglip import patchify
    from radvlm_tpu.ops.quant import qmm

    if attn_impl == "ring":
        attn_impl = "auto"
    b = pixels.shape[0]
    x = patchify(pixels, cfg.patch_size) @ params["patch_embed"]["kernel"]
    cls = jnp.broadcast_to(
        params["class_embed"][None, None, :], (b, 1, cfg.hidden_size)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
    eps = cfg.layer_norm_eps
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], eps)

    def body(carry, lp):
        x = carry
        res = x
        y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
        bb, s, d = y.shape
        h, hd = cfg.num_heads, cfg.head_dim
        q = (qmm(y, lp["attn"]["q"]["kernel"]) + lp["attn"]["q"]["bias"]).reshape(bb, s, h, hd)
        k = (qmm(y, lp["attn"]["k"]["kernel"]) + lp["attn"]["k"]["bias"]).reshape(bb, s, h, hd)
        v = (qmm(y, lp["attn"]["v"]["kernel"]) + lp["attn"]["v"]["bias"]).reshape(bb, s, h, hd)
        attn = mha(q, k, v, causal=False, impl=attn_impl).reshape(bb, s, d)
        x = res + qmm(attn, lp["attn"]["o"]["kernel"]) + lp["attn"]["o"]["bias"]
        res = x
        y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
        y = qmm(y, lp["mlp"]["fc1"]["kernel"]) + lp["mlp"]["fc1"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = qmm(y, lp["mlp"]["fc2"]["kernel"]) + lp["mlp"]["fc2"]["bias"]
        x = res + y
        return x, None

    if remat:
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.nothing_saveable)
    x, _ = jax.lax.scan(body, x, params["layers"])
    # head: ln -> cls token -> project to the joint space; L2 normalize
    # (imagebind_huge's vision postprocessor).
    h = layer_norm(x, params["head"]["ln"]["scale"], params["head"]["ln"]["bias"], eps)
    pooled = h[:, 0, :] @ params["head"]["proj"]["kernel"]
    pooled = pooled / jnp.maximum(
        jnp.linalg.norm(pooled.astype(jnp.float32), axis=-1, keepdims=True), 1e-8
    ).astype(pooled.dtype)
    return pooled[:, None, :]
