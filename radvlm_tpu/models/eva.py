"""EVA-CLIP vision tower (EVA-02 / EVA-CLIP-8B families), functional JAX.

Rebuild of the reference's vendored `EVAVisionTransformer`
(`finetuning/llava/model/multimodal_encoder/dev_eva_clip/eva_clip/
eva_vit_model.py:366-571`) as wrapped by `EvaViTWrapper`
(`dev_eva_clip/eva_vit.py:105-118`): the wrapper calls
`forward_features(x, return_all_features=True)` — ALL blocks, NO final
norm/head — and drops the cls token (`feature_select`, "patch"). These are
the two tower branches the reference's builder keeps commented out
(`builder.py:31-34`); implemented here to close the tower zoo, with parity
tests against the vendored torch module run on CPU (tests/test_eva_parity.py).

Architecture knobs (per vendored `model_configs/*.json` + `model.py:68-94`):

- **subln** (EVA-02): separate q/k/v projections (weights bias-free; separate
  q_bias/v_bias params, k has none) + an extra LayerNorm after attention
  (`inner_attn_ln`) and inside the MLP (`ffn_ln`);
  without subln: one fused qkv weight, split at import.
- **naiveswiglu** (EVA-02): w2(x)*silu(w1(x)) -> ffn_ln -> w3;
  else a plain fc1 -> gelu -> (ffn_ln) -> fc2 MLP.
- **rope** (EVA-02): 2D axial rotary embedding over q/k patch tokens (cls
  excluded), interleaved-pair rotation, frequencies per
  `rope.VisionRotaryEmbeddingFast` (`rope.py:83-113`) including the
  `intp_freq` fine-tune interpolation (t = arange(ft)/ft*pt).
- **postnorm** (EVA-01 variants): norm after the sublayer instead of before.
- **rms norm** (EVA-CLIP-8B): T5-style weight-only RMSNorm (`model.py:38-58`).
- **layerscale** (`ls_init_value` -> gamma_1/gamma_2 per block).

TPU-first details match the other towers: patchify-matmul stem, scanned
stacked per-layer params, `ops.attention.mha`, `qmm` at every matmul site.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radvlm_tpu.ops.attention import layer_norm, mha, rms_norm

Params = Dict[str, Any]

# EVA transforms normalize with the OpenAI CLIP stats
# (`eva_clip/constants.py` OPENAI_DATASET_MEAN/STD).
EVA_MEAN = (0.48145466, 0.4578275, 0.40821073)
EVA_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class EVAVisionConfig:
    """EVA ViT config (EVA02-CLIP-L-14-336 defaults)."""

    kind: str = "eva"
    hidden_size: int = 1024
    head_dim: int = 64
    num_layers: int = 24
    intermediate_size: int = 2730  # int(width * mlp_ratio), torch truncation
    image_size: int = 336
    patch_size: int = 14
    qkv_bias: bool = True
    subln: bool = True
    swiglu: bool = True
    postnorm: bool = False
    rope: bool = True
    rope_pt_seq_len: int = 16  # pretrain grid side (224/14)
    rope_intp_freq: bool = True
    norm: str = "layernorm"  # "layernorm" | "rms" (EVA-CLIP-8B)
    ls_init_value: Optional[float] = None  # layerscale (gamma_1/gamma_2)
    layer_norm_eps: float = 1e-6
    mean: Tuple[float, float, float] = EVA_MEAN
    std: Tuple[float, float, float] = EVA_STD

    @property
    def num_heads(self) -> int:
        return self.hidden_size // self.head_dim

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def tokens_per_tile(self) -> int:
        return self.patches_per_side ** 2  # cls dropped ("patch")

    @property
    def feature_size(self) -> int:
        return self.hidden_size


def rope_tables(cfg: EVAVisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) [grid*grid, head_dim] — `VisionRotaryEmbeddingFast` tables:
    per-axis angles over dim = head_dim//2 (each frequency duplicated for the
    interleaved pair), row and column halves concatenated (`rope.py:84-111`,
    broadcat of freqs[:,None] and freqs[None,:])."""
    dim = cfg.head_dim // 2
    pt = cfg.rope_pt_seq_len
    ft = cfg.patches_per_side if cfg.rope_intp_freq else pt
    t = np.arange(ft, dtype=np.float64) / ft * pt
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    f = np.einsum("i,j->ij", t, freqs)  # [ft, dim//2]
    f = np.repeat(f, 2, axis=-1)  # interleaved pairs -> [ft, dim]
    full = np.concatenate(
        [
            np.broadcast_to(f[:, None, :], (ft, ft, f.shape[-1])),
            np.broadcast_to(f[None, :, :], (ft, ft, f.shape[-1])),
        ],
        axis=-1,
    ).reshape(ft * ft, 2 * f.shape[-1])  # row-major grid, [S, head_dim]
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation (`rope.py:25-29`): (x0, x1) -> (-x1, x0)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x = jnp.stack([-x[..., 1], x[..., 0]], axis=-1)
    return x.reshape(*x.shape[:-2], -1)


def _norm(cfg: EVAVisionConfig, x, p):
    if cfg.norm == "rms":
        return rms_norm(x, p["scale"], cfg.layer_norm_eps)
    return layer_norm(x, p["scale"], p.get("bias"), cfg.layer_norm_eps)


def _dense(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def init_params(cfg: EVAVisionConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 16)
    d, L, p, f = cfg.hidden_size, cfg.num_layers, cfg.patch_size, cfg.intermediate_size

    def stack(shape, k):
        return _dense(k, (L,) + shape).astype(dtype)

    def norm_stack():
        n = {"scale": jnp.ones((L, d), dtype)}
        if cfg.norm != "rms":
            n["bias"] = jnp.zeros((L, d), dtype)
        return n

    def norm_stack_f():
        n = {"scale": jnp.ones((L, f), dtype)}
        if cfg.norm != "rms":
            n["bias"] = jnp.zeros((L, f), dtype)
        return n

    params: Params = {
        "patch_embed": {
            "kernel": _dense(keys[0], (p * p * 3, d)).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "class_embed": _dense(keys[1], (d,)).astype(dtype),
        "pos_embed": _dense(keys[2], (cfg.tokens_per_tile + 1, d)).astype(dtype),
        "layers": {
            "ln1": norm_stack(),
            "ln2": norm_stack(),
            "attn": {
                "q": {"kernel": stack((d, d), keys[3])},
                "k": {"kernel": stack((d, d), keys[4])},
                "v": {"kernel": stack((d, d), keys[5])},
                "o": {"kernel": stack((d, d), keys[6]),
                      "bias": jnp.zeros((L, d), dtype)},
            },
        },
    }
    if cfg.qkv_bias:
        params["layers"]["attn"]["q"]["bias"] = jnp.zeros((L, d), dtype)
        params["layers"]["attn"]["v"]["bias"] = jnp.zeros((L, d), dtype)
    if cfg.subln:
        params["layers"]["attn"]["inner_ln"] = norm_stack()
    if cfg.swiglu:
        params["layers"]["mlp"] = {
            "w1": {"kernel": stack((d, f), keys[7]), "bias": jnp.zeros((L, f), dtype)},
            "w2": {"kernel": stack((d, f), keys[8]), "bias": jnp.zeros((L, f), dtype)},
            "w3": {"kernel": stack((f, d), keys[9]), "bias": jnp.zeros((L, d), dtype)},
        }
    else:
        params["layers"]["mlp"] = {
            "fc1": {"kernel": stack((d, f), keys[7]), "bias": jnp.zeros((L, f), dtype)},
            "fc2": {"kernel": stack((f, d), keys[8]), "bias": jnp.zeros((L, d), dtype)},
        }
    if cfg.subln:
        params["layers"]["mlp"]["ffn_ln"] = norm_stack_f()
    if cfg.ls_init_value is not None:
        params["layers"]["gamma_1"] = jnp.full((L, d), cfg.ls_init_value, dtype)
        params["layers"]["gamma_2"] = jnp.full((L, d), cfg.ls_init_value, dtype)
    return params


def forward(
    params: Params,
    cfg: EVAVisionConfig,
    pixels: jnp.ndarray,
    *,
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """pixels: [B, S, S, 3] normalized -> [B, tokens_per_tile, hidden_size]
    (final-layer tokens, cls dropped, no final norm — the EvaViTWrapper
    `return_all_features=True` + "patch" contract)."""
    from radvlm_tpu.models.siglip import patchify
    from radvlm_tpu.ops.quant import qmm

    if attn_impl == "ring":
        attn_impl = "auto"
    b = pixels.shape[0]
    x = (patchify(pixels, cfg.patch_size) @ params["patch_embed"]["kernel"]
         + params["patch_embed"]["bias"])
    cls = jnp.broadcast_to(
        params["class_embed"][None, None, :], (b, 1, cfg.hidden_size)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]

    if cfg.rope:
        cos_np, sin_np = rope_tables(cfg)
        rope_cos = jnp.asarray(cos_np, x.dtype)
        rope_sin = jnp.asarray(sin_np, x.dtype)
    scale = cfg.head_dim ** -0.5

    def attend(lp, y):
        bb, s, d = y.shape
        h, hd = cfg.num_heads, cfg.head_dim
        q = qmm(y, lp["attn"]["q"]["kernel"])
        k = qmm(y, lp["attn"]["k"]["kernel"])
        v = qmm(y, lp["attn"]["v"]["kernel"])
        if cfg.qkv_bias:
            q = q + lp["attn"]["q"]["bias"]
            v = v + lp["attn"]["v"]["bias"]
        q = q.reshape(bb, s, h, hd)
        k = k.reshape(bb, s, h, hd)
        v = v.reshape(bb, s, h, hd)
        if cfg.rope:
            # rotate patch tokens only; cls (index 0) passes through
            # (`eva_vit_model.py:186-193`)
            def rot(t):
                body = t[:, 1:] * rope_cos[None, :, None, :] + _rotate_half(
                    t[:, 1:]
                ) * rope_sin[None, :, None, :]
                return jnp.concatenate([t[:, :1], body], axis=1)

            q, k = rot(q), rot(k)
        attn = mha(q, k, v, causal=False, impl=attn_impl,
                   scale=scale).reshape(bb, s, d)
        if cfg.subln:
            attn = _norm(cfg, attn, lp["attn"]["inner_ln"])
        return qmm(attn, lp["attn"]["o"]["kernel"]) + lp["attn"]["o"]["bias"]

    def feed(lp, y):
        m = lp["mlp"]
        if cfg.swiglu:
            hid = jax.nn.silu(qmm(y, m["w1"]["kernel"]) + m["w1"]["bias"]) * (
                qmm(y, m["w2"]["kernel"]) + m["w2"]["bias"]
            )
            if cfg.subln:
                hid = _norm(cfg, hid, m["ffn_ln"])
            return qmm(hid, m["w3"]["kernel"]) + m["w3"]["bias"]
        hid = jax.nn.gelu(qmm(y, m["fc1"]["kernel"]) + m["fc1"]["bias"],
                          approximate=False)
        if cfg.subln:
            hid = _norm(cfg, hid, m["ffn_ln"])
        return qmm(hid, m["fc2"]["kernel"]) + m["fc2"]["bias"]

    def body(carry, lp):
        x = carry
        g1 = lp.get("gamma_1")
        g2 = lp.get("gamma_2")
        if cfg.postnorm:
            a = _norm(cfg, attend(lp, x), lp["ln1"])
            x = x + (a if g1 is None else g1 * a)
            mo = _norm(cfg, feed(lp, x), lp["ln2"])
            x = x + (mo if g2 is None else g2 * mo)
        else:
            a = attend(lp, _norm(cfg, x, lp["ln1"]))
            x = x + (a if g1 is None else g1 * a)
            mo = feed(lp, _norm(cfg, x, lp["ln2"]))
            x = x + (mo if g2 is None else g2 * mo)
        return x, None

    if remat:
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.nothing_saveable)
    x, _ = jax.lax.scan(body, x, params["layers"])
    return x[:, 1:, :]
