"""SigLIP qkv fusion parity: `siglip.fuse_projections` (serving layout) must
not change the tower's forward output, in bf16 and in the quantized (W8A8)
layout, and `radvlm.fuse_for_inference(params, cfg)` must only fuse towers
whose forward understands the fused layout (SigLIP — not CLIP/EVA, which
share the same param-tree shape)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.config import SigLIPConfig
from radvlm_tpu.models import siglip

TINY = SigLIPConfig(
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    image_size=56,
    patch_size=14,
)


def _pixels(batch=2):
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.uniform(-1, 1, size=(batch, TINY.image_size, TINY.image_size, 3)),
        jnp.float32,
    )


def test_fused_matches_unfused_bf16():
    params = siglip.init_params(TINY, jax.random.key(0), dtype=jnp.bfloat16)
    fused = siglip.fuse_projections(params)
    assert "qkv" in fused["layers"]["attn"] and "q" not in fused["layers"]["attn"]
    # idempotent
    assert siglip.fuse_projections(fused) is fused

    x = _pixels().astype(jnp.bfloat16)
    ref = siglip.forward(params, TINY, x, attn_impl="xla")
    got = siglip.forward(fused, TINY, x, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_fused_matches_unfused_quantized():
    from radvlm_tpu.ops.quant import quantize_params

    params = siglip.init_params(TINY, jax.random.key(1), dtype=jnp.float32)
    qparams = quantize_params({"vision_tower": params})["vision_tower"]
    fused = siglip.fuse_projections(qparams)
    qkv = fused["layers"]["attn"]["qkv"]["kernel"]
    # per-output-channel int8 scales concatenate with the kernels
    from radvlm_tpu.ops.quant import Q_KEY, SCALE_KEY, is_qnode

    assert is_qnode(qkv)
    L, d = TINY.num_layers, TINY.hidden_size
    assert qkv[Q_KEY].shape == (L, d, 3 * d)
    assert qkv[SCALE_KEY].shape[-1] == 3 * d

    x = _pixels()
    ref = siglip.forward(qparams, TINY, x, attn_impl="xla")
    got = siglip.forward(fused, TINY, x, attn_impl="xla")
    # int8 weights + shared activation quantization: fusion only widens the
    # output axis, so per-channel results are the same math.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fuse_for_inference_gates_on_tower_kind():
    import dataclasses

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.models import radvlm
    from radvlm_tpu.models.clip import CLIPVisionConfig

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(2), dtype=jnp.bfloat16)
    fused = radvlm.fuse_for_inference(params, cfg)
    assert "qkv" in fused["vision_tower"]["layers"]["attn"]

    # no cfg -> tower untouched (back-compat callers)
    fused_nocfg = radvlm.fuse_for_inference(params)
    assert "q" in fused_nocfg["vision_tower"]["layers"]["attn"]

    # CLIP kind shares tree shape but reads the unfused layout -> untouched
    clip_vision = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
        image_size=56,
        patch_size=14,
    )
    cfg_clip = dataclasses.replace(cfg, vision=clip_vision)
    params_clip = radvlm.init_params(cfg_clip, jax.random.key(3), dtype=jnp.bfloat16)
    fused_clip = radvlm.fuse_for_inference(params_clip, cfg_clip)
    assert "qkv" not in fused_clip["vision_tower"]["layers"]["attn"]
