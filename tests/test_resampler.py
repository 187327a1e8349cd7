"""Resampler family: spatial_pool / perceiver / masked_drop + model wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX, ResamplerConfig
from radvlm_tpu.models import multimodal, radvlm, resampler


def test_spatial_pool_shapes_and_average(rng):
    cfg = ResamplerConfig(kind="spatial_pool", stride=2)
    feats = jnp.asarray(rng.normal(size=(3, 16, 8)), jnp.float32)
    out = resampler.forward({}, cfg, feats)
    assert out.shape == (3, 4, 8)
    # top-left 2x2 block average
    grid = np.asarray(feats).reshape(3, 4, 4, 8)
    expect = grid[:, :2, :2].mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out[:, 0]), expect, rtol=1e-6)


def test_perceiver_output_and_determinism(rng):
    cfg = ResamplerConfig(kind="perceiver", depth=2, num_latents=8,
                          num_heads=2, head_dim=4, ff_mult=2)
    params = resampler.init_params(cfg, 16, jax.random.key(0))
    feats = jnp.asarray(rng.normal(size=(5, 36, 16)), jnp.float32)
    out = resampler.forward(params, cfg, feats)
    assert out.shape == (5, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    out2 = resampler.forward(params, cfg, feats)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different tiles -> different latent outputs (it actually attends)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_masked_drop_train_vs_infer(rng):
    cfg = ResamplerConfig(kind="masked_drop", drop_ratio=0.5)
    feats = jnp.asarray(rng.normal(size=(2, 16, 4)), jnp.float32)
    # inference: identity
    out = resampler.forward({}, cfg, feats)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))
    # training: keeps ceil(16 * 0.5) tokens, each an original token, order kept
    out = resampler.forward({}, cfg, feats, rng=jax.random.key(1), training=True)
    assert out.shape == (2, 8, 4)
    rows = {tuple(r) for r in np.asarray(feats[0]).round(5)}
    assert all(tuple(r) in rows for r in np.asarray(out[0]).round(5))


def test_perceiver_rejects_anyres():
    with pytest.raises(ValueError, match="spatial"):
        cfglib.RadVLMConfig(
            resampler=ResamplerConfig(kind="perceiver"),
            image_aspect_ratio="anyres_max_9",
        )


def test_model_end_to_end_with_perceiver(rng):
    base = cfglib.tiny_test_config()
    cfg = cfglib.RadVLMConfig(
        vision=base.vision, text=base.text, anyres=base.anyres,
        resampler=ResamplerConfig(kind="perceiver", depth=1, num_latents=6,
                                  num_heads=2, head_dim=4, ff_mult=2),
        image_aspect_ratio="pad",
    )
    assert cfg.tokens_per_tile == 6
    params = radvlm.init_params(cfg, jax.random.key(0))
    assert "resampler" in params

    img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=8))
    sample = multimodal.build_sample(ids, [img], cfg)
    # 6 latents + 1 newline token spliced into the prompt
    assert sample.num_image_tokens == 7
    batch = {
        k: jnp.asarray(v)
        for k, v in multimodal.collate([sample], pad_to_multiple=8).items()
    }
    logits, _ = radvlm.forward(params, cfg, batch, attn_impl="xla")
    assert np.isfinite(np.asarray(logits)).all()


def test_model_end_to_end_with_spatial_pool_anyres(rng):
    base = cfglib.tiny_test_config()
    cfg = cfglib.RadVLMConfig(
        vision=base.vision, text=base.text, anyres=base.anyres,
        resampler=ResamplerConfig(kind="spatial_pool", stride=2),
    )
    # 56px/14 -> 4x4 grid -> pooled 2x2 -> 4 tokens per tile
    assert cfg.tokens_per_tile == 4
    assert cfg.feature_grid_side == 2
    params = radvlm.init_params(cfg, jax.random.key(0))
    img = rng.integers(0, 255, size=(90, 60, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=8))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in multimodal.collate([sample], pad_to_multiple=8).items()
    }
    logits, _ = radvlm.forward(params, cfg, batch, attn_impl="xla")
    assert np.isfinite(np.asarray(logits)).all()
