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


@pytest.mark.slow
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
    feats = jnp.asarray(rng.normal(size=(2, 64, 4)) + 3.0, jnp.float32)
    # inference: identity
    out = resampler.forward({}, cfg, feats)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))
    # training: shape preserved (static-shape zero-mask adaptation of the
    # reference's token removal); each token either intact or zeroed
    out = np.asarray(
        resampler.forward({}, cfg, feats, rng=jax.random.key(1), training=True)
    )
    assert out.shape == (2, 64, 4)
    zeroed = (out == 0).all(axis=-1)
    kept = ~zeroed
    assert 0.2 < zeroed.mean() < 0.8  # ~drop_ratio of tokens zeroed
    np.testing.assert_array_equal(out[kept], np.asarray(feats)[kept])


@pytest.mark.slow
def test_masked_drop_active_in_train_step(rng):
    """The train step actually applies masked_drop (code-review finding: the
    rng was never plumbed, so training silently ran with 0% drop)."""
    import dataclasses

    import optax

    from radvlm_tpu.models import radvlm as radvlm_mod
    from radvlm_tpu.parallel import sharding as shardlib
    from radvlm_tpu.parallel.mesh import make_mesh
    from radvlm_tpu.training.train_step import init_train_state, make_train_step

    base = cfglib.tiny_test_config()
    cfg = dataclasses.replace(
        base, resampler=ResamplerConfig(kind="masked_drop", drop_ratio=0.9)
    )
    params = radvlm_mod.init_params(cfg, jax.random.key(0))
    mesh = make_mesh({"fsdp": -1})

    img = rng.integers(0, 255, size=(64, 56, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=12))
    sample = multimodal.build_sample(ids, [img], cfg, labels=None)
    batch = multimodal.collate([sample] * 8, pad_to_multiple=128)
    batch["labels"] = batch["tokens"]

    tx = optax.adam(1e-3)
    with mesh:
        state = init_train_state(mesh, params, tx)
        step = make_train_step(cfg, tx, remat=False, attn_impl="xla")
        db = {
            k: jax.device_put(
                jnp.asarray(v), shardlib.batch_shardings(mesh, {k: v})[k]
            )
            for k, v in batch.items()
        }
        # same batch through the PLAIN loss (no rng) BEFORE the step (the
        # step donates state.params, which alias `params` on a 1-device put)
        plain, _ = radvlm_mod.loss_fn(
            params, cfg, {k: jnp.asarray(v) for k, v in batch.items()},
            remat=False, attn_impl="xla",
        )
        plain = float(plain)
        _, m1 = step(state, db)
        # a 90% token drop must move the loss vs the drop-free forward
        assert abs(float(m1["loss"]) - plain) > 1e-6


def test_perceiver_rejects_anyres():
    with pytest.raises(ValueError, match="spatial"):
        cfglib.RadVLMConfig(
            resampler=ResamplerConfig(kind="perceiver"),
            image_aspect_ratio="anyres_max_9",
        )


@pytest.mark.slow
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
