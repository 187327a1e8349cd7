"""CLIP tower parity vs HF transformers CLIPVisionModel + S2 wrapper semantics.

Contract (`finetuning/llava/model/multimodal_encoder/clip_encoder.py:24-33`):
select_layer=-2 -> our tower with num_layers=N matches HF hidden_states[-2] of
an (N+1)-layer tower; select_feature="patch" drops the class token. The S2
variant (`clip_encoder.py:98-173`) concatenates per-scale feature grids
channel-wise after resizing back to the base grid.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.models import hf_import, towers
from radvlm_tpu.models.clip import CLIPVisionConfig, forward, init_params

torch = pytest.importorskip("torch")

TINY = CLIPVisionConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,  # run 2 of the HF model's 3 layers (select_layer=-2)
    num_heads=2,
    image_size=42,
    patch_size=14,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    torch.manual_seed(0)
    cfg = HFConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers + 1,
        num_attention_heads=TINY.num_heads,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        attn_implementation="eager",
    )
    model = CLIPVisionModel(cfg)
    model.eval()
    return model


def test_clip_matches_hf_penultimate_patch_features(hf_model):
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_clip(state, TINY, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    pixels = rng.uniform(
        -1, 1, size=(2, TINY.image_size, TINY.image_size, 3)
    ).astype(np.float32)
    with torch.no_grad():
        out = hf_model(
            torch.tensor(pixels).permute(0, 3, 1, 2), output_hidden_states=True
        )
    # hidden_states[-2] == hidden_states[num_layers]; drop cls token.
    ref = out.hidden_states[TINY.num_layers].numpy()[:, 1:, :]

    got = forward(params, TINY, jnp.asarray(pixels), attn_impl="xla")
    assert got.shape == ref.shape == (2, TINY.tokens_per_tile, TINY.hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)


def test_s2_shapes_and_base_scale_slice(hf_model):
    """S2 output is [B, tokens, D*scales]; its first D channels at the base
    scale equal the single-scale forward (s2wrapper puts the base scale
    first)."""
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_clip(state, TINY, dtype=jnp.float32)
    s2_cfg = CLIPVisionConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_layers=TINY.num_layers,
        num_heads=TINY.num_heads,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        s2_scales=(42, 84),
    )
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(
        rng.uniform(-1, 1, size=(2, 42, 42, 3)).astype(np.float32)
    )
    out = forward(params, s2_cfg, pixels, attn_impl="xla")
    assert out.shape == (2, s2_cfg.tokens_per_tile, 2 * TINY.hidden_size)
    assert s2_cfg.feature_size == 2 * TINY.hidden_size
    single = forward(params, TINY, pixels, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(out[..., : TINY.hidden_size]), np.asarray(single),
        atol=1e-5, rtol=1e-5,
    )


def test_radvlm_end_to_end_with_clip_tower(rng):
    """Tower dispatch: a RadVLMConfig carrying a CLIP vision config flows
    through init/forward/generation (feature_size drives the projector)."""
    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.models import multimodal, radvlm

    base = cfglib.tiny_test_config()
    clip_vis = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        image_size=56, patch_size=14, s2_scales=(56, 112),
    )
    cfg = cfglib.RadVLMConfig(
        vision=clip_vis, text=base.text, anyres=base.anyres
    )
    assert towers.kind(cfg.vision) == "clip"
    params = radvlm.init_params(cfg, jax.random.key(0))
    # projector consumes the S2-doubled feature width
    assert params["projector"]["fc0"]["kernel"].shape[0] == 64

    img = rng.integers(0, 255, size=(80, 64, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=8))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in multimodal.collate([sample], pad_to_multiple=8).items()
    }
    logits, _ = radvlm.forward(params, cfg, batch, attn_impl="xla")
    assert logits.shape[0] == 1 and logits.shape[-1] == cfg.text.vocab_size
    assert np.isfinite(np.asarray(logits)).all()


def test_config_from_hf_dir_clip(tmp_path):
    """A clip_vision_model vision_config builds a CLIPVisionConfig (with the
    select_layer=-2 drop) instead of silently misconfiguring SigLIP."""
    import json

    cfg_dict = {
        "model_type": "llava_onevision",
        "text_config": {"model_type": "qwen2", "vocab_size": 128,
                        "hidden_size": 32, "intermediate_size": 64,
                        "num_hidden_layers": 2, "num_attention_heads": 4,
                        "num_key_value_heads": 2, "head_dim": 8},
        "vision_config": {
            "model_type": "clip_vision_model",
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 3, "num_attention_heads": 2,
            "image_size": 42, "patch_size": 14,
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))
    cfg = hf_import.config_from_hf_dir(str(tmp_path))
    assert towers.kind(cfg.vision) == "clip"
    assert cfg.vision.num_layers == 2  # pretrained 3 minus select_layer=-2 drop
    assert cfg.vision.image_size == 42
