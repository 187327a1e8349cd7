"""End-to-end VLM parity: radvlm_tpu vs HF LlavaOnevisionForConditionalGeneration.

The strongest correctness check in the suite (systematized golden-check pattern from
the reference converter, `convert_llava_onevision_weights_to_hf.py:204-250`): a tiny
random LLaVA-OneVision model's logits must match our whole pipeline — host anyres
tiling, vision tower, projector, sparse-gather anyres merge (unpad + newline +
anyres_max bilinear cap), embedding splice, Qwen2 decoder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from radvlm_tpu.config import (
    IMAGE_TOKEN_INDEX,
    AnyResConfig,
    ProjectorConfig,
    Qwen2Config,
    RadVLMConfig,
    SigLIPConfig,
)
from radvlm_tpu.models import hf_import, multimodal, radvlm

torch = pytest.importorskip("torch")

TILE = 56  # 4x4 patches of 14 -> 16 tokens per tile
CFG = RadVLMConfig(
    vision=SigLIPConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        image_size=TILE, patch_size=14,
    ),
    text=Qwen2Config(
        vocab_size=256, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=12, rope_theta=10000.0,
        tie_word_embeddings=False, max_position_embeddings=4096,
    ),
    projector=ProjectorConfig("mlp2x_gelu"),
    anyres=AnyResConfig(tile_size=TILE, grid_range=(1, 6), anyres_max=9),
    image_aspect_ratio="anyres_max_9",
)
IMAGE_TOKEN_ID = 255  # pretend <image> id in the tiny vocab


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
    )

    torch.manual_seed(0)
    pinpoints = [
        [i * TILE, j * TILE] for i in range(1, 7) for j in range(1, 7)
    ]  # HF uses (height, width)
    cfg = LlavaOnevisionConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=TILE, patch_size=14,
            vision_use_head=False,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=256, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=12, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            max_position_embeddings=4096,
        ),
        image_grid_pinpoints=pinpoints,
        image_token_index=IMAGE_TOKEN_ID,
        vision_feature_select_strategy="full",
        vision_feature_layer=-1,
        vision_aspect_ratio="anyres_max_9",
        use_image_newline_parameter=True,
    )
    model = LlavaOnevisionForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.mark.parametrize(
    "img_hw",
    [
        (80, 120),   # small: 2-3 tile grid, no anyres_max downscale
        (300, 100),  # elongated: big grid, triggers the bilinear token cap
    ],
)
def test_vlm_logits_match_hf(hf_model, img_hw):
    params = hf_import.import_radvlm(hf_model.state_dict(), CFG, dtype=jnp.float32)

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=img_hw + (3,), dtype=np.uint8)

    # --- our pipeline ---
    prompt_ids = [5, 6, 7, IMAGE_TOKEN_INDEX, 9, 10, 11, 12]
    sample = multimodal.build_sample(prompt_ids, [img], CFG)
    batch = multimodal.collate([sample], pad_to_multiple=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    logits, _ = radvlm.forward(params, CFG, batch, attn_impl="xla")
    logits = np.asarray(logits)[0, : sample.length]

    # --- HF pipeline: feed the same tiles (base-first order) as pixel_values ---
    n_img = sample.num_image_tokens
    hf_ids = [5, 6, 7] + [IMAGE_TOKEN_ID] * n_img + [9, 10, 11, 12]
    # Our tiles stay uint8 (normalized on device); HF expects normalized floats.
    from radvlm_tpu.ops.image_ops import normalize_pixels

    pixel_values = torch.tensor(
        normalize_pixels(sample.tiles)
    ).permute(0, 3, 1, 2)[None]
    image_sizes = torch.tensor([[img_hw[0], img_hw[1]]])  # (height, width)
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=pixel_values,
            image_sizes=image_sizes,
        )
    ref = out.logits.numpy()[0]

    assert logits.shape == ref.shape, (logits.shape, ref.shape)
    np.testing.assert_allclose(logits, ref, atol=5e-4, rtol=5e-3)
