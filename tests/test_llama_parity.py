"""Logit-parity: the functional GQA decoder in Llama configuration vs HF
LlamaForCausalLM (no attention bias, llama3 frequency-scaled rope).

The reference wraps a separate model class per LLM family
(`language_model/llava_llama.py`); here one decoder parameterizes both, so
family coverage is a config + import-path test.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.config import Qwen2Config, llama3_8b
from radvlm_tpu.models import hf_import, qwen2

torch = pytest.importorskip("torch")

TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    rope_theta=10000.0,
    rope_scaling=4.0,
    rope_scaling_type="llama3",
    rope_low_freq_factor=1.0,
    rope_high_freq_factor=4.0,
    rope_original_max_position=64,
    attention_bias=False,
    tie_word_embeddings=False,
    max_position_embeddings=512,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        head_dim=TINY.head_dim,
        rope_theta=TINY.rope_theta,
        rope_scaling={
            "rope_type": "llama3",
            "factor": TINY.rope_scaling,
            "low_freq_factor": TINY.rope_low_freq_factor,
            "high_freq_factor": TINY.rope_high_freq_factor,
            "original_max_position_embeddings": TINY.rope_original_max_position,
        },
        rms_norm_eps=TINY.rms_norm_eps,
        attention_bias=False,
        tie_word_embeddings=False,
        max_position_embeddings=TINY.max_position_embeddings,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_llama_logits_match_hf(hf_model):
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    # bias-free import: no bias leaves in the attn tree
    assert "bias" not in params["layers"]["attn"]["q"]

    rng = np.random.default_rng(0)
    # positions far past original_max_position exercise the llama3 remap
    ids = rng.integers(0, TINY.vocab_size, size=(2, 96))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.tile(jnp.arange(96)[None], (2, 1))
    seg = jnp.ones((2, 96), jnp.int32)
    got, _ = qwen2.forward(
        params, TINY, input_embeds=embeds, positions=pos, segment_ids=seg,
        attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)


def test_llama_fused_generation_runs(hf_model):
    """fuse_projections + decode path with a bias-free attn tree."""
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    fused = qwen2.fuse_projections(params)
    assert "bias" not in fused["layers"]["attn"]["qkv"]

    ids = np.array([[3, 7, 11, 19]])
    embeds = qwen2.embed_tokens(fused, jnp.asarray(ids))
    pos = jnp.arange(4)[None]
    seg = jnp.ones((1, 4), jnp.int32)
    plain, _ = qwen2.forward(
        params, TINY, input_embeds=embeds, positions=pos, segment_ids=seg,
        attn_impl="xla",
    )
    fused_out, _ = qwen2.forward(
        fused, TINY, input_embeds=embeds, positions=pos, segment_ids=seg,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(fused_out), atol=1e-5, rtol=1e-5
    )


def test_config_from_hf_dir_llama(tmp_path, hf_model):
    """config_from_hf_dir maps a Llama config.json onto the family fields."""
    cfg_dict = {
        "model_type": "llava_onevision",
        "image_token_index": 5,
        "text_config": {
            "model_type": "llama",
            "vocab_size": 128,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 8,
            "rope_theta": 10000.0,
            "rope_scaling": {
                "rope_type": "llama3",
                "factor": 4.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 64,
            },
            "rms_norm_eps": 1e-6,
            "max_position_embeddings": 512,
        },
        "vision_config": {},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))
    cfg = hf_import.config_from_hf_dir(str(tmp_path))
    assert cfg.text.attention_bias is False
    assert cfg.text.rope_scaling_type == "llama3"
    assert cfg.text.rope_scaling == 4.0
    assert cfg.text.rope_original_max_position == 64


def test_llama3_8b_constructor():
    cfg = llama3_8b()
    assert cfg.attention_bias is False and cfg.rope_scaling_type == "llama3"
    assert cfg.vocab_size == 128256
