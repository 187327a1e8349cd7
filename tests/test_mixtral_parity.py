"""Mixtral family: logit parity vs HF, export round-trip, config dispatch.

The reference wraps Mixtral as `LlavaMixtralForCausalLM`
(`finetuning/llava/model/language_model/llava_mixtral.py`) — Mistral
attention (sliding window) + every-layer 8-expert top-2 sparse MoE with
renormalized top-k weights and NO shared expert (HF `MixtralSparseMoeBlock`).
Here the one functional decoder covers it via config: `num_experts` with
`shared_expert_intermediate_size=0` + `sliding_window`.
"""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from radvlm_tpu.config import Qwen2Config
from radvlm_tpu.models import hf_export, hf_import, qwen2

TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=48,  # mixtral: expert ffn width == intermediate_size
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,
    attention_bias=False,
    tie_word_embeddings=False,
    max_position_embeddings=512,
    sliding_window=16,  # << seq len so the window actually masks
    num_experts=4,
    num_experts_per_tok=2,
    moe_intermediate_size=48,
    shared_expert_intermediate_size=0,
    norm_topk_prob=True,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.moe_intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False,
        max_position_embeddings=TINY.max_position_embeddings,
        sliding_window=TINY.sliding_window,
        num_local_experts=TINY.num_experts,
        num_experts_per_tok=TINY.num_experts_per_tok,
        attn_implementation="eager",
    )
    model = MixtralForCausalLM(cfg)
    model.eval()
    return model


def _forward(params, ids, cfg=TINY):
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.tile(jnp.arange(ids.shape[1])[None], (ids.shape[0], 1))
    seg = jnp.ones(ids.shape, jnp.int32)
    return qwen2.forward(
        params, cfg, input_embeds=embeds, positions=pos,
        segment_ids=seg, attn_impl="xla",
    )


def test_mixtral_logits_match_hf(hf_model):
    """Seq 96 >> window 16, so parity also covers the sliding-window mask;
    norm_topk_prob covers Mixtral's always-renormalized top-2 weights."""
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    assert "moe" in params["layers"]["mlp"]
    assert "shared" not in params["layers"]["mlp"]["moe"]

    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 96))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got, _ = _forward(params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=3e-3)


def test_mixtral_export_roundtrip(hf_model):
    """export_qwen2 of a shared-expert-free MoE tree emits the Mixtral
    block_sparse_moe/w1-w3-w2 layout and re-imports bit-exactly."""
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    exported = hf_export.export_qwen2(params, prefix="model.")
    assert "model.layers.0.block_sparse_moe.gate.weight" in exported
    assert "model.layers.0.block_sparse_moe.experts.0.w1.weight" in exported
    assert not any("shared_expert" in k for k in exported)
    re_params = hf_import.import_qwen2(
        hf_import.normalize_keys(exported), TINY, dtype=jnp.float32
    )
    got = np.asarray(re_params["layers"]["attn"]["q"]["kernel"])
    np.testing.assert_array_equal(
        got, np.asarray(params["layers"]["attn"]["q"]["kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(re_params["layers"]["mlp"]["moe"]["experts"]["down"]),
        np.asarray(params["layers"]["mlp"]["moe"]["experts"]["down"]),
    )


def test_config_from_hf_dir_mixtral(tmp_path):
    """`num_local_experts` checkpoints map onto the MoE config with no shared
    expert and always-on top-k renormalization."""
    cfg_json = {
        "model_type": "llava",
        "text_config": {
            "model_type": "mixtral",
            "vocab_size": 32000,
            "hidden_size": 64,
            "intermediate_size": 96,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rope_theta": 1e6,
            "rms_norm_eps": 1e-5,
            "sliding_window": 4096,
            "num_local_experts": 8,
            "num_experts_per_tok": 2,
            "max_position_embeddings": 32768,
        },
        "vision_config": {},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_json))
    cfg = hf_import.config_from_hf_dir(str(tmp_path))
    t = cfg.text
    assert t.num_experts == 8
    assert t.num_experts_per_tok == 2
    assert t.moe_intermediate_size == 96
    assert t.shared_expert_intermediate_size == 0
    assert t.norm_topk_prob is True
    assert t.sliding_window == 4096
    assert t.attention_bias is False


@pytest.mark.slow
def test_mixtral_init_params_no_shared():
    import jax

    params = qwen2.init_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    moe = params["layers"]["mlp"]["moe"]
    assert "shared" not in moe and "shared_gate" not in moe
    ids = np.arange(12)[None]
    out, _ = _forward(params, ids)
    assert np.isfinite(np.asarray(out)).all()
