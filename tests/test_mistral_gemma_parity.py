"""Logit-parity: the one functional GQA decoder in Mistral and Gemma
configuration vs HF MistralForCausalLM / GemmaForCausalLM.

The reference wraps a model class per family
(`language_model/llava_mistral.py`, `llava_gemma.py`); here each family is a
config: Mistral = Llama + sliding-window attention; Gemma = GeGLU MLP +
(1 + w) RMSNorm + sqrt(d)-scaled embeddings + MQA + tied lm_head.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.config import Qwen2Config
from radvlm_tpu.models import hf_import, qwen2

torch = pytest.importorskip("torch")

MISTRAL_TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,
    attention_bias=False,
    sliding_window=16,  # << seq len so the window actually masks
    max_position_embeddings=512,
)

GEMMA_TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=1,  # MQA
    head_dim=16,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    attention_bias=False,
    tie_word_embeddings=True,
    hidden_act="gelu_tanh",
    rms_norm_offset=True,
    embed_normalizer=True,
    max_position_embeddings=512,
)


def _run_ours(params, cfg, ids):
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids), cfg)
    b, s = ids.shape
    pos = jnp.tile(jnp.arange(s)[None], (b, 1))
    seg = jnp.ones((b, s), jnp.int32)
    got, _ = qwen2.forward(
        params, cfg, input_embeds=embeds, positions=pos, segment_ids=seg,
        attn_impl="xla",
    )
    return np.asarray(got)


@pytest.fixture(scope="module")
def mistral_hf():
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(0)
    cfg = MistralConfig(
        vocab_size=MISTRAL_TINY.vocab_size,
        hidden_size=MISTRAL_TINY.hidden_size,
        intermediate_size=MISTRAL_TINY.intermediate_size,
        num_hidden_layers=MISTRAL_TINY.num_layers,
        num_attention_heads=MISTRAL_TINY.num_heads,
        num_key_value_heads=MISTRAL_TINY.num_kv_heads,
        head_dim=MISTRAL_TINY.head_dim,
        rope_theta=MISTRAL_TINY.rope_theta,
        rms_norm_eps=MISTRAL_TINY.rms_norm_eps,
        sliding_window=MISTRAL_TINY.sliding_window,
        tie_word_embeddings=False,
        max_position_embeddings=MISTRAL_TINY.max_position_embeddings,
        attn_implementation="eager",
    )
    model = MistralForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def gemma_hf():
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(0)
    cfg = GemmaConfig(
        vocab_size=GEMMA_TINY.vocab_size,
        hidden_size=GEMMA_TINY.hidden_size,
        intermediate_size=GEMMA_TINY.intermediate_size,
        num_hidden_layers=GEMMA_TINY.num_layers,
        num_attention_heads=GEMMA_TINY.num_heads,
        num_key_value_heads=GEMMA_TINY.num_kv_heads,
        head_dim=GEMMA_TINY.head_dim,
        rope_theta=GEMMA_TINY.rope_theta,
        rms_norm_eps=GEMMA_TINY.rms_norm_eps,
        hidden_act="gelu_pytorch_tanh",
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=True,
        max_position_embeddings=GEMMA_TINY.max_position_embeddings,
        attn_implementation="eager",
    )
    model = GemmaForCausalLM(cfg)
    model.eval()
    return model


def test_mistral_logits_match_hf(mistral_hf):
    """Sliding-window causal attention (seq 96 >> window 16): parity fails if
    the window mask is dropped, because distant positions leak in."""
    state = hf_import.normalize_keys(mistral_hf.state_dict())
    params = hf_import.import_qwen2(state, MISTRAL_TINY, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, MISTRAL_TINY.vocab_size, size=(2, 96))
    with torch.no_grad():
        ref = mistral_hf(torch.tensor(ids)).logits.numpy()
    got = _run_ours(params, MISTRAL_TINY, ids)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)

    # And the window genuinely changes the result vs full causal.
    import dataclasses

    nowin = dataclasses.replace(MISTRAL_TINY, sliding_window=0)
    full = _run_ours(params, nowin, ids)
    assert np.abs(full - got).max() > 1e-3


def test_gemma_logits_match_hf(gemma_hf):
    """GeGLU + (1+w) RMSNorm + sqrt(d) embedding scale + MQA + tied head."""
    state = hf_import.normalize_keys(gemma_hf.state_dict())
    params = hf_import.import_qwen2(state, GEMMA_TINY, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, GEMMA_TINY.vocab_size, size=(2, 48))
    with torch.no_grad():
        ref = gemma_hf(torch.tensor(ids)).logits.numpy()
    got = _run_ours(params, GEMMA_TINY, ids)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)


@pytest.mark.slow
def test_mistral_cached_decode_matches_full_forward(mistral_hf):
    """Windowed attention on the cached decode path (XLA fallback; the Pallas
    decode kernels have no window mask): per-step cached logits equal the
    full-sequence forward at each position."""
    state = hf_import.normalize_keys(mistral_hf.state_dict())
    params = hf_import.import_qwen2(state, MISTRAL_TINY, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    n = 40
    ids = rng.integers(0, MISTRAL_TINY.vocab_size, size=(1, n))
    full = _run_ours(params, MISTRAL_TINY, ids)

    cache = qwen2.init_kv_cache(MISTRAL_TINY, batch=1, max_len=64,
                                dtype=jnp.float32)
    cache_seg = jnp.zeros((1, 64), jnp.int32)
    outs = []
    for i in range(n):
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids[:, i:i + 1]),
                                    MISTRAL_TINY)
        cache_seg = cache_seg.at[:, i].set(1)
        logits, cache = qwen2.forward(
            params, MISTRAL_TINY,
            input_embeds=embeds,
            positions=jnp.full((1, 1), i, jnp.int32),
            segment_ids=jnp.ones((1, 1), jnp.int32),
            kv_cache=cache,
            cache_index=i,
            cache_segment_ids=cache_seg,
            attn_impl="xla",
        )
        outs.append(np.asarray(logits)[:, 0])
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, full, atol=2e-4, rtol=2e-3)


def test_config_from_hf_dir_families(tmp_path):
    """model_type mistral/gemma map onto the family fields."""
    for model_type, expect in [
        ("mistral", dict(sliding_window=4096, hidden_act="silu",
                         rms_norm_offset=False, embed_normalizer=False)),
        ("gemma", dict(sliding_window=0, hidden_act="gelu_tanh",
                       rms_norm_offset=True, embed_normalizer=True)),
    ]:
        cfg_dict = {
            "model_type": "llava_onevision",
            "image_token_index": 5,
            "text_config": {
                "model_type": model_type,
                "vocab_size": 128,
                "hidden_size": 32,
                "intermediate_size": 64,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "num_key_value_heads": 2,
                "head_dim": 8,
                "rope_theta": 10000.0,
                "sliding_window": 4096 if model_type == "mistral" else None,
                "tie_word_embeddings": model_type == "gemma",
            },
        }
        d = tmp_path / model_type
        d.mkdir()
        (d / "config.json").write_text(json.dumps(cfg_dict))
        cfg = hf_import.config_from_hf_dir(str(d))
        assert not cfg.text.attention_bias
        for k, v in expect.items():
            assert getattr(cfg.text, k) == v, (model_type, k)
        assert cfg.text.tie_word_embeddings == (model_type == "gemma")


def test_gemma_normalizer_scales_spliced_image_features():
    """HF GemmaModel scales the WHOLE inputs_embeds (text + multimodal
    features merged by the LLaVA pipeline) by sqrt(hidden_size); our splice
    must apply the same factor to the projector outputs, not just the text
    embeddings (image features entering ~45x smaller makes a real 2B model
    effectively image-blind)."""
    import dataclasses

    import numpy as np

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.models import radvlm

    cfg = cfglib.tiny_test_config()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, embed_normalizer=True)
    )
    params = radvlm.init_params(cfg, jax.random.key(0))
    d = cfg.text.hidden_size
    tokens = jnp.asarray([[5, 0, 0, 6]])
    img_src = jnp.asarray([[-1, 0, 1, -1]])
    merged = jax.random.normal(jax.random.key(1), (1, 2, d), jnp.float32)
    out = radvlm.splice_embeds(params, tokens, img_src, merged, cfg)
    norm = np.float32(d) ** 0.5
    np.testing.assert_allclose(
        np.asarray(out[0, 1]), np.asarray(merged[0, 0]) * norm, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[0, 2]), np.asarray(merged[0, 1]) * norm, rtol=1e-6)
    # text rows keep the embed_tokens scaling
    emb = qwen2.embed_tokens(params["text"], tokens, cfg.text)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(emb[0, 0]))
