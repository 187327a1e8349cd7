"""Logit-parity test: our functional Qwen2 vs HF transformers torch Qwen2.

Systematizes the reference's golden-check pattern
(convert_llava_onevision_weights_to_hf.py:204-250) without network access: build a
tiny HF Qwen2 with random weights, import its state dict, compare fp32 logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.config import Qwen2Config
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
    tie_word_embeddings=False,
    max_position_embeddings=512,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = HFQwen2Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        head_dim=TINY.head_dim,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False,
        max_position_embeddings=TINY.max_position_embeddings,
        attn_implementation="eager",
    )
    model = Qwen2ForCausalLM(cfg)
    model.eval()
    return model


def test_logits_match_hf(hf_model):
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 9))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(9), (2, 9))
    logits, _ = qwen2.forward(
        params, TINY, input_embeds=embeds, positions=positions, attn_impl="xla"
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


def test_padded_batch_matches_unpadded(hf_model):
    """Segment-id masking: a right-padded sequence must give identical logits on the
    real positions as the unpadded forward."""
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, TINY.vocab_size, size=(1, 5))

    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(5)[None]
    logits_plain, _ = qwen2.forward(
        params, TINY, input_embeds=emb, positions=pos, attn_impl="xla"
    )

    padded = np.zeros((1, 8), np.int64)
    padded[:, :5] = ids
    seg = jnp.asarray((padded != 0).astype(np.int32))
    emb_p = qwen2.embed_tokens(params, jnp.asarray(padded))
    pos_p = jnp.arange(8)[None]
    logits_pad, _ = qwen2.forward(
        params, TINY, input_embeds=emb_p, positions=pos_p, segment_ids=seg,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits_pad[:, :5]), np.asarray(logits_plain), atol=1e-4, rtol=1e-3
    )


def test_kv_cache_decode_matches_full_forward(hf_model):
    """Prefill+decode with the KV cache must reproduce the full-sequence logits."""
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, TINY.vocab_size, size=(1, 7))

    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(7)[None]
    full_logits, _ = qwen2.forward(
        params, TINY, input_embeds=emb, positions=pos, attn_impl="xla"
    )

    max_len = 16
    cache = qwen2.init_kv_cache(TINY, 1, max_len, dtype=jnp.float32)
    cache_seg = jnp.zeros((1, max_len), jnp.int32)

    # Prefill first 4 tokens.
    pre = 4
    cache_seg = cache_seg.at[:, :pre].set(1)
    logits, cache = qwen2.forward(
        params,
        TINY,
        input_embeds=emb[:, :pre],
        positions=pos[:, :pre],
        segment_ids=jnp.ones((1, pre), jnp.int32),
        kv_cache=cache,
        cache_index=jnp.int32(0),
        cache_segment_ids=cache_seg,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :pre]), atol=1e-4, rtol=1e-3
    )

    # Decode the remaining tokens one at a time.
    for t in range(pre, 7):
        cache_seg = cache_seg.at[:, t].set(1)
        logits, cache = qwen2.forward(
            params,
            TINY,
            input_embeds=emb[:, t : t + 1],
            positions=pos[:, t : t + 1],
            segment_ids=jnp.ones((1, 1), jnp.int32),
            kv_cache=cache,
            cache_index=jnp.int32(t),
            cache_segment_ids=cache_seg,
            attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]),
            np.asarray(full_logits[:, t]),
            atol=1e-4,
            rtol=1e-3,
        )
