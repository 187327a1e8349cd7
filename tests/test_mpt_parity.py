"""Logit-parity: the functional decoder in MPT configuration vs HF
MptForCausalLM.

The reference wraps MPT as a model class (`language_model/llava_mpt.py`);
here MPT is a config on the one functional decoder: ALiBi position bias
instead of rope, weight-only LayerNorm instead of RMSNorm, non-gated
exact-GELU ffn, MHA, tied lm_head, no biases (no_bias).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from radvlm_tpu.config import Qwen2Config
from radvlm_tpu.models import hf_export, hf_import, qwen2

torch = pytest.importorskip("torch")

MPT_TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,  # expansion_ratio 2
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,  # MHA
    head_dim=8,
    rms_norm_eps=1e-5,
    attention_bias=False,
    tie_word_embeddings=True,
    hidden_act="gelu",
    pos_embedding="alibi",
    norm_kind="layernorm",
    mlp_gated=False,
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
def mpt_hf():
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(0)
    cfg = MptConfig(
        d_model=MPT_TINY.hidden_size,
        n_heads=MPT_TINY.num_heads,
        n_layers=MPT_TINY.num_layers,
        expansion_ratio=2,
        max_seq_len=MPT_TINY.max_position_embeddings,
        vocab_size=MPT_TINY.vocab_size,
        layer_norm_epsilon=MPT_TINY.rms_norm_eps,
        attn_implementation="eager",
    )
    model = MptForCausalLM(cfg)
    model.eval()
    return model


def _import_params(mpt_hf):
    state = hf_import.normalize_keys(mpt_hf.state_dict())
    return hf_import.import_qwen2(state, MPT_TINY, dtype=jnp.float32)


def test_mpt_logits_match_hf(mpt_hf):
    """ALiBi + weight-only LayerNorm + non-gated exact GELU + tied head.
    Seq 48 with 4 heads: the head-dependent ALiBi slopes must match HF's
    `build_mpt_alibi_tensor` or distant-token logits diverge."""
    params = _import_params(mpt_hf)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, MPT_TINY.vocab_size, size=(2, 48))
    with torch.no_grad():
        ref = mpt_hf(torch.tensor(ids)).logits.numpy()
    got = _run_ours(params, MPT_TINY, ids)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)

    # And ALiBi genuinely changes the result vs no position bias at all
    # ("none": neither rope nor the ALiBi ramp).
    import dataclasses

    flat = _run_ours(
        params, dataclasses.replace(MPT_TINY, pos_embedding="none"), ids
    )
    assert np.abs(flat - got).max() > 1e-3


@pytest.mark.slow
def test_mpt_cached_decode_matches_full_forward(mpt_hf):
    """ALiBi on the cached decode path (XLA fallback; the Pallas decode
    kernels have no ALiBi bias): per-step cached logits equal the
    full-sequence forward at each position. The key-only bias form is
    softmax-shift-equivalent at every cache length."""
    params = _import_params(mpt_hf)
    rng = np.random.default_rng(2)
    n = 40
    ids = rng.integers(0, MPT_TINY.vocab_size, size=(1, n))
    full = _run_ours(params, MPT_TINY, ids)

    cache = qwen2.init_kv_cache(MPT_TINY, batch=1, max_len=64,
                                dtype=jnp.float32)
    cache_seg = jnp.zeros((1, 64), jnp.int32)
    outs = []
    for i in range(n):
        embeds = qwen2.embed_tokens(params, jnp.asarray(ids[:, i:i + 1]),
                                    MPT_TINY)
        cache_seg = cache_seg.at[:, i].set(1)
        logits, cache = qwen2.forward(
            params, MPT_TINY,
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


def test_alibi_slopes_match_hf():
    """Slopes vs HF `build_mpt_alibi_tensor`, incl. a non-power-of-two head
    count (the odd-first interleave)."""
    from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor

    from radvlm_tpu.ops.attention import alibi_head_slopes

    for h in (4, 6, 32):
        ref = build_mpt_alibi_tensor(h, 8)  # [h, 1, 8]
        ref_slopes = (-ref[:, 0, 0] / 7.0).numpy()  # bias at k=0 is slope*(0-7)
        got = np.asarray(alibi_head_slopes(h))
        np.testing.assert_allclose(got, ref_slopes, rtol=1e-6)


def test_mpt_export_roundtrip(mpt_hf):
    """export_mpt -> normalize_keys -> import is bit-exact."""
    params = _import_params(mpt_hf)
    state = hf_export.export_mpt(params)
    back = hf_import.import_qwen2(
        hf_import.normalize_keys(state), MPT_TINY, dtype=jnp.float32
    )
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_from_hf_dir_mpt(tmp_path):
    cfg_dict = {
        "model_type": "mpt",
        "d_model": 32,
        "n_heads": 4,
        "n_layers": 2,
        "expansion_ratio": 2,
        "max_seq_len": 512,
        "vocab_size": 128,
        "layer_norm_epsilon": 1e-5,
        "attn_config": {"alibi": True, "alibi_bias_max": 8},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))
    cfg = hf_import.config_from_hf_dir(str(tmp_path))
    t = cfg.text
    assert t.pos_embedding == "alibi"
    assert t.norm_kind == "layernorm"
    assert not t.mlp_gated
    assert t.hidden_act == "gelu"
    assert t.tie_word_embeddings
    assert t.intermediate_size == 64
    assert t.num_kv_heads == t.num_heads == 4
    assert t.alibi_bias_max == 8
