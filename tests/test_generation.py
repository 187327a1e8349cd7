"""Generation engine tests: KV-cached while_loop decode vs teacher-forced forward.

The contract mirrors HF `generate` greedy decoding (reference
`llava_qwen.py:116-135`): for each sample, the cached incremental decode must emit
exactly the tokens that repeated full no-cache forwards would argmax, including
multimodal prompts with anyres image tokens and left-padded batching.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation.engine import (
    GenerationConfig,
    make_generate_fn,
    sample_token,
    trim_at_stop_strings,
)
from radvlm_tpu.models import multimodal, radvlm


def _mk_sample(cfg, rng, n_text):
    img = rng.integers(0, 255, size=(90, 70, 3), dtype=np.uint8)
    ids = list(rng.integers(3, cfg.text.vocab_size, size=n_text))
    ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
    return multimodal.build_sample(ids, [img], cfg)


def _teacher_forced(params, cfg, sample, steps):
    """Greedy reference: grow the sequence, full forward each step, no cache."""
    batch = multimodal.collate([sample], pad_to_multiple=1)
    toks = []
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(steps):
        logits, _ = radvlm.forward(params, cfg, b, attn_impl="xla")
        n = int(b["lengths"][0])
        nxt = int(jnp.argmax(logits[0, n - 1]))
        toks.append(nxt)
        # Append the token: extend every per-token array by one slot.
        def app(name, val):
            return jnp.concatenate(
                [b[name], jnp.full((1, 1), val, b[name].dtype)], axis=1
            )
        b = {
            **b,
            "tokens": app("tokens", nxt),
            "img_src": app("img_src", -1),
            "segment_ids": app("segment_ids", 1),
            "positions": app("positions", n),
            "labels": app("labels", -100),
            "lengths": b["lengths"] + 1,
        }
    return toks


@pytest.mark.slow
def test_greedy_matches_teacher_forced(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    s1 = _mk_sample(cfg, rng, 6)
    s2 = _mk_sample(cfg, rng, 11)

    steps = 6
    gen = GenerationConfig(max_new_tokens=steps, eos_token_ids=())
    gen_fn = make_generate_fn(cfg, gen, attn_impl="xla")
    batch = multimodal.collate([s1, s2], pad_to_multiple=8, left_pad=True)
    out = gen_fn(params, {k: jnp.asarray(v) for k, v in batch.items()},
                 jax.random.key(0))

    for i, s in enumerate([s1, s2]):
        expect = _teacher_forced(params, cfg, s, steps)
        got = list(np.asarray(out["tokens"])[i, :steps])
        assert got == expect, f"sample {i}: {got} != {expect}"


def test_eos_early_stop(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    s1 = _mk_sample(cfg, rng, 6)
    # Find the greedy first token, then declare it the eos: generation must stop
    # immediately with num_tokens == 1 and pad elsewhere.
    first = _teacher_forced(params, cfg, s1, 1)[0]
    gen = GenerationConfig(max_new_tokens=5, eos_token_ids=(first,), pad_token_id=0)
    gen_fn = make_generate_fn(cfg, gen, attn_impl="xla")
    batch = multimodal.collate([s1], pad_to_multiple=8, left_pad=True)
    out = gen_fn(params, {k: jnp.asarray(v) for k, v in batch.items()},
                 jax.random.key(0))
    assert int(out["num_tokens"][0]) == 1
    assert list(np.asarray(out["tokens"])[0]) == [first, 0, 0, 0, 0]


def test_sampling_filters():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 10.0]])
    g_greedy = GenerationConfig(temperature=0.0)
    assert int(sample_token(logits, g_greedy, jax.random.key(0))[0]) == 3
    # top_k=1 == greedy regardless of rng.
    g_k1 = GenerationConfig(temperature=1.0, top_k=1)
    for seed in range(5):
        assert int(sample_token(logits, g_k1, jax.random.key(seed))[0]) == 3
    # top_p tiny keeps only the argmax.
    g_p = GenerationConfig(temperature=1.0, top_p=0.01)
    for seed in range(5):
        assert int(sample_token(logits, g_p, jax.random.key(seed))[0]) == 3


def test_trim_stop_strings():
    assert trim_at_stop_strings("hello<|im_end|>junk", ["<|im_end|>"]) == "hello"
    assert trim_at_stop_strings("no stops here", ["<|im_end|>"]) == "no stops here"
