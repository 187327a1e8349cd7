"""Speculative decoding (generation/spec.py + ContinuousBatcher spec_k mode).

Greedy acceptance makes speculation output-invariant: whatever the draft
source proposes, the emitted stream must equal plain greedy token for token —
that is the core contract every test here pins.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation import spec as speclib
from radvlm_tpu.generation.continuous import ContinuousBatcher
from radvlm_tpu.generation.engine import GenerationConfig
from radvlm_tpu.models import multimodal, qwen2, radvlm


def _mk_sample(cfg, rng, n_text):
    img = rng.integers(0, 255, size=(90, 70, 3), dtype=np.uint8)
    ids = list(rng.integers(3, cfg.text.vocab_size, size=n_text))
    ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
    return multimodal.build_sample(ids, [img], cfg)


# ---------------------------------------------------------------- unit level


def test_propose_ngram_matches_last_bigram():
    # history: ... 5 6 7 8 ... 5 6 <cur> ; bigram (5, 6) last occurred at 0
    hist = jnp.asarray(
        [[5, 6, 7, 8, 9, 5, 6, -1, -1, -1]], jnp.int32
    )
    widx = jnp.asarray([6], jnp.int32)  # current token 6 at index 6
    draft = speclib.propose_ngram(hist, widx, 3)
    assert draft.tolist() == [[7, 8, 9]]


def test_propose_ngram_no_match_is_zero():
    hist = jnp.asarray([[1, 2, 3, 4, -1, -1]], jnp.int32)
    widx = jnp.asarray([3], jnp.int32)  # bigram (3, 4) never seen before
    draft = speclib.propose_ngram(hist, widx, 2)
    assert draft.tolist() == [[0, 0]]


def test_propose_ngram_ignores_pad_and_image():
    # -1 pad/image positions must not anchor a match even though the current
    # bigram starts with the same id 0 that pad positions would hold raw.
    hist = jnp.asarray([[-1, -1, 0, 9, 0, 9, -1, -1]], jnp.int32)
    widx = jnp.asarray([5], jnp.int32)  # bigram (0, 9), earlier match at 2
    draft = speclib.propose_ngram(hist, widx, 2)
    assert draft.tolist() == [[0, 9]]  # tokens following index 2's match


def test_greedy_accept_prefix():
    v = 11
    # predictions: [3, 4, 5, 6]; draft [3, 4, 9] -> accept 2, emit 3 tokens
    pred_ids = [3, 4, 5, 6]
    logits = jax.nn.one_hot(jnp.asarray([pred_ids]), v) * 10.0
    draft = jnp.asarray([[3, 4, 9]], jnp.int32)
    pred, n_emit, nxt = speclib.greedy_accept(logits, draft)
    assert pred.tolist() == [pred_ids]
    assert n_emit.tolist() == [3]
    assert int(nxt[0]) == 5  # pred[acc] = pred[2]

    # no acceptance: emit exactly the plain greedy token
    draft0 = jnp.asarray([[9, 9, 9]], jnp.int32)
    _, n0, nxt0 = speclib.greedy_accept(logits, draft0)
    assert n0.tolist() == [1] and int(nxt0[0]) == 3

    # full acceptance
    draftf = jnp.asarray([[3, 4, 5]], jnp.int32)
    _, nf, nxtf = speclib.greedy_accept(logits, draftf)
    assert nf.tolist() == [4] and int(nxtf[0]) == 6


# ------------------------------------------- windowed cached-forward parity


@pytest.mark.parametrize("cache_format", ["bf16", "int8"])
def test_verify_window_matches_stepwise_decode(cache_format):
    """One (k+1)-wide cached forward at per-row offsets must produce the same
    logits and cache as k+1 single-token decode steps."""
    cfg = cfglib.tiny_test_config().text
    params = qwen2.init_params(cfg, jax.random.key(0))
    b, prompt_len, max_len, k = 2, 8, 64, 3
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(3, cfg.vocab_size, size=(b, prompt_len)), jnp.int32
    )
    window = jnp.asarray(
        rng.integers(3, cfg.vocab_size, size=(b, k + 1)), jnp.int32
    )

    def prefill_cache():
        if cache_format == "int8":
            cache = qwen2.init_kv_cache_q8(cfg, b, max_len)
        else:
            cache = qwen2.init_kv_cache(cfg, b, max_len)
        seg = jnp.zeros((b, max_len), jnp.int32).at[:, :prompt_len].set(1)
        embeds = qwen2.embed_tokens(params, prompt, cfg)
        _, cache = qwen2.forward(
            params, cfg, input_embeds=embeds,
            positions=jnp.broadcast_to(jnp.arange(prompt_len), (b, prompt_len)),
            segment_ids=jnp.ones((b, prompt_len), jnp.int32),
            kv_cache=cache, cache_index=0, cache_segment_ids=seg,
            attn_impl="xla",
        )
        return cache, seg

    # per-row offsets: row 0 starts at prompt_len, row 1 same (uniform prompt)
    offs = jnp.full((b,), prompt_len, jnp.int32)

    # stepwise: k+1 single-token decode steps (per-row scatter path)
    cache_a, seg_a = prefill_cache()
    rows = jnp.arange(b)
    step_logits = []
    for j in range(k + 1):
        idx = offs + j
        seg_a = seg_a.at[rows, idx].set(1)
        embeds = qwen2.embed_tokens(params, window[:, j][:, None], cfg)
        lg, cache_a = qwen2.forward(
            params, cfg, input_embeds=embeds,
            positions=idx[:, None],
            segment_ids=jnp.ones((b, 1), jnp.int32),
            kv_cache=cache_a, cache_index=idx, cache_segment_ids=seg_a,
            attn_impl="xla",
        )
        step_logits.append(lg[:, 0])

    # windowed: one s = k+1 forward
    cache_b, seg_b = prefill_cache()
    idxw = offs[:, None] + jnp.arange(k + 1)[None]
    seg_b = seg_b.at[rows[:, None], idxw].set(1)
    embeds = qwen2.embed_tokens(params, window, cfg)
    lg_w, cache_b = qwen2.forward(
        params, cfg, input_embeds=embeds,
        positions=idxw,
        segment_ids=jnp.ones((b, k + 1), jnp.int32),
        kv_cache=cache_b, cache_index=offs, cache_segment_ids=seg_b,
        attn_impl="xla",
    )

    for j in range(k + 1):
        np.testing.assert_allclose(
            np.asarray(lg_w[:, j], np.float32),
            np.asarray(step_logits[j], np.float32),
            rtol=2e-2, atol=2e-2,
        )
    for ca, cb in zip(cache_a, cache_b):
        np.testing.assert_allclose(
            np.asarray(ca, np.float32), np.asarray(cb, np.float32),
            rtol=2e-2, atol=2e-2,
        )


# ------------------------------------------------------ engine token parity


@pytest.mark.parametrize("kv_quant", [False, True])
def test_spec_engine_matches_plain_greedy(rng, kv_quant):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    gen = GenerationConfig(max_new_tokens=12, eos_token_ids=())
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8, 14)]

    def run(spec_k):
        b = ContinuousBatcher(
            params, cfg, gen, num_slots=2, max_len=256,
            prompt_buckets=(128,), pad_tiles=2, attn_impl="xla",
            kv_quant=kv_quant, spec_k=spec_k,
        )
        reqs = [b.submit(s, 12) for s in samples]
        for _ in b.run():
            pass
        return [list(r.emitted) for r in reqs]

    assert run(3) == run(0)


def test_spec_engine_sampling_requests_still_work(rng):
    """A temperature>0 request routes chunks to the sampling variant (which
    carries the spec device state); greedy requests in the same engine must
    still match plain greedy."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    gen = GenerationConfig(max_new_tokens=8, eos_token_ids=(), temperature=0.0)
    sample = _mk_sample(cfg, rng, 9)

    b = ContinuousBatcher(
        params, cfg, gen, num_slots=2, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla", spec_k=3,
    )
    greedy_req = b.submit(sample, 8)
    hot_req = b.submit(sample, 8, temperature=5.0, top_p=1.0)
    done = {r.uid: r.emitted for r in b.run()}
    assert len(done[hot_req.uid]) == 8

    ref = ContinuousBatcher(
        params, cfg, gen, num_slots=2, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    r = ref.submit(sample, 8)
    for _ in ref.run():
        pass
    assert done[greedy_req.uid] == r.emitted


def test_spec_eos_and_max_new_respected(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    sample = _mk_sample(cfg, rng, 6)
    plain = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=6, eos_token_ids=()),
        num_slots=1, max_len=256, prompt_buckets=(128,), pad_tiles=2,
        attn_impl="xla",
    )
    plain.submit(sample, 6)
    ref = list(plain.run())[0].emitted

    # declare the 3rd greedy token eos: spec engine must stop there even if a
    # verify window accepted past it
    b = ContinuousBatcher(
        params, cfg,
        GenerationConfig(max_new_tokens=6, eos_token_ids=(ref[2],)),
        num_slots=1, max_len=256, prompt_buckets=(128,), pad_tiles=2,
        attn_impl="xla", spec_k=3,
    )
    b.submit(sample, 6)
    out = list(b.run())[0].emitted
    assert out == ref[:2]

    # max_new caps with spec headroom: 256-cache, 128-bucket prompt, spec_k=3
    b2 = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=500, eos_token_ids=()),
        num_slots=1, max_len=256, prompt_buckets=(128,), pad_tiles=2,
        attn_impl="xla", spec_k=3,
    )
    b2.submit(sample, 500)
    out2 = list(b2.run())[0].emitted
    assert len(out2) == 256 - 128 + 1 - 3


def test_spec_acceptance_collapses_steps_on_repetitive_stream(rng):
    """A tiny-vocab model falls into a greedy repetition loop; prompt-lookup
    must then accept multi-token windows (emitted > verify_steps) while
    matching plain greedy exactly."""
    cfg = cfglib.tiny_test_config(vocab_size=16)
    params = radvlm.init_params(cfg, jax.random.key(1))
    img = rng.integers(0, 255, size=(80, 64, 3), dtype=np.uint8)
    ids = [3, IMAGE_TOKEN_INDEX] + list(rng.integers(3, 16, size=6))
    sample = multimodal.build_sample(ids, [img], cfg)
    gen = GenerationConfig(max_new_tokens=48, eos_token_ids=())

    plain = ContinuousBatcher(
        params, cfg, gen, num_slots=1, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    plain.submit(sample, 48)
    ref = list(plain.run())[0].emitted
    # precondition: the greedy stream actually repeats a bigram
    bigrams = list(zip(ref, ref[1:]))
    assert len(set(bigrams)) < len(bigrams), "seed no longer loops; pick another"

    b = ContinuousBatcher(
        params, cfg, gen, num_slots=1, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla", spec_k=4,
    )
    b.submit(sample, 48)
    out = list(b.run())[0].emitted
    assert out == ref
    stats = b.spec_stats
    assert stats["emitted"] > stats["verify_steps"], stats
