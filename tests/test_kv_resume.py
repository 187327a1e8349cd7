"""Multi-turn KV reuse (conversation resume): a turn-N delta prefill on a
KVSnapshot must emit exactly what a from-scratch full-conversation prefill
emits.

The reference re-prefills the whole conversation every chat turn (stateless
HF generate in `model_worker.py`; conversation state lives in the gradio UI).
Here `Request.keep_kv` cuts the finished slot's KV rows into a snapshot and
`submit(resume=...)` prefills only the new turn's tokens at the recorded
cache offset — these tests pin token-for-token parity against the static
engine on the full concatenated history.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation.continuous import ContinuousBatcher
from radvlm_tpu.generation.engine import GenerationConfig, make_generate_fn
from radvlm_tpu.models import multimodal, radvlm


def _static_reference(params, cfg, sample, steps):
    gen = GenerationConfig(max_new_tokens=steps, eos_token_ids=())
    gen_fn = make_generate_fn(cfg, gen, attn_impl="xla")
    batch = multimodal.collate([sample], pad_to_multiple=128, left_pad=True)
    out = gen_fn(params, {k: jnp.asarray(v) for k, v in batch.items()},
                 jax.random.key(0))
    return list(np.asarray(out["tokens"])[0, :steps])


def _run_one(batcher, sample, steps, **kw):
    req = batcher.submit(sample, max_new_tokens=steps, **kw)
    done = list(batcher.run())
    assert [r.uid for r in done] == [req.uid]
    return req


def _conversation(cfg, rng):
    """(turn1 ids+img, turn2 delta ids, turn3 delta ids + new img)."""
    img1 = rng.integers(0, 255, size=(90, 70, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    t1 = list(rng.integers(3, cfg.text.vocab_size, size=9))
    ids1 = t1[:2] + [IMAGE_TOKEN_INDEX] + t1[2:]
    d2 = list(rng.integers(3, cfg.text.vocab_size, size=7))
    t3 = list(rng.integers(3, cfg.text.vocab_size, size=5))
    d3 = t3[:3] + [IMAGE_TOKEN_INDEX] + t3[3:]
    return ids1, img1, d2, d3, img2


@pytest.mark.parametrize("kv_quant", [False, True])
def test_resume_matches_full_prefill(rng, kv_quant):
    """Three turns (text delta, then an image delta) resume-filled must match
    the static engine run on the growing full conversation."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    ids1, img1, d2, d3, img2 = _conversation(cfg, rng)
    steps = 4

    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=2, max_len=512, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla", kv_quant=kv_quant,
    )

    # turn 1: full prefill, keep the KV
    s1 = multimodal.build_sample(ids1, [img1], cfg)
    r1 = _run_one(b, s1, steps, keep_kv=True)
    assert r1.emitted == _static_reference(params, cfg, s1, steps)
    assert r1.kv_snapshot is not None
    assert r1.kv_snapshot.widx > 0

    # turn 2: text-only delta vs full re-prefill of the whole conversation
    ids2 = ids1 + r1.emitted + d2
    exp2 = _static_reference(
        params, cfg, multimodal.build_sample(ids2, [img1], cfg), steps
    )
    s2 = multimodal.build_sample(d2, [], cfg)
    r2 = _run_one(b, s2, steps, keep_kv=True, resume=r1.kv_snapshot)
    assert r2.emitted == exp2
    assert b.resume_fills == 1

    # turn 3: delta contains a NEW image (vision tower runs on it only)
    ids3 = ids2 + r2.emitted + d3
    exp3 = _static_reference(
        params, cfg, multimodal.build_sample(ids3, [img1, img2], cfg), steps
    )
    s3 = multimodal.build_sample(d3, [img2], cfg)
    r3 = _run_one(b, s3, steps, resume=r2.kv_snapshot)
    assert r3.emitted == exp3
    assert b.resume_fills == 2


def test_resume_on_spec_engine(rng):
    """Resume + speculative decoding compose: the spec engine's emissions on
    a resumed turn are the plain greedy stream."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    ids1, img1, d2, _, _ = _conversation(cfg, rng)
    steps = 6

    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=2, max_len=512, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla", spec_k=2,
    )
    s1 = multimodal.build_sample(ids1, [img1], cfg)
    r1 = _run_one(b, s1, steps, keep_kv=True)
    assert r1.kv_snapshot.hist_row is not None

    ids2 = ids1 + r1.emitted + d2
    exp2 = _static_reference(
        params, cfg, multimodal.build_sample(ids2, [img1], cfg), steps
    )
    r2 = _run_one(
        b, multimodal.build_sample(d2, [], cfg), steps,
        resume=r1.kv_snapshot,
    )
    assert r2.emitted == exp2


def test_resume_alongside_other_slots(rng):
    """A resumed fill must not disturb concurrent requests in other slots."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    ids1, img1, d2, _, _ = _conversation(cfg, rng)
    steps = 4

    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=3, max_len=512, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    s1 = multimodal.build_sample(ids1, [img1], cfg)
    r1 = _run_one(b, s1, steps, keep_kv=True)

    others = []
    for n in (6, 11):
        t = list(rng.integers(3, cfg.text.vocab_size, size=n))
        others.append(multimodal.build_sample(
            t[:2] + [IMAGE_TOKEN_INDEX] + t[2:],
            [rng.integers(0, 255, size=(80, 64, 3), dtype=np.uint8)], cfg,
        ))
    exp_others = [_static_reference(params, cfg, s, steps) for s in others]
    ids2 = ids1 + r1.emitted + d2
    exp2 = _static_reference(
        params, cfg, multimodal.build_sample(ids2, [img1], cfg), steps
    )

    reqs = [b.submit(s, max_new_tokens=steps) for s in others]
    rres = b.submit(
        multimodal.build_sample(d2, [], cfg), max_new_tokens=steps,
        resume=r1.kv_snapshot,
    )
    by_uid = {r.uid: r for r in b.run()}
    assert by_uid[rres.uid].emitted == exp2
    for req, exp in zip(reqs, exp_others):
        assert by_uid[req.uid].emitted == exp


def test_resume_geometry_validation(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    ids1, img1, d2, _, _ = _conversation(cfg, rng)
    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=2, eos_token_ids=()),
        num_slots=2, max_len=512, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    r1 = _run_one(
        b, multimodal.build_sample(ids1, [img1], cfg), 2, keep_kv=True
    )
    snap = r1.kv_snapshot

    other = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=2, eos_token_ids=()),
        num_slots=2, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    with pytest.raises(ValueError, match="geometry mismatch"):
        other.submit(multimodal.build_sample(d2, [], cfg), resume=snap)

    # a delta that cannot fit the cache above the snapshot is rejected
    big = list(rng.integers(3, cfg.text.vocab_size, size=400))
    with pytest.raises(ValueError, match="delta pads to"):
        b.submit(multimodal.build_sample(big, [], cfg), resume=snap)


def test_resume_pipeline_depth0_partial_coverage(rng):
    """At pipeline_depth=0 the final emitted token's K/V may never be fed;
    the snapshot must then cover fewer reply tokens (n_reply) and a resume
    whose delta re-feeds the uncovered tail must still match full prefill."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    ids1, img1, d2, _, _ = _conversation(cfg, rng)
    steps = 4

    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=2, max_len=512, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla", pipeline_depth=0,
    )
    s1 = multimodal.build_sample(ids1, [img1], cfg)
    r1 = _run_one(b, s1, steps, keep_kv=True)
    snap = r1.kv_snapshot
    assert 0 <= snap.n_reply <= len(r1.emitted)

    # the engine contract: the caller's delta starts after the COVERED ids
    ids2 = ids1 + r1.emitted + d2
    exp2 = _static_reference(
        params, cfg, multimodal.build_sample(ids2, [img1], cfg), steps
    )
    delta = r1.emitted[snap.n_reply:] + d2
    r2 = _run_one(b, multimodal.build_sample(delta, [], cfg), steps,
                  resume=snap)
    assert r2.emitted == exp2


def test_snapshot_truncated(rng):
    """KVSnapshot.truncated(k) drops trailing reply tokens; resuming from the
    shorter prefix (delta re-feeds them) matches full prefill."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    ids1, img1, d2, _, _ = _conversation(cfg, rng)
    steps = 4
    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=2, max_len=512, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    s1 = multimodal.build_sample(ids1, [img1], cfg)
    r1 = _run_one(b, s1, steps, keep_kv=True)
    snap = r1.kv_snapshot
    assert snap.n_reply >= 2
    short = snap.truncated(2)
    assert short.widx == snap.widx - 2 and short.n_reply == snap.n_reply - 2

    ids2 = ids1 + r1.emitted + d2
    exp2 = _static_reference(
        params, cfg, multimodal.build_sample(ids2, [img1], cfg), steps
    )
    delta = r1.emitted[short.n_reply:] + d2
    r2 = _run_one(b, multimodal.build_sample(delta, [], cfg), steps,
                  resume=short)
    assert r2.emitted == exp2
    with pytest.raises(ValueError):
        snap.truncated(snap.n_reply + 1)


def test_no_snapshot_without_keep_kv(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    ids1, img1, _, _, _ = _conversation(cfg, rng)
    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=2, eos_token_ids=()),
        num_slots=2, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    r = _run_one(b, multimodal.build_sample(ids1, [img1], cfg), 2)
    assert r.kv_snapshot is None
