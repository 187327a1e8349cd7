"""Continuous batching correctness: slot-refilled decode must equal the static
batch engine's greedy outputs per request."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation.continuous import ContinuousBatcher
from radvlm_tpu.generation.engine import GenerationConfig, make_generate_fn
from radvlm_tpu.models import multimodal, radvlm


def _mk_sample(cfg, rng, n_text):
    img = rng.integers(0, 255, size=(90, 70, 3), dtype=np.uint8)
    ids = list(rng.integers(3, cfg.text.vocab_size, size=n_text))
    ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
    return multimodal.build_sample(ids, [img], cfg)


def _static_reference(params, cfg, sample, steps):
    gen = GenerationConfig(max_new_tokens=steps, eos_token_ids=())
    gen_fn = make_generate_fn(cfg, gen, attn_impl="xla")
    batch = multimodal.collate([sample], pad_to_multiple=128, left_pad=True)
    out = gen_fn(params, {k: jnp.asarray(v) for k, v in batch.items()},
                 jax.random.key(0))
    return list(np.asarray(out["tokens"])[0, :steps])


def test_continuous_matches_static(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    steps = 5
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8, 14, 7)]
    expected = [_static_reference(params, cfg, s, steps) for s in samples]

    batcher = ContinuousBatcher(
        params, cfg,
        GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=2, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    reqs = [batcher.submit(s) for s in samples]
    finished = list(batcher.run())
    assert len(finished) == 5
    by_uid = {r.uid: r for r in finished}
    for req, exp in zip(reqs, expected):
        got = by_uid[req.uid].emitted
        assert got == exp, f"req {req.uid}: {got} != {exp}"


@pytest.mark.slow
def test_continuous_fill_batch_matches_static(rng):
    """Grouped refills (fill_batch=2: two same-bucket prefills in one
    dispatch) must not change any request's tokens."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    steps = 4
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8, 14, 7)]
    expected = [_static_reference(params, cfg, s, steps) for s in samples]

    batcher = ContinuousBatcher(
        params, cfg,
        GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=4, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla", fill_batch=2,
    )
    reqs = [batcher.submit(s) for s in samples]
    by_uid = {r.uid: r for r in batcher.run()}
    for req, exp in zip(reqs, expected):
        assert by_uid[req.uid].emitted == exp


def test_continuous_eos_and_refill(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    s = _mk_sample(cfg, rng, 6)
    first = _static_reference(params, cfg, s, 1)[0]
    # Declare the first greedy token the eos: requests finish at prefill and the
    # batcher must refill the same slot repeatedly without stalling.
    batcher = ContinuousBatcher(
        params, cfg,
        GenerationConfig(max_new_tokens=4, eos_token_ids=(first,)),
        num_slots=1, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    for _ in range(3):
        batcher.submit(_mk_sample(cfg, rng, 6))
    done = list(batcher.run())
    assert len(done) == 3


def test_cache_full_caps_request(rng):
    """A request whose prompt bucket + max_new_tokens exceeds max_len is capped
    at fill time instead of overwriting the last cache index (ADVICE r1)."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    s = _mk_sample(cfg, rng, 6)
    # prompt pads to 128; cache max_len 128 -> exactly 1 emitted token allowed.
    batcher = ContinuousBatcher(
        params, cfg,
        GenerationConfig(max_new_tokens=50, eos_token_ids=()),
        num_slots=1, max_len=128, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    req = batcher.submit(s)
    done = list(batcher.run())
    assert len(done) == 1 and done[0].uid == req.uid
    assert len(done[0].emitted) == 1
    # A non-aligned max_len rounds UP to the next 128 multiple (Pallas decode
    # kernels need smax % 128 == 0; a stray length silently fell back to the
    # ~2x-slower XLA decode path), and the cap formula applies to the rounded
    # length: 131 -> 256, so a 128-bucket prompt may emit 256 - 128 + 1 = 129.
    batcher2 = ContinuousBatcher(
        params, cfg,
        GenerationConfig(max_new_tokens=200, eos_token_ids=()),
        num_slots=1, max_len=131, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla",
    )
    assert batcher2.max_len == 256
    batcher2.submit(_mk_sample(cfg, rng, 6))
    done2 = list(batcher2.run())
    assert len(done2[0].emitted) == 129  # 256 - 128 + 1


def test_submit_rejects_overlong_prompt(rng):
    """A prompt longer than the largest bucket must be rejected at submit
    (falling through would crash prefill with a negative pad and kill the
    serving engine loop — code-review repro)."""
    import jax

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.generation.continuous import ContinuousBatcher
    from radvlm_tpu.generation.engine import GenerationConfig
    from radvlm_tpu.models import multimodal, radvlm

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=4, eos_token_ids=()),
        num_slots=2, max_len=160, prompt_buckets=(128,),
    )
    assert b.max_len == 256  # lane-aligned rounding (Pallas decode contract)
    img = rng.integers(0, 255, size=(64, 56, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=400))
    long_sample = multimodal.build_sample(ids, [img], cfg)
    assert long_sample.length > 256
    with pytest.raises(ValueError, match="cache holds"):
        b.submit(long_sample, 4)
    # max_new_tokens=0 is clamped (falsy-zero would silently become default)
    short = multimodal.build_sample([5, 6, 7], [], cfg)
    req = b.submit(short, 0)
    assert req.max_new_tokens == 1


def test_per_request_sampling_params(rng):
    """Slots honor per-request temperature: a greedy request in the same
    batch as a hot-temperature request still decodes greedily (matching the
    static engine), while the hot request actually samples."""
    import jax

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.generation.continuous import ContinuousBatcher
    from radvlm_tpu.generation.engine import GenerationConfig
    from radvlm_tpu.models import multimodal, radvlm

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    gen = GenerationConfig(max_new_tokens=8, eos_token_ids=(), temperature=0.0)
    b = ContinuousBatcher(params, cfg, gen, num_slots=2, max_len=256,
                          prompt_buckets=(128,))
    img = rng.integers(0, 255, size=(64, 56, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=8))
    sample = multimodal.build_sample(ids, [img], cfg)

    greedy_req = b.submit(sample, 8)  # engine default: greedy
    hot_req = b.submit(sample, 8, temperature=5.0, top_p=1.0)
    done = {r.uid: r.emitted for r in b.run()}
    assert len(done) == 2

    # reference greedy result from a fresh greedy-only batcher
    b2 = ContinuousBatcher(params, cfg, gen, num_slots=2, max_len=256,
                          prompt_buckets=(128,))
    ref = b2.submit(sample, 8)
    list(b2.run())
    assert done[greedy_req.uid] == ref.emitted
    # the hot-temperature slot diverges from greedy with overwhelming odds
    assert done[hot_req.uid] != ref.emitted


@pytest.mark.slow
def test_warmup_compiles_every_group_size():
    """run() forms same-bucket groups of every size 1..fill_batch (queue
    remainders); warmup must pre-build each size's fill graph or an odd-sized
    group stalls all slots on a mid-stream compile."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=2, eos_token_ids=()),
        num_slots=4, max_len=256, prompt_buckets=(128,), pad_tiles=2,
        attn_impl="xla", fill_batch=3,
    )
    b.warmup()
    assert {nf for (_, nf) in b._fill_fns} == {1, 2, 3}
    assert set(b.warmup_timings) >= {
        "fill_128_x1", "fill_128_x2", "fill_128_x3",
        "decode_greedy", "decode_sampling",
    }


def test_warmup_falls_back_when_fused_w8a8_cannot_compile(monkeypatch):
    """A serving worker must come up even if the fused W8A8 kernel VMEM-OOMs
    at this model's geometry: warmup flips to the XLA emitter and re-warms."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    b = ContinuousBatcher(
        params, cfg, GenerationConfig(max_new_tokens=2, eos_token_ids=()),
        num_slots=2, max_len=256, prompt_buckets=(128,), pad_tiles=2,
        attn_impl="xla",
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # fused is opt-in since the r04 regression A/B (default: xla emitter);
    # the fallback protects the opt-in path.
    monkeypatch.setenv("RADVLM_W8A8_IMPL", "fused")
    calls = []
    real = ContinuousBatcher._warmup_once

    def fake(self):
        calls.append(dict(os.environ).get("RADVLM_W8A8_IMPL"))
        if len(calls) == 1:
            self._fill_fns["poison"] = object()
            raise jax.errors.JaxRuntimeError(
                "Ran out of memory in memory space vmem for "
                "%w8a8_matmul_fused.3 custom-call")
        return real(self)

    import os

    monkeypatch.setattr(ContinuousBatcher, "_warmup_once", fake)
    b.warmup()
    assert calls == ["fused", "xla"]  # retried under the XLA emitter
    assert "poison" not in b._fill_fns  # stale fill graphs dropped

    # non-fused failures propagate
    monkeypatch.setenv("RADVLM_W8A8_IMPL", "xla")

    def boom(self):
        # a DIFFERENT Mosaic kernel failing must not trigger the fallback
        raise jax.errors.JaxRuntimeError(
            "Mosaic decode_attention kernel: scoped vmem limit exceeded")

    monkeypatch.setattr(ContinuousBatcher, "_warmup_once", boom)
    import pytest

    with pytest.raises(jax.errors.JaxRuntimeError):
        b.warmup()


@pytest.mark.slow
def test_parallel_warmup_matches_serial(rng, monkeypatch):
    """RADVLM_PARALLEL_WARMUP=1 (default) AOT-compiles the fill graphs in a
    thread pool and installs the executables; requests served through them
    must match the serial-warmup engine token for token."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(3))
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11)]

    def run(env):
        monkeypatch.setenv("RADVLM_PARALLEL_WARMUP", env)
        b = ContinuousBatcher(
            params, cfg, GenerationConfig(max_new_tokens=4, eos_token_ids=()),
            num_slots=2, max_len=256, prompt_buckets=(128, 256),
            pad_tiles=2, attn_impl="xla",
        )
        b.warmup()
        if env == "1":
            assert "parallel_precompile" in b.warmup_timings
        reqs = [b.submit(s) for s in samples]
        for _ in b.run():
            pass
        return [list(r.emitted) for r in reqs]

    assert run("1") == run("0")
