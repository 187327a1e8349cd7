"""Sequence-parallel decode: cache sharded over the seq axis, per-shard
partial attention merged with the distributed flash-decoding combine.
Logits must match single-device decode step for step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation import engine
from radvlm_tpu.models import multimodal, qwen2, radvlm
from radvlm_tpu.parallel.mesh import make_mesh
from radvlm_tpu.parallel.sp_decode import enable_sp_decode, make_sp_decode_step


@pytest.fixture
def sp_cleanup():
    yield
    enable_sp_decode(None)


@pytest.mark.slow
def test_sp_decode_matches_plain(rng, sp_cleanup):
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=60))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [sample, sample], pad_len=256, pad_to_multiple=256, left_pad=True
    ).items()}
    max_len = 256 + 64  # divisible by 8 shards -> 40 local rows

    cache, cache_seg, logits = engine.prefill(
        params, cfg, batch, max_len, attn_impl="xla"
    )
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    lengths = batch["lengths"]
    l = batch["tokens"].shape[1]

    # Plain single-device decode trace.
    cache_p, seg_p, tok_p = cache, cache_seg, tok
    plain_logits = []
    for step in range(4):
        cache_p, seg_p, lg = engine.decode_step(
            params, cfg, cache_p, seg_p, tok_p, lengths + step, l + step,
            attn_impl="xla",
        )
        plain_logits.append(np.asarray(lg))
        tok_p = jnp.argmax(lg, -1).astype(jnp.int32)

    # Sequence-parallel decode over an 8-way seq mesh.
    mesh = make_mesh({"seq": 8})
    sp_step = make_sp_decode_step(cfg.text, mesh)
    cache_spec = NamedSharding(mesh, P(None, None, "seq", None))
    seg_spec = NamedSharding(mesh, P(None, "seq"))
    ck = jax.device_put(cache[0], cache_spec)
    cv = jax.device_put(cache[1], cache_spec)
    seg_s = jax.device_put(cache_seg, seg_spec)
    tok_s = tok
    for step in range(4):
        (ck, cv), seg_s, lg = sp_step(
            params["text"], (ck, cv), seg_s, tok_s, lengths + step, l + step
        )
        np.testing.assert_allclose(
            np.asarray(lg), plain_logits[step], atol=2e-4, rtol=2e-3
        )
        tok_s = jnp.argmax(lg, -1).astype(jnp.int32)

    # Cache contents written by SP match the plain cache at valid positions.
    valid = np.asarray(seg_p)[None, :, :, None] != 0
    np.testing.assert_allclose(
        np.where(valid, np.asarray(ck), 0),
        np.where(valid, np.asarray(cache_p[0]), 0),
        atol=2e-2, rtol=2e-2,
    )
    np.testing.assert_array_equal(np.asarray(seg_s), np.asarray(seg_p))


def test_sp_generate_matches_plain_engine(rng, sp_cleanup):
    """Composed long-context path (SP prefill -> cache-sharded decode) emits
    the same greedy tokens as the single-device engine."""
    from radvlm_tpu.generation.engine import (
        GenerationConfig,
        make_generate_fn,
        make_sp_generate_fn,
    )
    from radvlm_tpu.parallel.ring import enable_ring_attention

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=50))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [sample], pad_len=256, pad_to_multiple=256, left_pad=True
    ).items()}

    gen = GenerationConfig(max_new_tokens=4, eos_token_ids=())
    plain = make_generate_fn(cfg, gen, attn_impl="xla")
    out_p = plain(params, batch, jax.random.key(1))

    mesh = make_mesh({"seq": 8})
    sp_gen = make_sp_generate_fn(cfg, mesh, gen, local_impl="xla")
    out_s = sp_gen(params, batch, jax.random.key(1))
    enable_ring_attention(None)

    np.testing.assert_array_equal(
        np.asarray(out_p["tokens"]), np.asarray(out_s["tokens"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_p["num_tokens"]), np.asarray(out_s["num_tokens"])
    )


def test_sp_decode_heavily_left_padded(rng, sp_cleanup):
    """An all-padding shard must not poison the merge (code-review repro: the
    0.0 empty-shard sentinel inflated the global max and underflowed the
    rescale weights when valid scores were very negative)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    # tiny prompt, heavy left pad: several shards hold only padding
    sample = multimodal.build_sample(
        [5] + list(rng.integers(2, 400, size=6)), [], cfg
    )
    batch = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [sample], pad_len=256, pad_to_multiple=256, left_pad=True
    ).items()}
    max_len = 256 + 64

    cache, cache_seg, logits = engine.prefill(
        params, cfg, batch, max_len, attn_impl="xla"
    )
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    lengths = batch["lengths"]
    l = batch["tokens"].shape[1]

    cache_p, seg_p = cache, cache_seg
    cache_p, seg_p, lg_plain = engine.decode_step(
        params, cfg, cache_p, seg_p, tok, lengths, l, attn_impl="xla"
    )

    mesh = make_mesh({"seq": 8})
    sp_step = make_sp_decode_step(cfg.text, mesh)
    cache_spec = NamedSharding(mesh, P(None, None, "seq", None))
    seg_spec = NamedSharding(mesh, P(None, "seq"))
    ck = jax.device_put(cache[0], cache_spec)
    cv = jax.device_put(cache[1], cache_spec)
    seg_s = jax.device_put(cache_seg, seg_spec)
    (ck, cv), seg_s, lg_sp = sp_step(
        params["text"], (ck, cv), seg_s, tok, lengths, l
    )
    np.testing.assert_allclose(
        np.asarray(lg_sp), np.asarray(lg_plain), atol=5e-4, rtol=2e-3
    )


@pytest.mark.slow
def test_sp_decode_int8_cache_matches_plain_int8(rng, sp_cleanup):
    """SP decode over the int8 KV cache (4-tuple layout, scales sharded on
    their token axis) must match single-device int8 decode step for step —
    both paths quantize identically, so only the distributed lse merge
    differs (VERDICT r4 item 6: the capacity win of int8 KV is what
    long-context SP serving exists for)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=60))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [sample, sample], pad_len=256, pad_to_multiple=256, left_pad=True
    ).items()}
    max_len = 256 + 64

    cache, cache_seg, logits = engine.prefill(
        params, cfg, batch, max_len, attn_impl="xla", cache_format="int8"
    )
    assert len(cache) == 4
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    lengths = batch["lengths"]
    l = batch["tokens"].shape[1]

    # Plain single-device int8 decode trace.
    cache_p, seg_p, tok_p = cache, cache_seg, tok
    plain_logits = []
    for step in range(4):
        cache_p, seg_p, lg = engine.decode_step(
            params, cfg, cache_p, seg_p, tok_p, lengths + step, l + step,
            attn_impl="xla",
        )
        plain_logits.append(np.asarray(lg))
        tok_p = jnp.argmax(lg, -1).astype(jnp.int32)

    # SP int8 decode over an 8-way seq mesh.
    mesh = make_mesh({"seq": 8})
    sp_step = make_sp_decode_step(cfg.text, mesh, kv_quant=True)
    cache_spec = NamedSharding(mesh, P(None, None, "seq", None))
    scale_spec = NamedSharding(mesh, P(None, None, None, "seq"))
    seg_spec = NamedSharding(mesh, P(None, "seq"))
    cache_s = (
        jax.device_put(cache[0], cache_spec),
        jax.device_put(cache[1], cache_spec),
        jax.device_put(cache[2], scale_spec),
        jax.device_put(cache[3], scale_spec),
    )
    seg_s = jax.device_put(cache_seg, seg_spec)
    tok_s = tok
    for step in range(4):
        cache_s, seg_s, lg = sp_step(
            params["text"], cache_s, seg_s, tok_s, lengths + step, l + step
        )
        np.testing.assert_allclose(
            np.asarray(lg), plain_logits[step], atol=2e-4, rtol=2e-3,
            err_msg=f"step {step}",
        )
        tok_s = jnp.argmax(lg, -1).astype(jnp.int32)

    # int8 payloads + scales written by SP match the plain cache at valid
    # positions to within one quantization step (the replicated k/v compute
    # fuses differently under shard_map -> rare 1-ulp bf16 diffs that flip
    # round-to-nearest at the boundary; logits already matched above).
    valid = np.asarray(seg_p) != 0  # [B, Smax]
    a8 = np.where(valid[None, :, :, None], np.asarray(cache_s[0]), 0).astype(np.int32)
    b8 = np.where(valid[None, :, :, None], np.asarray(cache_p[0]), 0).astype(np.int32)
    assert np.abs(a8 - b8).max() <= 1
    np.testing.assert_allclose(
        np.where(valid[None, :, None, :], np.asarray(cache_s[2]), 0),
        np.where(valid[None, :, None, :], np.asarray(cache_p[2]), 0),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(seg_s), np.asarray(seg_p))


def test_sp_generate_int8_matches_bf16_tokens(rng, sp_cleanup):
    """Composed SP path with kv_quant: greedy tokens must match the bf16-cache
    SP path (int8 KV error is well under greedy decision margins on this
    tiny model)."""
    from radvlm_tpu.generation.engine import GenerationConfig, make_sp_generate_fn
    from radvlm_tpu.parallel.ring import enable_ring_attention

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=50))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [sample], pad_len=256, pad_to_multiple=256, left_pad=True
    ).items()}

    gen = GenerationConfig(max_new_tokens=4, eos_token_ids=())
    mesh = make_mesh({"seq": 8})
    out_bf16 = make_sp_generate_fn(cfg, mesh, gen, local_impl="xla")(
        params, batch, jax.random.key(1)
    )
    out_int8 = make_sp_generate_fn(cfg, mesh, gen, local_impl="xla",
                                   kv_quant=True)(
        params, batch, jax.random.key(1)
    )
    enable_ring_attention(None)
    np.testing.assert_array_equal(
        np.asarray(out_bf16["tokens"]), np.asarray(out_int8["tokens"])
    )
