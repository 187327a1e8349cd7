"""Flash-attention kernel parity vs the XLA reference implementation.

Runs the Pallas kernel in interpreter mode on CPU (the TPU-native answer to
"unit-test a CUDA kernel without a GPU"); the same code path compiles on real TPU.
Covers: non-causal, causal, segment-id masking (padding + packing), GQA, and the
custom-VJP backward against jax.grad of the reference.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radvlm_tpu.ops.attention import make_attention_mask, mha_reference
from radvlm_tpu.ops.flash_attention import flash_attention


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape), dtype)


def _ref(q, k, v, qseg=None, kseg=None, causal=False):
    mask = None
    if qseg is not None:
        mask = make_attention_mask(qseg, kseg, causal)
    elif causal:
        b = q.shape[0]
        ones_q = jnp.ones((b, q.shape[1]), jnp.int32)
        ones_k = jnp.ones((b, k.shape[1]), jnp.int32)
        mask = make_attention_mask(ones_q, ones_k, causal)
    return mha_reference(q, k, v, mask=mask)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [1, 2])
def test_forward_parity(rng, causal, gqa):
    b, s, h, d = 2, 256, 4, 64
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h // gqa, d))
    v = _rand(rng, (b, s, h // gqa, d))
    out = flash_attention(
        q, k, v, causal=causal, block_q=128, block_k=128, interpret=True
    )
    ref = _ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_segment_ids_padding_and_packing(rng):
    b, s, h, d = 2, 256, 2, 64
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    # Row 0: two packed segments + tail padding; row 1: one segment + padding.
    seg = np.zeros((b, s), np.int32)
    seg[0, :100] = 1
    seg[0, 100:200] = 2
    seg[1, :173] = 1
    seg = jnp.asarray(seg)
    out = flash_attention(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
        block_q=128, block_k=128, interpret=True,
    )
    ref = _ref(q, k, v, qseg=seg, kseg=seg, causal=True)
    valid = np.asarray(seg)[:, :, None, None] != 0
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("gqa", [1, 2])
def test_backward_parity(rng, gqa):
    b, s, h, d = 1, 256, 2, 64
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h // gqa, d))
    v = _rand(rng, (b, s, h // gqa, d))
    seg = np.zeros((b, s), np.int32)
    seg[0, :200] = 1
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
            block_q=128, block_k=128, interpret=True,
        )
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def loss_ref(q, k, v):
        o = _ref(q, k, v, qseg=seg, kseg=seg, causal=True)
        # Zero out padding rows: the flash kernel emits 0 there, the reference
        # emits an arbitrary masked-softmax value; grads through padding rows are
        # irrelevant (loss masks them in real training).
        o = o * (seg != 0)[:, :, None, None]
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name} mismatch",
        )


def test_prefill_into_longer_cache(rng):
    """Sq < Sk: prompt prefill writing into a preallocated decode cache — future
    cache slots are zeros with segment id 0 and must not affect the output."""
    b, sq, sk, h, d = 2, 256, 384, 2, 64
    q = _rand(rng, (b, sq, h, d))
    k = jnp.zeros((b, sk, h, d)).at[:, :sq].set(_rand(rng, (b, sq, h, d)))
    v = jnp.zeros((b, sk, h, d)).at[:, :sq].set(_rand(rng, (b, sq, h, d)))
    qseg = np.zeros((b, sq), np.int32)
    qseg[0, :200] = 1
    qseg[1, :] = 1
    kseg = np.concatenate([qseg, np.zeros((b, sk - sq), np.int32)], axis=1)
    qseg, kseg = jnp.asarray(qseg), jnp.asarray(kseg)
    out = flash_attention(
        q, k, v, q_segment_ids=qseg, kv_segment_ids=kseg, causal=True,
        block_q=128, block_k=128, interpret=True,
    )
    ref = _ref(q, k, v, qseg=qseg, kseg=kseg, causal=True)
    valid = np.asarray(qseg)[:, :, None, None] != 0
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5, rtol=2e-5
    )


def test_decode_attention_stacked(rng):
    """Fused-heads decode kernel over the stacked [L,B,S,Hkv*D] cache vs the XLA
    reference, including partially-written cache (segment id 0 tail)."""
    from radvlm_tpu.ops.decode_attention import decode_attention_stacked

    L, B, S, H, HKV, D = 3, 2, 256, 4, 2, 64
    q = _rand(rng, (B, H, D))
    ck = _rand(rng, (L, B, S, HKV * D))
    cv = _rand(rng, (L, B, S, HKV * D))
    seg = np.zeros((B, S), np.int32)
    seg[0, :100] = 1
    seg[1, :256] = 1
    seg = jnp.asarray(seg)
    for li in range(L):
        out = decode_attention_stacked(
            q, ck, cv, seg, jnp.int32(li), num_kv_heads=HKV,
            block_k=128, interpret=True,
        )
        k = ck[li].reshape(B, S, HKV, D)
        v = cv[li].reshape(B, S, HKV, D)
        ref = mha_reference(
            q[:, None], k, v,
            mask=make_attention_mask(jnp.ones((B, 1), jnp.int32), seg, False),
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"layer {li}",
        )


def test_bf16_forward(rng):
    b, s, h, d = 1, 256, 2, 128
    q = _rand(rng, (b, s, h, d), jnp.bfloat16)
    k = _rand(rng, (b, s, h, d), jnp.bfloat16)
    v = _rand(rng, (b, s, h, d), jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128,
                          interpret=True)
    ref = _ref(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_with_lse_grad_parity(rng):
    """flash_attention_with_lse is differentiable through BOTH outputs: the lse
    cotangent folds into the FA2 backward as delta - dlse (ring attention's
    merge backpropagates through o and lse)."""
    from radvlm_tpu.ops.flash_attention import flash_attention_with_lse
    from radvlm_tpu.parallel.ring import _local_attn_with_lse

    b, s, h, d = 1, 256, 2, 64
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    seg = np.zeros((b, s), np.int32)
    seg[0, :200] = 1
    seg = jnp.asarray(seg)
    w = _rand(rng, (b, h, s))  # random lse cotangent weights

    def loss_flash(q, k, v):
        o, lse = flash_attention_with_lse(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
            block_q=128, block_k=128, interpret=True,
        )
        lse_ok = jnp.where(jnp.isfinite(lse), lse, 0.0)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(w * lse_ok)

    def loss_ref(q, k, v):
        o, lse = _local_attn_with_lse(
            q, k, v, seg, seg, causal=True, scale=d ** -0.5, impl="xla"
        )
        valid = (seg != 0)[:, None, :]
        o = o * (seg != 0)[:, :, None, None]
        lse_ok = jnp.where(valid, jnp.where(jnp.isfinite(lse), lse, 0.0), 0.0)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(w * lse_ok)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("with_segs", [False, True])
def test_non_divisible_seq_pads_to_blocks(rng, with_segs):
    """Sequence lengths that don't divide the preferred block (the 3456-token
    prompt bucket = 27 x 128) must be right-padded to block granularity
    instead of silently degrading to 128 x 128 tiles (measured 24 TF/s vs
    73+ on v5e — attention was 57% of the 7B batch-1 prefill). Pad tokens ride
    segment id 0, so outputs on real rows are unchanged."""
    b, s, h, d = 1, 384, 2, 64  # 384 > block 256, 128-aligned, -> pads to 512
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    if with_segs:
        seg = np.zeros((b, s), np.int32)
        seg[0, :330] = 1
        seg = jnp.asarray(seg)
    else:
        seg = None
    out = flash_attention(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
        block_q=256, block_k=256, interpret=True,
    )
    assert out.shape == q.shape
    ref = _ref(q, k, v, qseg=seg, kseg=seg, causal=True)
    valid = (
        np.asarray(seg)[:, :, None, None] != 0
        if with_segs else np.ones((b, s, 1, 1), bool)
    )
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5, rtol=2e-5
    )


def test_non_divisible_seq_backward_parity(rng):
    """Grads flow through the pad/slice wrapper unchanged on real rows."""
    b, s, h, d = 1, 384, 2, 64
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    seg = np.zeros((b, s), np.int32)
    seg[0, :330] = 1
    seg = jnp.asarray(seg)
    w = jnp.cos(jnp.arange(b * s * h * d, dtype=jnp.float32)).reshape(q.shape)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
            block_q=256, block_k=256, interpret=True,
        )
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        o = _ref(q, k, v, qseg=seg, kseg=seg, causal=True)
        o = o * (seg != 0)[:, :, None, None]
        return jnp.sum(o * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name} mismatch",
        )


def test_segment_ids_small_block_raises(rng):
    """Segment-id masking requires 128-multiple blocks; short sequences must
    fail loudly rather than emit a zero-width tile (VERDICT weak #6)."""
    b, s, h, d = 1, 64, 2, 64
    q = _rand(rng, (b, s, h, d))
    seg = jnp.ones((b, s), jnp.int32)
    with pytest.raises(ValueError, match="multiples of 128"):
        flash_attention(q, q, q, q_segment_ids=seg, kv_segment_ids=seg,
                        causal=True, interpret=True)


def test_fully_masked_rows_contract(rng):
    """Padding rows (segment id 0 everywhere) must emit ZERO output and -inf
    lse — the ring merge's guards depend on it (code-review repro: masked
    entries hit exp(s - m) = 1 and the row silently averaged V)."""
    from radvlm_tpu.ops.flash_attention import flash_attention_with_lse

    b, s, h, d = 1, 256, 2, 64
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    seg = np.ones((b, s), np.int32)
    seg[:, 128:] = 0  # second half fully padding
    seg = jnp.asarray(seg)
    o, lse = flash_attention_with_lse(
        q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(o[:, 128:]), 0.0)
    assert np.all(np.isneginf(np.asarray(lse)[:, :, 128:]))
    # real rows unaffected
    assert np.isfinite(np.asarray(lse)[:, :, :128]).all()
    assert np.abs(np.asarray(o[:, :128])).max() > 0


def test_short_single_pass_kernel_tower_shape(rng):
    """The single-pass short-sequence kernel (`_fwd_short`) at the SigLIP
    tower's exact shape: 729 tokens (no power-of-two block divides it),
    head_dim 72, 16 heads -> 4 heads per grid cell. Reference contract:
    729 tokens/tile, 26 layers (siglip_encoder.py:570,582)."""
    from radvlm_tpu.ops import flash_attention as fa

    b, s, h, d = 2, 729, 16, 72
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    assert fa._short_eligible(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), None, False
    )
    out = flash_attention(q, k, v, causal=False, interpret=True)
    ref = _ref(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    # Differentiation routes through the general kernel (custom-VJP fwd rule)
    # and must still match grad-of-reference.
    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=False, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, causal=False) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4)
