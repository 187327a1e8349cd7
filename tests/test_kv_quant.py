"""int8 KV cache: quantization helpers, q8 decode kernel parity (interpret
mode), and the continuous engine running end-to-end over the 4-tuple cache."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation.continuous import ContinuousBatcher
from radvlm_tpu.generation.engine import GenerationConfig
from radvlm_tpu.models import multimodal, radvlm
from radvlm_tpu.ops.kv_quant import dequantize_kv, quantize_kv, quantize_kv_row


def test_kv_quant_roundtrip(rng):
    hkv, d, s = 2, 16, 8
    x = jnp.asarray(rng.normal(size=(3, 4, s, hkv * d)), jnp.float32)
    q, sc = quantize_kv(x, hkv)
    assert q.shape == x.shape and q.dtype == jnp.int8
    assert sc.shape == (3, 4, hkv, s)
    back = dequantize_kv(q, sc, hkv, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(x)).max()
    amax = np.abs(np.asarray(x)).max()
    assert err <= amax / 127.0 + 1e-6  # one quantization step

    # single-token row write matches the bulk path
    row = x[0, :, 0, :].reshape(4, hkv * d)
    qr, scr = quantize_kv_row(row, hkv)
    qb, scb = quantize_kv(row[:, None, :], hkv)
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(qb[:, 0]))
    np.testing.assert_allclose(np.asarray(scr), np.asarray(scb[..., 0]))


def _ref_decode_attention(q, ckq, cvq, ksc, vsc, kseg, lidx, hkv, scale):
    """Dequant + dense softmax attention in f64 (numpy) — the math the q8
    kernel folds its scales into."""
    q = np.asarray(q, np.float64)
    ck = np.asarray(
        dequantize_kv(ckq[lidx], ksc[lidx], hkv, jnp.float32), np.float64
    )
    cv = np.asarray(
        dequantize_kv(cvq[lidx], vsc[lidx], hkv, jnp.float32), np.float64
    )
    kseg = np.asarray(kseg)
    b, h, d = q.shape
    s = ck.shape[1]
    g = h // hkv
    out = np.zeros((b, h, d))
    for ib in range(b):
        for ih in range(h):
            kvh = ih // g
            k = ck[ib, :, kvh * d:(kvh + 1) * d]
            v = cv[ib, :, kvh * d:(kvh + 1) * d]
            sc = q[ib, ih] @ k.T * scale
            sc = np.where(kseg[ib] != 0, sc, -1e30)
            p = np.exp(sc - sc.max())
            p /= p.sum()
            out[ib, ih] = p @ v
    return out


def test_q8_decode_kernel_parity(rng):
    from radvlm_tpu.ops.decode_attention import decode_attention_stacked_q8

    L, b, h, hkv, d, s = 3, 2, 4, 2, 64, 256
    scale = d ** -0.5
    kv = jnp.asarray(rng.normal(size=(L, b, s, hkv * d)), jnp.float32)
    vv = jnp.asarray(rng.normal(size=(L, b, s, hkv * d)), jnp.float32)
    ckq, ksc = quantize_kv(kv, hkv)
    cvq, vsc = quantize_kv(vv, hkv)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    kseg = jnp.asarray(rng.integers(0, 2, size=(b, s)), jnp.int32)
    kseg = kseg.at[:, 0].set(1)  # at least one attendable slot per row

    for lidx in range(L):
        got = decode_attention_stacked_q8(
            q, ckq, cvq, ksc, vsc, kseg, lidx,
            num_kv_heads=hkv, interpret=True,
        )
        ref = _ref_decode_attention(
            q, ckq, cvq, ksc, vsc, kseg, lidx, hkv, scale
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-2, rtol=3e-2)


def _mk_sample(cfg, rng, n_text):
    img = rng.integers(0, 255, size=(90, 70, 3), dtype=np.uint8)
    ids = list(rng.integers(3, cfg.text.vocab_size, size=n_text))
    ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
    return multimodal.build_sample(ids, [img], cfg)


def test_continuous_int8_kv(rng):
    """The int8-KV continuous engine: runs to completion, deterministic, and
    its prefill-sampled first token bit-matches the bf16 engine (prefill math
    is identical; only cached decode sees quantization error)."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    steps = 5
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8)]

    def run(kv_quant, seed=0):
        b = ContinuousBatcher(
            params, cfg,
            GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
            num_slots=2, max_len=256, prompt_buckets=(128,),
            pad_tiles=2, attn_impl="xla", kv_quant=kv_quant, seed=seed,
        )
        assert (len(b.cache) == 4) == kv_quant
        reqs = [b.submit(s) for s in samples]
        done = {r.uid: r.emitted for r in b.run()}
        return [done[r.uid] for r in reqs]

    q8_a = run(True)
    q8_b = run(True)
    bf16 = run(False)
    assert q8_a == q8_b  # greedy decode over int8 cache is deterministic
    for got, ref in zip(q8_a, bf16):
        assert len(got) == steps
        assert got[0] == ref[0]  # prefill token is quantization-free
