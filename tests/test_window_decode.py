"""Windowed decode-attention kernels (speculative verify windows).

Parity of `decode_attention_stacked_window{,_q8}` against a numpy reference
implementing the engine's verify-window contract: query j of row b sits at
cache slot widx[b]+j and attends slots <= widx[b]+j with nonzero segment id
(the mha(q_offset=cache_index) fallback semantics in models/qwen2._block_cached).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu.ops.decode_attention import (
    decode_attention_stacked_window,
    decode_attention_stacked_window_q8,
)
from radvlm_tpu.ops.kv_quant import quantize_kv


def _ref_window(q, ck, cv, kseg, widx, hkv, scale, ks=None, vs=None):
    """q [B,W,H,D]; ck/cv [B,S,Hkv*D] (one layer, dequantized if ks/vs)."""
    b, w, h, d = q.shape
    s = ck.shape[1]
    g = h // hkv
    out = np.zeros((b, w, h, d), np.float32)
    for ib in range(b):
        for iw in range(w):
            for ih in range(h):
                kvh = ih // g
                k = np.asarray(ck[ib, :, kvh * d:(kvh + 1) * d], np.float32)
                v = np.asarray(cv[ib, :, kvh * d:(kvh + 1) * d], np.float32)
                if ks is not None:
                    k = k * np.asarray(ks[ib, kvh])[:, None]
                    v = v * np.asarray(vs[ib, kvh])[:, None]
                sc = np.asarray(q[ib, iw, ih], np.float32) @ k.T * scale
                allowed = (np.asarray(kseg[ib]) != 0) & (
                    np.arange(s) <= int(widx[ib]) + iw
                )
                sc = np.where(allowed, sc, -1e30)
                p = np.exp(sc - sc.max())
                p /= p.sum()
                out[ib, iw, ih] = p @ v
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_window_decode_parity(rng):
    L, B, W, H, HKV, D, S = 2, 2, 3, 4, 2, 64, 256
    scale = D ** -0.5
    q = jnp.asarray(rng.normal(size=(B, W, H, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, B, S, HKV * D)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(L, B, S, HKV * D)), jnp.float32)
    widx = jnp.asarray([100, 37], jnp.int32)
    seg = np.zeros((B, S), np.int32)
    seg[0, :100 + W] = 1
    seg[1, :37 + W] = 1
    seg = jnp.asarray(seg)
    for li in range(L):
        got = decode_attention_stacked_window(
            q, ck, cv, seg, jnp.int32(li), widx,
            num_kv_heads=HKV, block_k=128, interpret=True,
        )
        ref = _ref_window(q, ck[li], cv[li], seg, widx, HKV, scale)
        np.testing.assert_allclose(
            np.asarray(got), ref, atol=2e-5, rtol=2e-5, err_msg=f"layer {li}"
        )


def test_window_decode_q8_parity(rng):
    L, B, W, H, HKV, D, S = 2, 2, 5, 4, 2, 64, 256
    scale = D ** -0.5
    q = jnp.asarray(rng.normal(size=(B, W, H, D)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(L, B, S, HKV * D)), jnp.float32)
    vv = jnp.asarray(rng.normal(size=(L, B, S, HKV * D)), jnp.float32)
    ckq, ksc = quantize_kv(kv, HKV)
    cvq, vsc = quantize_kv(vv, HKV)
    widx = jnp.asarray([10, 200], jnp.int32)
    seg = np.zeros((B, S), np.int32)
    seg[0, :10 + W] = 1
    seg[1, :200 + W] = 1
    seg = jnp.asarray(seg)
    for li in range(L):
        got = decode_attention_stacked_window_q8(
            q, ckq, cvq, ksc, vsc, seg, jnp.int32(li), widx,
            num_kv_heads=HKV, block_k=128, interpret=True,
        )
        ref = _ref_window(
            q, ckq[li], cvq[li], seg, widx, HKV, scale,
            ks=ksc[li], vs=vsc[li],
        )
        np.testing.assert_allclose(
            np.asarray(got), ref, atol=3e-2, rtol=3e-2, err_msg=f"layer {li}"
        )


def test_window_kernel_dispatch_in_model(monkeypatch):
    """The _block_cached WINDOW DISPATCH itself: a spec-style verify-window
    forward through models/qwen2.forward with the Pallas kernel forced on
    (default_backend monkeypatched to "tpu", kernel run in interpret mode)
    must match the same forward on the XLA mha fallback path."""
    import dataclasses

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.models import qwen2
    import radvlm_tpu.ops.decode_attention as da

    cfg = dataclasses.replace(
        cfglib.tiny_test_config().text, head_dim=64
    )  # decode_kernel_eligible needs head_dim % 64 == 0
    params = qwen2.init_params(cfg, jax.random.key(0))
    b, prompt_len, max_len, w = 2, 8, 128, 4
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(
        rng.integers(3, cfg.vocab_size, size=(b, prompt_len)), jnp.int32
    )
    window = jnp.asarray(
        rng.integers(3, cfg.vocab_size, size=(b, w)), jnp.int32
    )
    calls = []

    def run(force_kernel: bool):
        cache = qwen2.init_kv_cache(cfg, b, max_len)
        seg = jnp.zeros((b, max_len), jnp.int32).at[:, :prompt_len].set(1)
        embeds = qwen2.embed_tokens(params, prompt, cfg)
        _, cache = qwen2.forward(
            params, cfg, input_embeds=embeds,
            positions=jnp.broadcast_to(
                jnp.arange(prompt_len), (b, prompt_len)
            ),
            segment_ids=jnp.ones((b, prompt_len), jnp.int32),
            kv_cache=cache, cache_index=0, cache_segment_ids=seg,
            attn_impl="xla",
        )
        offs = jnp.full((b,), prompt_len, jnp.int32)  # per-row -> window path
        idxw = offs[:, None] + jnp.arange(w)[None]
        seg = seg.at[jnp.arange(b)[:, None], idxw].set(1)
        wemb = qwen2.embed_tokens(params, window, cfg)
        with monkeypatch.context() as m:
            if force_kernel:
                real = da.decode_attention_stacked_window

                def spy(*a, **kw):
                    calls.append(1)
                    return real(*a, **{**kw, "interpret": True})

                m.setattr(da, "decode_attention_stacked_window", spy)
                m.setattr(jax, "default_backend", lambda: "tpu")
                assert qwen2.decode_kernel_eligible(cfg, max_len, "auto")
            logits, _ = qwen2.forward(
                params, cfg, input_embeds=wemb,
                positions=idxw,
                segment_ids=jnp.ones((b, w), jnp.int32),
                kv_cache=cache, cache_index=offs, cache_segment_ids=seg,
                attn_impl="auto" if force_kernel else "xla",
            )
        return np.asarray(logits, np.float32)

    got, ref = run(True), run(False)
    assert calls, "window kernel was not dispatched by _block_cached"
    # atol only: the two paths' online-softmax accumulation orders differ by
    # f32 rounding, which layernorm + unembed amplify to ~5e-4 on these
    # random-init tiny-model logits (near-zero entries make rtol meaningless).
    np.testing.assert_allclose(got, ref, atol=1e-3)
