"""Attention ops: XLA reference implementation + dispatch to the Pallas flash kernel.

TPU-native replacement for the reference's flash-attn-2 CUDA dependency
(`finetuning/llava/train/train.py:166`, `llama_flash_attn_monkey_patch.py:8-13`).
Padded/packed batches are handled with segment IDs instead of cu_seqlens varlen
kernels (`modeling_llama.py:505-533`) — segment-id masking composes with XLA's static
shapes and with the Pallas kernel's block masking.

Layout convention everywhere: [batch, seq, heads, head_dim] ("BSHD").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attention_mask(
    q_segment_ids: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,
    causal: bool,
    q_offset: int | jnp.ndarray = 0,
    window: int = 0,
) -> jnp.ndarray:
    """Boolean [B, 1, Sq, Sk] mask. True = attend.

    Segment id 0 means padding; tokens only attend within their own segment.
    `q_offset` shifts query positions (used at decode time when the query block sits
    at position `cache_len` of the KV sequence). `window` > 0 additionally
    restricts attention to the previous `window` positions (Mistral
    sliding-window; HF semantics: key in (q_pos - window, q_pos]).
    """
    seg_mask = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]) & (
        q_segment_ids[:, :, None] != 0
    )
    if causal:
        sq, sk = q_segment_ids.shape[1], kv_segment_ids.shape[1]
        k_pos = jnp.arange(sk)[None, None, :]
        if getattr(q_offset, "ndim", 0) == 1:  # per-row offsets ([B])
            q_pos = jnp.arange(sq)[None, :, None] + q_offset[:, None, None]
        else:
            q_pos = (jnp.arange(sq)[:, None] + q_offset)[None]
        seg_mask = seg_mask & (q_pos >= k_pos)
        if window:
            seg_mask = seg_mask & (q_pos - k_pos < window)
    return seg_mask[:, None, :, :]


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, Hkv, D] -> [B, S, Hkv*n_rep, D] for grouped-query attention."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def alibi_head_slopes(num_heads: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """Per-head ALiBi slopes, HF MPT convention (`build_mpt_alibi_tensor`):
    geometric 1/2^(i * max/P2) over the next power-of-two head count P2, then
    (for non-power-of-two head counts) odd-index slopes first."""
    import math

    p2 = 2 ** math.ceil(math.log2(num_heads))
    base = jnp.arange(1, p2 + 1, dtype=jnp.float32) * (alibi_bias_max / p2)
    slopes = 1.0 / jnp.power(2.0, base)
    if p2 != num_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes


def alibi_bias(
    num_heads: int, sk: int, alibi_bias_max: int = 8
) -> jnp.ndarray:
    """[1, H, 1, Sk] key-position ALiBi bias: slope * (k - (Sk-1)).

    HF MPT applies a key-only bias (queries all see the same ramp); for causal
    attention this is softmax-equivalent to the relative -slope*(q-k) form —
    the per-query constant shift cancels in the softmax."""
    slopes = alibi_head_slopes(num_heads, alibi_bias_max)
    pos = jnp.arange(sk, dtype=jnp.float32) - (sk - 1)
    return (slopes[:, None] * pos[None, :])[None, :, None, :]


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain XLA attention. q:[B,Sq,H,D] k,v:[B,Sk,Hkv,D] mask:[B,1,Sq,Sk] bool.

    Softmax runs in fp32 regardless of input dtype (bf16-safe), output matches the
    query dtype. GQA is handled by repeating KV heads. `bias` (broadcastable to
    [B, H, Sq, Sk], e.g. ALiBi) adds to the scaled logits before masking.
    """
    b, sq, h, d = q.shape
    hkv = k.shape[2]
    if hkv != h:
        k = repeat_kv(k, h // hkv)
        v = repeat_kv(v, h // hkv)
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    q_offset: int | jnp.ndarray = 0,
    scale: Optional[float] = None,
    impl: str = "auto",
    window: int = 0,
    alibi: int = 0,
) -> jnp.ndarray:
    """Multi-head attention entry point used by all models.

    window > 0 (Mistral sliding-window) is masked in the XLA path; the flash
    kernels have no window support, so a window forces the XLA path (the
    Mistral family is coverage, not the flagship hot loop). alibi > 0 (the
    MPT family's `alibi_bias_max`) adds the per-head key-position bias and
    likewise forces the XLA path.

    q: [B, Sq, H, D]; k/v: [B, Sk, Hkv, D]. (The decode hot path does not come
    through here — `models/qwen2._block_cached` calls the Pallas decode kernel on
    the stacked cache directly.)

    impl: "auto" picks a Pallas kernel on TPU where profitable, otherwise the XLA
    reference path. "xla" / "flash" force a path. "ring" runs sequence-parallel
    ring attention over the mesh registered with
    `parallel.ring.enable_ring_attention` (training-only: causal self-attention
    with equal q/kv lengths).
    """
    if impl == "ring":
        from radvlm_tpu.parallel.ring import ring_attention_sharded

        assert causal and k.shape[1] == q.shape[1], (
            "ring attention is for causal self-attention (training prefill)"
        )
        assert window == 0, "ring attention has no sliding-window support"
        assert alibi == 0, "ring attention has no ALiBi support"
        return ring_attention_sharded(
            q, k, v, q_segment_ids, kv_segment_ids,
            causal=True, scale=scale if scale is not None else q.shape[-1] ** -0.5,
        )
    sk = k.shape[1]
    use_flash = False
    if window or alibi:
        impl = "xla"  # flash kernels have no sliding-window/ALiBi support
    if impl == "flash" and not (isinstance(q_offset, int) and q_offset == 0):
        # The flash kernel has no q_offset support: a query block sitting at
        # a nonzero (or per-row) cache offset — speculative verify windows and
        # resume delta prefills (`qwen2._block_cached` s>1) — would be masked
        # as absolute positions 0..Sq. Force the XLA path rather than emit
        # wrong attention under an explicit impl="flash".
        impl = "xla"
    if impl == "flash":
        use_flash = True
    elif impl == "auto":
        try:
            platform = q.devices().pop().platform if hasattr(q, "devices") else None
        except Exception:
            platform = None
        if platform is None:
            platform = jax.default_backend()
        # Flash kernel needs lane-aligned head_dim and block-aligned sequence
        # lengths; use it for prefill-sized problems (the 729-token/head_dim-72
        # SigLIP tower stays on the fused-XLA path). Covers plain prefill
        # (Sq == Sk) and prefill into a longer preallocated KV cache (Sq < Sk
        # with q_offset 0: future cache slots are masked by the causal mask +
        # kv segment ids).
        is_static_zero_offset = isinstance(q_offset, int) and q_offset == 0
        use_flash = (
            platform == "tpu"
            and q.shape[1] >= 128
            and q.shape[1] % 128 == 0
            and sk % 128 == 0
            and sk >= q.shape[1]
            and q.shape[3] % 64 == 0
            and is_static_zero_offset
            and (sk == q.shape[1] or (causal and q_segment_ids is not None))
        )
        # Small square attention with no mask at all (the 729-token SigLIP
        # tiles): single whole-sequence block, any alignment — measured 1.6x
        # faster than the XLA path which materializes the [B,H,S,S] logits.
        use_flash = use_flash or (
            platform == "tpu"
            and q_segment_ids is None
            and not causal
            and sk == q.shape[1]
            and 128 <= sk <= 1024
            and q.shape[3] <= 128
            and is_static_zero_offset
        )
    if use_flash:
        from radvlm_tpu.ops import flash_attention as fa

        return fa.flash_attention(
            q,
            k,
            v,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            causal=causal,
            scale=scale,
        )
    mask = None
    if q_segment_ids is not None:
        mask = make_attention_mask(
            q_segment_ids, kv_segment_ids, causal, q_offset, window
        )
    elif causal:
        b = q.shape[0]
        ones_q = jnp.ones((b, q.shape[1]), jnp.int32)
        ones_k = jnp.ones((b, k.shape[1]), jnp.int32)
        mask = make_attention_mask(ones_q, ones_k, causal, q_offset, window)
    bias = alibi_bias(q.shape[2], sk, alibi) if alibi else None
    return mha_reference(q, k, v, mask=mask, scale=scale, bias=bias)


def llama3_scale_inv_freq(
    inv_freq: jnp.ndarray,
    *,
    factor: float,
    low_freq_factor: float,
    high_freq_factor: float,
    original_max_position: int,
) -> jnp.ndarray:
    """Llama-3.1 frequency-dependent rope remap (HF `_compute_llama3_parameters`):
    long-wavelength components are divided by `factor`, short wavelengths kept,
    mid-band smoothly interpolated."""
    import numpy as _np

    low_wavelen = original_max_position / low_freq_factor
    high_wavelen = original_max_position / high_freq_factor
    wavelen = 2.0 * _np.pi / inv_freq
    scaled = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1.0 - smooth) / factor * inv_freq + smooth * inv_freq
    mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return jnp.where(mid, smoothed, scaled)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    theta: float,
    llama3: Optional[dict] = None,
) -> jnp.ndarray:
    """Rotary position embedding, HF 'split-half' convention.

    x: [B, S, H, D]; positions: [B, S] int32. Matches HF Qwen2/Llama rotate_half:
    rotated = (x * cos) + (rotate_half(x) * sin) with cos/sin built from
    inv_freq = theta^(-2i/D) repeated over both halves. `llama3` (kwargs for
    `llama3_scale_inv_freq`) selects Llama-3.1 frequency scaling.
    """
    d = x.shape[-1]
    half = d // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / d)
    )  # [half]
    if llama3 is not None:
        inv_freq = llama3_scale_inv_freq(inv_freq, **llama3)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B, S, half]
    cos = jnp.cos(freqs)[:, :, None, :]  # [B, S, 1, half]
    sin = jnp.sin(freqs)[:, :, None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float, offset: float = 0.0
) -> jnp.ndarray:
    """RMSNorm with fp32 statistics (HF-compatible). `offset=1.0` applies
    Gemma's zero-centered weights as (1 + w), added in fp32 like HF."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if offset:
        w = w + offset
    return (x * w).astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray], eps: float
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics. bias=None is the MPT no_bias variant
    (weight-only LayerNorm)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x * weight.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(dtype)
