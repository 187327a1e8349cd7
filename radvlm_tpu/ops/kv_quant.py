"""int8 KV-cache quantization helpers (per-token, per-kv-head symmetric scales).

The decode loop is HBM-bandwidth-bound on the KV cache stream, and cache
residency is what caps the number of continuous-batching slots on a 16 GB v5e
(the reference leans on bitsandbytes for the same memory economics,
`finetuning/llava/train/train.py:1466`). Quantizing K/V to int8 halves both:
same bytes as half the context, or 2x the slots at the same budget.

Scale granularity is per (token, kv-head): each written cache row [Hkv*D]
carries Hkv f32 scales. Scales are stored [**, Hkv, S] — S minor — so the
Pallas decode kernel's scale tiles are lane-aligned [Hkv, block_k] loads
(a [**, S, Hkv] layout would pad Hkv≈4 lanes to 128, a 32x VMEM waste).
Per-head granularity also keeps scales local under tensor parallelism: each
shard owns its heads' scales, no cross-shard max.

Dequantization never materializes a bf16 cache on the hot path — it folds
into the decode kernel (`ops/decode_attention.decode_attention_stacked_q8`):
scores multiply by the K scale per kv column, p multiplies by the V scale
before the PV matmul. These helpers exist for writes (quantize) and for the
XLA fallback path (tests / non-aligned shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def quantize_kv(x: jnp.ndarray, num_kv_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., S, Hkv*D] bf16 -> (int8 same shape, scales [..., Hkv, S] f32)."""
    *lead, s, hd = x.shape
    d = hd // num_kv_heads
    xf = x.astype(jnp.float32).reshape(*lead, s, num_kv_heads, d)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [..., s, hkv]
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(*lead, s, hd), jnp.moveaxis(scale, -1, -2)


def quantize_kv_row(x: jnp.ndarray, num_kv_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-token write: [B, Hkv*D] -> (int8 [B, Hkv*D], scales [B, Hkv])."""
    b, hd = x.shape
    d = hd // num_kv_heads
    xf = x.astype(jnp.float32).reshape(b, num_kv_heads, d)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [b, hkv]
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(b, hd), scale


def dequantize_kv(
    q: jnp.ndarray, scale: jnp.ndarray, num_kv_heads: int, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """[..., S, Hkv*D] int8 + [..., Hkv, S] scales -> dense [..., S, Hkv*D]."""
    *lead, s, hd = q.shape
    d = hd // num_kv_heads
    sc = jnp.moveaxis(scale, -1, -2)[..., None]  # [..., s, hkv, 1]
    out = q.astype(jnp.float32).reshape(*lead, s, num_kv_heads, d) * sc
    return out.reshape(*lead, s, hd).astype(dtype)
