"""Pallas TPU decode attention: single-query GQA attention over the KV cache.

The autoregressive decode step is pure HBM bandwidth: it must read the KV cache
exactly once. The XLA path (`ops/attention.mha_reference`) materializes
`repeat_kv` (Hq/Hkv x the cache traffic) plus a boolean mask and measured
superlinear cost growth with context length on v5e. This kernel instead:

- operates on the framework KV-cache layout [L, B, S, Hkv*D]: all kv heads fold
  into the minor dimension, so every (block_k, Hkv*D) tile is a fully contiguous,
  lane-aligned DMA (a [.., Hkv, S, 64] layout measured 86 GB/s vs 139 GB/s here);
- takes the FULL stacked cache plus a scalar-prefetched layer index that feeds the
  BlockSpec index map — the per-layer [B, S, Hkv*D] slice is never materialized;
- fuses all kv heads per program (grid = (batch, kv blocks)): one DMA serves every
  head group, with per-head [g, D] x [D, block] dots on the MXU and a shared
  online-softmax over the stacked [H, block] score rows;
- masks via kv segment ids only: a decode query attends every written cache slot
  (unwritten slots carry segment id 0) — the engine's cache_segment_ids contract.

Measured on v5e (0.5B geometry, batch 8, 4224 ctx): 24-layer decode attention
2.98 ms vs 9.8 ms for the per-(head,block) variant and ~6x worse for XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
SUBLANES = 8


def _fused_heads_kernel(
    lidx_ref,  # scalar prefetch: [1] int32 layer index (consumed by index maps)
    q_ref,  # [1, H, D]
    k_ref,  # [1, 1, bk, Hkv*D] block of the stacked cache
    v_ref,
    kseg_ref,  # [1, SUBLANES, bk]
    o_ref,  # [1, H, D]
    m_scr,  # [H, 128] f32
    l_scr,  # [H, 128] f32
    acc_scr,  # [H, D] f32
    *,
    scale: float,
    hkv: int,
    g: int,
    d: int,
):
    del lidx_ref
    ik, nk = pl.program_id(1), pl.num_programs(1)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [H, D]
    k = k_ref[0, 0]  # [bk, Hkv*D]
    v = v_ref[0, 0]
    ks = kseg_ref[0, :1, :]  # [1, bk]

    s = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[h * g:(h + 1) * g, :],
                k[:, h * d:(h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    ) * scale  # [H, bk]
    s = jnp.where(ks != 0, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc_scr[:] * alpha + jnp.concatenate(
        [
            jax.lax.dot_general(
                p[h * g:(h + 1) * g, :].astype(v.dtype),
                v[:, h * d:(h + 1) * d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    )

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe).astype(o_ref.dtype)


def _fused_heads_q8_kernel(
    lidx_ref,  # scalar prefetch: [1] int32 layer index (consumed by index maps)
    q_ref,  # [1, H, D]
    k_ref,  # [1, 1, bk, Hkv*D] int8 block of the stacked quantized cache
    v_ref,
    ks_ref,  # [1, 1, Hkv, bk] f32 per-(token, kv-head) K scales
    vs_ref,
    kseg_ref,  # [1, SUBLANES, bk]
    o_ref,  # [1, H, D]
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    hkv: int,
    g: int,
    d: int,
):
    """int8-KV variant of `_fused_heads_kernel`: the cache streams as int8
    (half the HBM bytes of bf16 — decode attention is pure bandwidth) and
    dequantization folds into the existing math instead of materializing a
    dequantized tile:

    - scores: q @ k_int8^T computed in bf16 (int8 values are exact in bf16),
      then multiplied by the per-kv-token scale — exact, since
      score_t = (q . k_t) * ks_t;
    - PV: p is pre-scaled by the V scales (out_d = sum_t p_t * vs_t * v_td),
      then hits the MXU against the raw int8 V tile.
    """
    del lidx_ref
    ik, nk = pl.program_id(1), pl.num_programs(1)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [H, D]
    k = k_ref[0, 0].astype(jnp.bfloat16)  # [bk, Hkv*D] — int8 exact in bf16
    v = v_ref[0, 0]  # [bk, Hkv*D] int8
    ksc = ks_ref[0, 0]  # [Hkv, bk] f32
    vsc = vs_ref[0, 0]
    ks = kseg_ref[0, :1, :]  # [1, bk]

    s = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[h * g:(h + 1) * g, :],
                k[:, h * d:(h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    )  # [H, bk]
    # fold in the per-kv-token K scales (rows h*g:(h+1)*g share kv head h)
    s = s * (jnp.repeat(ksc, g, axis=0) * scale)
    s = jnp.where(ks != 0, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    pv = p * jnp.repeat(vsc, g, axis=0)  # fold per-kv-token V scales
    acc_scr[:] = acc_scr[:] * alpha + jnp.concatenate(
        [
            jax.lax.dot_general(
                pv[h * g:(h + 1) * g, :].astype(jnp.bfloat16),
                v[:, h * d:(h + 1) * d].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    )

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe).astype(o_ref.dtype)


def _pick_block(s: int, pref: int) -> int:
    """Largest multiple-of-128 divisor of s that is <= pref (s itself if none)."""
    best = s
    for m in range(s // 128, 0, -1):
        bk = m * 128
        if s % bk == 0:
            if bk <= pref:
                return bk
            best = bk
    return best


def decode_attention_stacked(
    q: jnp.ndarray,  # [B, H, D]
    ck_all: jnp.ndarray,  # [L, B, S, Hkv*D] — FULL stacked cache
    cv_all: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,  # [B, S]
    layer_idx,  # scalar int32
    *,
    num_kv_heads: int,
    scale: Optional[float] = None,
    block_k: int = 1536,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused single-token GQA attention over one layer of the stacked cache."""
    b, h, d = q.shape
    s = ck_all.shape[2]
    hkv = num_kv_heads
    g = h // hkv
    if scale is None:
        scale = d ** -0.5
    bk = _pick_block(s, block_k)
    nk = s // bk

    kseg = jax.lax.broadcast_in_dim(
        kv_segment_ids.astype(jnp.int32), (b, SUBLANES, s), (0, 2)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nk),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda ib, ik, l: (ib, 0, 0)),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec((1, SUBLANES, bk), lambda ib, ik, l: (ib, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda ib, ik, l: (ib, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fused_heads_kernel, scale=float(scale), hkv=hkv, g=g, d=d
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * s * d),
            bytes_accessed=int(
                2 * ck_all.size // ck_all.shape[0] * ck_all.dtype.itemsize
            ),
            transcendentals=int(b * h * s),
        ),
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32).reshape(1), q, ck_all, cv_all, kseg)


def decode_attention_stacked_q8(
    q: jnp.ndarray,  # [B, H, D]
    ck_all: jnp.ndarray,  # [L, B, S, Hkv*D] int8 — FULL stacked quantized cache
    cv_all: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, B, Hkv, S] f32 per-(token, kv-head) scales
    v_scale: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,  # [B, S]
    layer_idx,  # scalar int32
    *,
    num_kv_heads: int,
    scale: Optional[float] = None,
    block_k: int = 1536,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-KV single-token GQA attention over one layer of the stacked cache.

    Same contract as `decode_attention_stacked` with the cache stored int8 +
    per-(token, kv-head) symmetric scales (the engine's int8 KV mode): halves
    decode-attention HBM traffic, which is what bounds tokens/sec, and halves
    cache residency so a 16 GB chip fits 2x the decode slots (the analog of
    the reference's bitsandbytes memory reliance, `train.py:1466`)."""
    b, h, d = q.shape
    s = ck_all.shape[2]
    hkv = num_kv_heads
    g = h // hkv
    if scale is None:
        scale = d ** -0.5
    bk = _pick_block(s, block_k)
    nk = s // bk

    kseg = jax.lax.broadcast_in_dim(
        kv_segment_ids.astype(jnp.int32), (b, SUBLANES, s), (0, 2)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nk),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda ib, ik, l: (ib, 0, 0)),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec((1, 1, hkv, bk), lambda ib, ik, l: (l[0], ib, 0, ik)),
            pl.BlockSpec((1, 1, hkv, bk), lambda ib, ik, l: (l[0], ib, 0, ik)),
            pl.BlockSpec((1, SUBLANES, bk), lambda ib, ik, l: (ib, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda ib, ik, l: (ib, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fused_heads_q8_kernel, scale=float(scale), hkv=hkv, g=g, d=d
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * s * d),
            bytes_accessed=int(
                2 * ck_all.size // ck_all.shape[0] * ck_all.dtype.itemsize
            ),
            transcendentals=int(b * h * s),
        ),
        interpret=interpret,
    )(
        jnp.asarray([layer_idx], jnp.int32).reshape(1),
        q, ck_all, cv_all, k_scale, v_scale, kseg,
    )


# ---------------------------------------------------------------------------
# Windowed variants: W-query verify windows (speculative decoding).
#
# The spec verify step (generation/spec.py) runs a (spec_k+1)-wide cached
# forward per slot. The s == 1 kernels above can't serve it, and the XLA
# fallback it previously landed on dequantized the ENTIRE int8 cache to bf16
# per layer per step (~5.8 GB HBM traffic/step at 7B/24 slots — measured
# 29 s unloaded p50 vs 3.6 s plain decode on v5e, 2026-08-19). These kernels
# stream the cache ONCE per verify step, exactly like single-token decode:
# W tokens verified for one cache read. Intra-window causality masks by
# CACHE INDEX (query j of row b sits at cache slot widx[b]+j and may attend
# slots <= widx[b]+j with nonzero segment id) — the same contract as the
# mha(q_offset=cache_index) fallback in models/qwen2._block_cached.
# ---------------------------------------------------------------------------


def _window_mask(wc, ik, bk, rows, w, g):
    """[rows, bk] bool: cache col visible to its query row (w-major in g)."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1) + ik * bk
    wrow = (rowi % (w * g)) // g  # window index of this score row
    return coli <= wc + wrow


def _fused_heads_window_kernel(
    lidx_ref,  # scalar prefetch: [1] int32 layer index
    widx_ref,  # scalar prefetch: [B] int32 per-row window start (cache index)
    q_ref,  # [1, Hkv*W*g, D] (kv-head-major, then window, then group)
    k_ref,  # [1, 1, bk, Hkv*D]
    v_ref,
    kseg_ref,  # [1, SUBLANES, bk]
    o_ref,  # [1, Hkv*W*g, D]
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    hkv: int,
    g: int,
    d: int,
    w: int,
):
    del lidx_ref
    ib, ik, nk = pl.program_id(0), pl.program_id(1), pl.num_programs(1)
    rows = hkv * w * g

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [rows, D]
    k = k_ref[0, 0]  # [bk, Hkv*D]
    v = v_ref[0, 0]
    ks = kseg_ref[0, :1, :]  # [1, bk]
    bk = k.shape[0]
    wg = w * g

    s = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[h * wg:(h + 1) * wg, :],
                k[:, h * d:(h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    ) * scale  # [rows, bk]
    mask = (ks != 0) & _window_mask(widx_ref[ib], ik, bk, rows, w, g)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc_scr[:] * alpha + jnp.concatenate(
        [
            jax.lax.dot_general(
                p[h * wg:(h + 1) * wg, :].astype(v.dtype),
                v[:, h * d:(h + 1) * d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    )

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe).astype(o_ref.dtype)


def _fused_heads_window_q8_kernel(
    lidx_ref,
    widx_ref,
    q_ref,  # [1, Hkv*W*g, D]
    k_ref,  # [1, 1, bk, Hkv*D] int8
    v_ref,
    ks_ref,  # [1, 1, Hkv, bk] f32
    vs_ref,
    kseg_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    hkv: int,
    g: int,
    d: int,
    w: int,
):
    del lidx_ref
    ib, ik, nk = pl.program_id(0), pl.program_id(1), pl.num_programs(1)
    rows = hkv * w * g
    wg = w * g

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [rows, D]
    k = k_ref[0, 0].astype(jnp.bfloat16)  # int8 exact in bf16
    v = v_ref[0, 0]  # int8
    ksc = ks_ref[0, 0]  # [Hkv, bk]
    vsc = vs_ref[0, 0]
    ks = kseg_ref[0, :1, :]
    bk = k.shape[0]

    s = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[h * wg:(h + 1) * wg, :],
                k[:, h * d:(h + 1) * d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    )  # [rows, bk]
    s = s * (jnp.repeat(ksc, wg, axis=0) * scale)
    mask = (ks != 0) & _window_mask(widx_ref[ib], ik, bk, rows, w, g)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    pv = p * jnp.repeat(vsc, wg, axis=0)
    acc_scr[:] = acc_scr[:] * alpha + jnp.concatenate(
        [
            jax.lax.dot_general(
                pv[h * wg:(h + 1) * wg, :].astype(jnp.bfloat16),
                v[:, h * d:(h + 1) * d].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(hkv)
        ],
        axis=0,
    )

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe).astype(o_ref.dtype)


def _window_q_layout(q: jnp.ndarray, hkv: int):
    """[B, W, H, D] -> [B, Hkv*W*g, D] (kv-head-major, window, group)."""
    b, w, h, d = q.shape
    g = h // hkv
    return (
        q.reshape(b, w, hkv, g, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, hkv * w * g, d)
    )


def _window_o_layout(o: jnp.ndarray, w: int, hkv: int, d: int):
    """Inverse of `_window_q_layout`: [B, Hkv*W*g, D] -> [B, W, H, D]."""
    b = o.shape[0]
    g = o.shape[1] // (hkv * w)
    return (
        o.reshape(b, hkv, w, g, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, w, hkv * g, d)
    )


def decode_attention_stacked_window(
    q: jnp.ndarray,  # [B, W, H, D] verify-window queries
    ck_all: jnp.ndarray,  # [L, B, S, Hkv*D]
    cv_all: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,  # [B, S]
    layer_idx,
    window_idx: jnp.ndarray,  # [B] int32 cache index of window token 0
    *,
    num_kv_heads: int,
    scale: Optional[float] = None,
    block_k: int = 1536,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused W-query GQA attention over one layer of the stacked cache."""
    b, w, h, d = q.shape
    s = ck_all.shape[2]
    hkv = num_kv_heads
    g = h // hkv
    if scale is None:
        scale = d ** -0.5
    bk = _pick_block(s, block_k)
    nk = s // bk
    rows = hkv * w * g

    kseg = jax.lax.broadcast_in_dim(
        kv_segment_ids.astype(jnp.int32), (b, SUBLANES, s), (0, 2)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nk),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda ib, ik, l, wi: (ib, 0, 0)),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l, wi: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l, wi: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec((1, SUBLANES, bk), lambda ib, ik, l, wi: (ib, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda ib, ik, l, wi: (ib, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_heads_window_kernel,
            scale=float(scale), hkv=hkv, g=g, d=d, w=w,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * w * s * d),
            bytes_accessed=int(
                2 * ck_all.size // ck_all.shape[0] * ck_all.dtype.itemsize
            ),
            transcendentals=int(b * h * w * s),
        ),
        interpret=interpret,
    )(
        jnp.asarray([layer_idx], jnp.int32).reshape(1),
        window_idx.astype(jnp.int32),
        _window_q_layout(q, hkv), ck_all, cv_all, kseg,
    )
    return _window_o_layout(out, w, hkv, d)


def decode_attention_stacked_window_q8(
    q: jnp.ndarray,  # [B, W, H, D]
    ck_all: jnp.ndarray,  # [L, B, S, Hkv*D] int8
    cv_all: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, B, Hkv, S] f32
    v_scale: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,  # [B, S]
    layer_idx,
    window_idx: jnp.ndarray,  # [B] int32
    *,
    num_kv_heads: int,
    scale: Optional[float] = None,
    block_k: int = 1536,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-KV W-query GQA attention over one layer of the stacked cache."""
    b, w, h, d = q.shape
    s = ck_all.shape[2]
    hkv = num_kv_heads
    g = h // hkv
    if scale is None:
        scale = d ** -0.5
    bk = _pick_block(s, block_k)
    nk = s // bk
    rows = hkv * w * g

    kseg = jax.lax.broadcast_in_dim(
        kv_segment_ids.astype(jnp.int32), (b, SUBLANES, s), (0, 2)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nk),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda ib, ik, l, wi: (ib, 0, 0)),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l, wi: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, bk, hkv * d), lambda ib, ik, l, wi: (l[0], ib, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, hkv, bk), lambda ib, ik, l, wi: (l[0], ib, 0, ik)
            ),
            pl.BlockSpec(
                (1, 1, hkv, bk), lambda ib, ik, l, wi: (l[0], ib, 0, ik)
            ),
            pl.BlockSpec((1, SUBLANES, bk), lambda ib, ik, l, wi: (ib, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, rows, d), lambda ib, ik, l, wi: (ib, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_heads_window_q8_kernel,
            scale=float(scale), hkv=hkv, g=g, d=d, w=w,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * w * s * d),
            bytes_accessed=int(
                2 * ck_all.size // ck_all.shape[0] * ck_all.dtype.itemsize
            ),
            transcendentals=int(b * h * w * s),
        ),
        interpret=interpret,
    )(
        jnp.asarray([layer_idx], jnp.int32).reshape(1),
        window_idx.astype(jnp.int32),
        _window_q_layout(q, hkv), ck_all, cv_all, k_scale, v_scale, kseg,
    )
    return _window_o_layout(out, w, hkv, d)
