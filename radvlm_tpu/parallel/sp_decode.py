"""Sequence-parallel DECODE: KV cache sharded over the `seq` mesh axis.

Completes the long-context serving story (SURVEY §5 long-context; the ring
attention the reference keeps dormant, `modeling_llama.py:385-563`, covers
training; `generation.engine.make_sp_prefill_fn` covers prefill): at 32k+
multimodal contexts the KV cache dominates HBM (28 layers x 32k x 512 x 2 x
2B ≈ 1.9 GB *per sequence* at 7B), so decode batches stop fitting one chip.
Here the cache lives sequence-sharded — shard i owns cache rows
[i*S/n, (i+1)*S/n) — and each decode step:

1. computes the new token's q/k/v replicated (weights are replicated or
   fsdp-sharded as usual);
2. writes k/v on the OWNING shard only (global write index -> local offset,
   out-of-range lanes keep their row);
3. computes local partial attention with a log-sum-exp over the local cache
   block, then merges across shards with `pmax`/`psum` — the distributed
   flash-decoding merge: softmax(QK^T)V over a sharded K/V equals the
   lse-weighted average of per-shard partial outputs.

Enabled via `enable_sp_decode(mesh)` + running the step under `shard_map`
with the cache sharded on axis 2 (`make_sp_decode_step`); `qwen2._block_cached`
routes its cached attention through `cached_attention_merge` when the context
is active.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

_SP_DECODE_CONTEXT: Optional[Tuple[Any, str]] = None


def enable_sp_decode(mesh, *, axis_name: str = "seq") -> None:
    """Install (or clear, with mesh=None) the SP-decode context."""
    global _SP_DECODE_CONTEXT
    _SP_DECODE_CONTEXT = None if mesh is None else (mesh, axis_name)


def context() -> Optional[Tuple[Any, str]]:
    return _SP_DECODE_CONTEXT


def local_write(cache_all, layer_idx, rows, local_idx, in_range, new_row):
    """Scatter `new_row` [B, D'] at (layer_idx, rows, local_idx) only where
    `in_range` [B] (the shard owns that cache position); other lanes keep
    their (clamped-position) row."""
    smax_local = cache_all.shape[2]
    safe = jnp.clip(local_idx, 0, smax_local - 1)
    old = cache_all[layer_idx, rows, safe]
    upd = jnp.where(in_range[:, None], new_row, old)
    return cache_all.at[layer_idx, rows, safe].set(upd, unique_indices=True)


def local_write_scale(scale_all, layer_idx, rows, local_idx, in_range, new_scale):
    """int8-KV companion of `local_write` for the per-(token, kv-head) scale
    planes [L, B, Hkv, Smax]: scatter `new_scale` [B, Hkv] at
    (layer_idx, rows, :, local_idx) only where `in_range`."""
    smax_local = scale_all.shape[3]
    safe = jnp.clip(local_idx, 0, smax_local - 1)
    old = scale_all[layer_idx, rows, :, safe]  # [B, Hkv]
    upd = jnp.where(in_range[:, None], new_scale, old)
    return scale_all.at[layer_idx, rows, :, safe].set(upd, unique_indices=True)


def cached_attention_merge(
    q: jnp.ndarray,  # [B, 1, H, hd] new-token queries (replicated)
    ck_i: jnp.ndarray,  # [B, S_local, Hkv*hd] LOCAL cache block, layer i
    cv_i: jnp.ndarray,
    cache_seg_local: jnp.ndarray,  # [B, S_local] segment ids of local rows
    *,
    num_kv_heads: int,
    axis_name: str,
) -> jnp.ndarray:
    """Distributed flash-decoding: per-shard partial attention + lse merge.

    Returns [B, 1, H, hd] attention outputs identical (up to fp assoc.) to
    attending over the full concatenated cache.
    """
    b, s_local = cache_seg_local.shape
    h, hd = q.shape[2], q.shape[3]
    hkv = num_kv_heads
    scale = hd ** -0.5

    k = ck_i.reshape(b, s_local, hkv, hd)
    v = cv_i.reshape(b, s_local, hkv, hd)
    qh = q[:, 0].reshape(b, hkv, h // hkv, hd)  # GQA grouping
    # scores [B, hkv, qpk, S_local]
    scores = jnp.einsum(
        "bkgd,bskd->bkgs", qh.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    valid = (cache_seg_local != 0)[:, None, None, :]
    scores = jnp.where(valid, scores, -jnp.inf)
    m_local = jnp.max(scores, axis=-1)  # [B, hkv, qpk]
    # Empty-shard sentinel must sit BELOW any real score: with 0.0 a shard of
    # pure padding inflates pmax and the rescale weights exp(m - m_global)
    # underflow to zero when valid scores are very negative (code-review
    # repro: all-left-pad shard zeroed the merged output).
    neg_big = jnp.float32(-jnp.finfo(jnp.float32).max)
    m_safe = jnp.where(jnp.isfinite(m_local), m_local, neg_big)
    p = jnp.where(
        valid,
        jnp.exp(scores - jnp.maximum(m_safe, neg_big / 2)[..., None]),
        0.0,
    )
    l_local = jnp.sum(p, axis=-1)  # [B, hkv, qpk]
    o_local = jnp.einsum("bkgs,bskd->bkgd", p, v.astype(jnp.float32))

    # Cross-shard merge: global max, then psum of rescaled numerators/denoms.
    m_global = jax.lax.pmax(m_safe, axis_name)
    w = jnp.where(
        jnp.isfinite(m_local), jnp.exp(m_safe - m_global), 0.0
    )  # per-shard weight; shards with no valid rows contribute zero
    num = jax.lax.psum(o_local * w[..., None], axis_name)
    den = jax.lax.psum(l_local * w, axis_name)
    out = num / jnp.maximum(den, 1e-30)[..., None]
    return out.reshape(b, 1, h, hd).astype(q.dtype)


def make_sp_decode_step(cfg, mesh, *, axis_name: str = "seq",
                        kv_quant: bool = False):
    """Build a jitted sequence-parallel decode step.

    step(params, cache, cache_seg, tok, positions, cache_index)
        -> (cache', cache_seg', logits [B, V])

    cache (k, v): [L, B, Smax, Hkv*hd] sharded over axis 2 on `axis_name`;
    cache_seg: [B, Smax] sharded over axis 1; everything else replicated.
    `cache_index` is the scalar GLOBAL write position (lock-step batch).

    kv_quant: the cache is the 4-tuple int8 layout (k, v int8 + per-(token,
    kv-head) scale planes [L, B, Hkv, Smax], scales sharded over axis 3) —
    halved sharded-cache residency, the point of SP serving capacity.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    from radvlm_tpu.models import qwen2

    n = mesh.shape[axis_name]
    n_cache = 4 if kv_quant else 2

    def local_step(params, cache_seg, tok, positions, cache_index, *cache):
        enable_sp_decode(mesh, axis_name=axis_name)
        try:
            s_local = cache[0].shape[2]
            shard = jax.lax.axis_index(axis_name)
            local_idx = cache_index - shard * s_local
            in_range = (local_idx >= 0) & (local_idx < s_local)
            b = tok.shape[0]
            # mark the new position's segment on the owning shard
            safe = jnp.clip(local_idx, 0, s_local - 1)
            rows = jnp.arange(b)
            seg_new = jnp.where(
                in_range, jnp.ones((b,), cache_seg.dtype), cache_seg[rows, safe]
            )
            cache_seg = cache_seg.at[rows, safe].set(seg_new)
            embeds = qwen2.embed_tokens(params, tok[:, None], cfg)
            logits, cache = qwen2.forward(
                params, cfg,
                input_embeds=embeds,
                positions=positions[:, None],
                segment_ids=jnp.ones((b, 1), jnp.int32),
                kv_cache=cache,
                cache_index=cache_index,
                cache_segment_ids=cache_seg,
                attn_impl="xla",
            )
            return (*cache, cache_seg, logits[:, 0])
        finally:
            enable_sp_decode(None)

    cache_spec = P(None, None, axis_name, None)
    scale_spec = P(None, None, None, axis_name)
    cache_specs = (
        (cache_spec, cache_spec, scale_spec, scale_spec)
        if kv_quant else (cache_spec, cache_spec)
    )
    seg_spec = P(None, axis_name)
    rep = P()
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, seg_spec, rep, rep, rep) + cache_specs,
        out_specs=cache_specs + (seg_spec, rep),
        check_vma=False,
    )

    # Donate cache + segments: without aliasing, every token would COPY the
    # multi-GB sharded cache (the cost SP decode exists to avoid); callers
    # rebind (cache, cache_seg) each step (make_sp_generate_fn does).
    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(params, cache, cache_seg, tok, positions, cache_index):
        assert len(cache) == n_cache, (
            f"cache tuple has {len(cache)} arrays; this step was built with "
            f"kv_quant={kv_quant} (expects {n_cache})"
        )
        *cache, cache_seg, logits = mapped(
            params, cache_seg, tok, positions,
            jnp.asarray(cache_index, jnp.int32), *cache,
        )
        return tuple(cache), cache_seg, logits

    return step
