"""int8-compressed gradient all-reduce — the ZeRO++ qgZ analog for DCN.

The reference's ZeRO++ config turns on quantized gradient reduction and
hierarchical partitioning (`finetuning/scripts/zero3pp.json`:
`zero_quantized_gradients`, `zero_hpz_partition_size: 16`,
`zero_quantized_weights`). On TPU pods the analogous boundary is DCN between
slices: ICI-internal reductions are fast enough to stay exact (GSPMD bf16),
but a multi-slice data-parallel sync crosses DCN where wire bytes dominate.

`quantized_psum` runs inside `shard_map` over the cross-slice axis with the
qgZ wire pattern:

1. blockwise int8 quantization of the local gradient (per-block f32 scales);
2. `all_to_all` so each replica receives only ITS chunk from every peer —
   int8 on the wire (~4x fewer bytes than a bf16 ring all-reduce's 2 passes);
3. local dequantize + sum (exact f32 accumulation of the quantized values);
4. re-quantize the reduced chunk and `all_gather` it back (int8 again).

Two quantization stages bound the relative error at ~1/127 per stage
(tested against exact `lax.psum`). The hpZ half of ZeRO++ (secondary
intra-node partition) maps to mesh layout, not code: shard params over the
ICI-internal `fsdp` axis and replicate across the slice axis
(`parallel/sharding.py` rules compose with any mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV127 = jnp.float32(1.0 / 127.0)


def _quantize_blocks(x: jnp.ndarray, block: int):
    """x [..., C] with C % block == 0 -> (int8 [..., C], f32 scales
    [..., C/block, 1])."""
    shape = x.shape
    xb = x.reshape(*shape[:-1], shape[-1] // block, block).astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xb), axis=-1, keepdims=True), 1e-12) * _INV127
    q = jnp.clip(jnp.round(xb / s), -127, 127).astype(jnp.int8)
    return q.reshape(shape), s


def _dequantize_blocks(q: jnp.ndarray, s: jnp.ndarray, block: int):
    shape = q.shape
    qb = q.reshape(*shape[:-1], shape[-1] // block, block).astype(jnp.float32)
    return (qb * s).reshape(shape)


def quantized_psum(x: jnp.ndarray, axis_name: str, *, block: int = 512):
    """All-reduce `x` across `axis_name` with an int8 wire format.

    Call inside shard_map/pmap over `axis_name`. Returns the (approximate)
    sum with x's dtype; relative error is bounded by the two blockwise int8
    stages (~1.6e-2 worst case). Use for DCN-crossing syncs only — ICI
    reductions should stay exact."""
    R = jax.lax.axis_size(axis_name)
    if R == 1:
        return x
    orig_dtype, orig_shape = x.dtype, x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = -n % (R * block)
    if pad:
        flat = jnp.pad(flat, (0, pad))
    chunks = flat.reshape(R, -1)  # row j = the chunk replica j will own

    q, s = _quantize_blocks(chunks, block)
    # each replica receives its own chunk from every peer (int8 wire)
    q_mine = jax.lax.all_to_all(q, axis_name, split_axis=0, concat_axis=0)
    s_mine = jax.lax.all_to_all(s, axis_name, split_axis=0, concat_axis=0)
    reduced = _dequantize_blocks(q_mine, s_mine, block).sum(axis=0)  # [c] f32

    qr, sr = _quantize_blocks(reduced[None], block)
    q_all = jax.lax.all_gather(qr[0], axis_name, axis=0)  # [R, c] int8 wire
    s_all = jax.lax.all_gather(sr[0], axis_name, axis=0)
    out = _dequantize_blocks(q_all, s_all, block).reshape(-1)
    if pad:
        out = out[:n]
    return out.reshape(orig_shape).astype(orig_dtype)


def quantized_pmean(x: jnp.ndarray, axis_name: str, *, block: int = 512):
    R = jax.lax.axis_size(axis_name)
    return quantized_psum(x, axis_name, block=block) / R


def quantized_grad_sync(grads, axis_name: str, *, block: int = 512):
    """Tree-mapped `quantized_pmean` — cross-slice data-parallel gradient
    averaging with int8 wire bytes (the ZeRO++ qgZ role)."""
    return jax.tree_util.tree_map(
        lambda g: quantized_pmean(g, axis_name, block=block), grads
    )
