"""Pallas int4-weight matmul: y = x @ (unpack(q4) * scale) with in-VMEM unpack.

4-bit weight-only quantization for the decode path (TPU-native replacement for
the reference's bitsandbytes 4-bit load, `model/builder.py:30-34`): weights are
packed two nibbles per int8 byte along the CONTRACTION axis, with group-wise
symmetric scales (group size 128 along D) — the standard W4 recipe, finer than
per-channel so the 4-bit step stays accurate.

Decode at 7B is an HBM-bandwidth problem (the whole weight set streams every
step); int4 halves the bytes of int8 again:
    int8: D*F bytes + F*4 scale  ->  int4: D*F/2 + (D/128)*F*4 ≈ 0.53 * int8.

Kernel layout mirrors `ops/int8_matmul.py` (stacked variant with a
scalar-prefetched layer index; grid over output blocks):
  - q4_all: [L, D/2, F] int8, CONCAT layout — byte i packs row i in the low
    nibble and row i + D/2 in the high nibble (sign-extended on unpack), so
    the kernel rebuilds [D, F] with two shifts + one contiguous concat and
    no sublane interleave (see `pack_int4`);
  - scale_all: [L, D/128, F] f32;
  - per block: unpack nibbles with arithmetic shifts, broadcast group scales
    over their 128 rows, dequantize in VMEM, one MXU dot.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q4_KEY = "__q4__"
SCALE_KEY = "__scale__"  # shared name with ops.quant int8 nodes
GROUP = 128


def is_q4node(x: Any) -> bool:
    return isinstance(x, dict) and Q4_KEY in x


def pack_int4(vals: jnp.ndarray) -> jnp.ndarray:
    """[... , D, F] int values in [-8, 7] -> [..., D/2, F] int8 packed.

    CONCAT layout: byte i packs row i (low nibble) and row i + D/2 (high
    nibble), so unpacking is two shifts + a contiguous concat along the
    contraction axis — no sublane interleave in the kernel (an interleaved
    even/odd layout measured ~1.5x slower in-kernel)."""
    half = vals.shape[-2] // 2
    lo = vals[..., :half, :].astype(jnp.int32) & 0xF
    hi = vals[..., half:, :].astype(jnp.int32) & 0xF
    return ((hi << 4) | lo).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4 (sign-extended): [..., D/2, F] int8 -> [..., D, F]."""
    p = packed.astype(jnp.int32)
    lo = (p << 28) >> 28  # arithmetic shift sign-extends the low nibble
    hi = (p << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_array_int4(
    x: jnp.ndarray, *, group: int = GROUP
) -> Dict[str, jnp.ndarray]:
    """Symmetric int4 with group-wise scales along the contraction axis.

    x: [..., D, F] (D % (2*group... ) — D must be divisible by `group` and by 2).
    Returns {"__q4__": [..., D/2, F] int8 packed, "__scale__": [..., D/group, F] f32}.
    """
    d = x.shape[-2]
    assert d % group == 0 and d % 2 == 0, (d, group)
    xf = jnp.asarray(x, jnp.float32)
    grouped = xf.reshape(*x.shape[:-2], d // group, group, x.shape[-1])
    amax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(grouped / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(*x.shape[:-2], d, x.shape[-1])
    return {
        Q4_KEY: pack_int4(q),
        SCALE_KEY: scale[..., 0, :].astype(jnp.float32),  # [..., D/group, F]
    }


def dequantize_array_int4(node: Dict[str, jnp.ndarray], dtype=jnp.bfloat16):
    q = unpack_int4(node[Q4_KEY]).astype(jnp.float32)  # [..., D, F]
    s = node[SCALE_KEY]  # [..., D/group, F]
    d = q.shape[-2]
    group = d // s.shape[-2]
    s_full = jnp.repeat(s, group, axis=-2)
    return (q * s_full).astype(dtype)


def _kernel_stacked(lidx_ref, x_ref, q_ref, s_ref, o_ref, *, group: int):
    del lidx_ref
    x = x_ref[...]  # [B, D]
    p = q_ref[0].astype(jnp.int32)  # [D/2, bf] packed bytes
    lo = (p << 28) >> 28  # rows [0, D/2)
    hi = (p << 24) >> 28  # rows [D/2, D)
    vals = jnp.concatenate([lo, hi], axis=0)  # [D, bf], contiguous concat
    s = s_ref[0]  # [D/group, bf] f32
    s_full = jnp.repeat(s, group, axis=0)  # [D, bf]
    w = (vals.astype(jnp.float32) * s_full).astype(x.dtype)
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def int4_matmul_stacked(
    x: jnp.ndarray,  # [..., D]
    q4_all: jnp.ndarray,  # [L, D/2, F] int8 packed
    scale_all: jnp.ndarray,  # [L, D/group, F] f32
    layer_idx,
    *,
    block_f: int = 0,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant4(q4_all[layer_idx]) with zero slice materialization."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    half = q4_all.shape[-2]
    assert half * 2 == d, (half, d)
    f = q4_all.shape[-1]
    group = d // scale_all.shape[-2]
    x2 = x.reshape(-1, d)
    b = x2.shape[0]
    pad_rows = 0
    if b < 8:
        pad_rows = 8 - b
        x2 = jnp.concatenate([x2, jnp.zeros((pad_rows, d), x2.dtype)], axis=0)
        b = 8
    if out_dtype is None:
        out_dtype = x.dtype
    # Block policy shared with the int8 kernel (RADVLM_INT8_BLOCK_F, 4 MB
    # weight-tile cap). The unpack's in-VMEM intermediates are wider per
    # element than int8's, but Mosaic streams them (512-wide blocks on the
    # 18944-deep 7B down-projection measured correct and faster than the
    # narrower blocks a strict materialized-intermediate budget would pick).
    from radvlm_tpu.ops.int8_matmul import _default_block_f, _pick_bf

    bf = _pick_bf(d, f, block_f or _default_block_f())
    nf = f // bf

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, l: (0, 0)),
            pl.BlockSpec((1, half, bf), lambda i, l: (l[0], 0, i)),
            pl.BlockSpec((1, d // group, bf), lambda i, l: (l[0], 0, i)),
        ],
        out_specs=pl.BlockSpec((b, bf), lambda i, l: (0, i)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * d * f),
            bytes_accessed=int(half * f + x2.size * 2 + b * f * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        x2,
        q4_all,
        scale_all.astype(jnp.float32),
    )
    if pad_rows:
        out = out[:-pad_rows]
    return out.reshape(*lead, f)


def q4node_matmul_stacked(
    x: jnp.ndarray, node, layer_idx, *, interpret: bool = False
) -> jnp.ndarray:
    """Stacked-int4 dispatch (decode scan body). Falls back to
    dynamic-slice + dequant when the kernel preconditions don't hold."""
    from radvlm_tpu.ops.int8_matmul import _kernel_enabled, _rows

    q, s = node[Q4_KEY], node[SCALE_KEY]
    if (
        _kernel_enabled()
        and q.ndim == 3
        and _rows(x) <= 64
        and (q.shape[1] * 2) % 128 == 0
        and q.shape[2] % 128 == 0
    ):
        return int4_matmul_stacked(x, q, s, layer_idx, interpret=interpret)
    qi = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
    si = jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False)
    return x @ dequantize_array_int4({Q4_KEY: qi, SCALE_KEY: si}, x.dtype)


def q4node_matmul(x: jnp.ndarray, node, *, interpret: bool = False) -> jnp.ndarray:
    """Flat [D/2, F] int4 node matmul: dequant-once (prefill uses W8A8 or bf16;
    int4's win is the decode weight stream, which uses the stacked kernel)."""
    return x @ dequantize_array_int4(node, x.dtype)
