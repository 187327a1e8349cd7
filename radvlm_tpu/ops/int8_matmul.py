"""Pallas int8-weight matmuls: y = x @ (q * scale) with dequant in VMEM.

The quantized fallback path in `ops/quant.py` dequantizes a layer's weights to
bf16 in HBM before the matmul — that costs a full extra write+read of 2x the
weight bytes per step (int8 read + bf16 write + bf16 read = 5x the int8
bytes), erasing int8's bandwidth win on the decode path. These kernels read
the int8 weights directly, dequantize per-block in VMEM registers, and
multiply — HBM sees exactly the int8 bytes (plus the tiny activations).

Weight-only quantization (activations stay bf16): per-output-channel scales
commute with the contraction, so
    y[b, f] = scale[f] * sum_d x[b, d] * q[d, f]
and the kernel computes x @ q in mixed precision then scales the block.

Two entry points:

- `int8_matmul(x, q, scale)` — flat [D, F] weight (e.g. the 7B lm_head).
- `int8_matmul_stacked(x, q_all, scale_all, layer_idx)` — [L, D, F] stacked
  layer weights with a scalar-prefetched layer index feeding the BlockSpec
  index maps (same pattern as `ops/decode_attention.decode_attention_stacked`
  uses for the KV cache): the per-layer slice is NEVER materialized, the
  kernel DMAs int8 blocks of the stacked HBM buffer directly. This is what
  lets the decode layer scan close over the full stacked weights and stream
  7B int8 at HBM speed instead of paying a dynamic-slice copy per layer.

Used for the decode step's projections where x has few rows (B tokens);
prefill keeps the dequant-once path (weights amortize over thousands of rows
there, and the MXU wants bf16 inputs anyway).

Replaces the role of bitsandbytes CUDA kernels in the reference
(`finetuning/llava/train/train.py:1466-1484`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Cap a weight tile at ~4 MB int8 so double-buffered blocks fit VMEM (~16 MB)
# even for the 18944-deep 7B down-projection.
_TILE_BYTES = 4 * 1024 * 1024


def _default_block_f() -> int:
    # RADVLM_INT8_BLOCK_F tunes the output-block width (bigger blocks = fewer
    # grid steps, more VMEM per buffer; 512 measured best at 7B decode).
    return int(os.environ.get("RADVLM_INT8_BLOCK_F", "512"))


def _pick_bf(d: int, f: int, block_f: int) -> int:
    max_bf = max(128, (_TILE_BYTES // max(d, 1)) // 128 * 128)
    bf = min(block_f, max_bf, f)
    while f % bf:
        bf //= 2
    return max(bf, 1)


def _kernel(x_ref, q_ref, s_ref, o_ref):
    x = x_ref[...]  # [B, D]
    w = q_ref[...].astype(x.dtype)  # [D, bf] int8 -> activation dtype in VMEM
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, bf] f32
    o_ref[...] = (y * s_ref[0, :]).astype(o_ref.dtype)


def int8_matmul(
    x: jnp.ndarray,  # [B, D] (or [..., D]; flattened)
    q: jnp.ndarray,  # [D, F] int8
    scale: jnp.ndarray,  # [1, F] f32 (per-output-channel)
    *,
    block_f: int = 0,  # 0 -> RADVLM_INT8_BLOCK_F (default 512)
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    lead = x.shape[:-1]
    d = x.shape[-1]
    f = q.shape[-1]
    x2 = x.reshape(-1, d)
    b = x2.shape[0]
    pad_rows = 0
    if b < 8:  # sublane-align the activation block
        pad_rows = 8 - b
        x2 = jnp.concatenate([x2, jnp.zeros((pad_rows, d), x2.dtype)], axis=0)
        b = 8
    if out_dtype is None:
        out_dtype = x.dtype
    bf = _pick_bf(d, f, block_f or _default_block_f())
    nf = f // bf

    out = pl.pallas_call(
        _kernel,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((d, bf), lambda i: (0, i)),
            pl.BlockSpec((1, bf), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, bf), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, f), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * d * f),
            bytes_accessed=int(q.size + x2.size * 2 + b * f * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, q, scale.astype(jnp.float32))
    if pad_rows:
        out = out[:-pad_rows]
    return out.reshape(*lead, f)


def _kernel_stacked(lidx_ref, x_ref, q_ref, s_ref, o_ref):
    del lidx_ref  # consumed by the BlockSpec index maps
    x = x_ref[...]  # [B, D]
    w = q_ref[0].astype(x.dtype)  # [D, bf] block of layer lidx
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (y * s_ref[0, 0, :]).astype(o_ref.dtype)


def int8_matmul_stacked(
    x: jnp.ndarray,  # [..., D]
    q_all: jnp.ndarray,  # [L, D, F] int8 — FULL stacked weights
    scale_all: jnp.ndarray,  # [L, 1, F] f32
    layer_idx,  # scalar int32 (traced ok)
    *,
    block_f: int = 0,  # 0 -> RADVLM_INT8_BLOCK_F (default 512)
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant(q_all[layer_idx]) without materializing the layer slice.

    The layer index is scalar-prefetched so the index maps select layer
    `layer_idx`'s blocks of the stacked [L, D, F] buffer — inside a
    `lax.scan` over layer indices this reads exactly one layer's int8 bytes
    from HBM per call, with zero slice copies.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    f = q_all.shape[-1]
    x2 = x.reshape(-1, d)
    b = x2.shape[0]
    pad_rows = 0
    if b < 8:
        pad_rows = 8 - b
        x2 = jnp.concatenate([x2, jnp.zeros((pad_rows, d), x2.dtype)], axis=0)
        b = 8
    if out_dtype is None:
        out_dtype = x.dtype
    bf = _pick_bf(d, f, block_f or _default_block_f())
    nf = f // bf

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, l: (0, 0)),
            pl.BlockSpec((1, d, bf), lambda i, l: (l[0], 0, i)),
            pl.BlockSpec((1, 1, bf), lambda i, l: (l[0], 0, i)),
        ],
        out_specs=pl.BlockSpec((b, bf), lambda i, l: (0, i)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_stacked),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * d * f),
            bytes_accessed=int(d * f + x2.size * 2 + b * f * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        x2,
        q_all,
        scale_all.astype(jnp.float32),
    )
    if pad_rows:
        out = out[:-pad_rows]
    return out.reshape(*lead, f)


def _rows(x: jnp.ndarray) -> int:
    rows = 1
    for dim in x.shape[:-1]:
        rows *= dim
    return rows


def _kernel_enabled() -> bool:
    # Default ON for TPU decode-shaped matmuls; RADVLM_INT8_MM=0 opts out
    # (round-1 measured the per-projection kernel losing integrated at 196
    # launches/step; round 2's stacked + fused-projection path wins).
    return (
        os.environ.get("RADVLM_INT8_MM", "1") != "0"
        and jax.default_backend() == "tpu"
    )


def qnode_matmul(x: jnp.ndarray, node, *, interpret: bool = False) -> jnp.ndarray:
    """x @ dequant(node) for a {"__q__", "__scale__"} node (2D kernels only).

    Small-row (decode) matmuls on TPU dispatch to the in-VMEM-dequant kernel;
    everything else dequantizes once and uses the dense MXU matmul (prefill /
    training, where weight bytes amortize over thousands of rows)."""
    from radvlm_tpu.ops.quant import Q_KEY, SCALE_KEY, dequantize_array

    q, s = node[Q_KEY], node[SCALE_KEY]
    if (
        _kernel_enabled()
        and q.ndim == 2
        and _rows(x) <= 64
        and q.shape[0] % 128 == 0
        and q.shape[1] % 128 == 0
    ):
        return int8_matmul(x, q, s.reshape(1, -1), interpret=interpret)
    return x @ dequantize_array(node, x.dtype)


def qnode_matmul_stacked(
    x: jnp.ndarray, node, layer_idx, *, interpret: bool = False
) -> jnp.ndarray:
    """x @ dequant(node[layer_idx]) for a stacked [L, D, F] quantized node."""
    from radvlm_tpu.ops.quant import Q_KEY, SCALE_KEY

    q, s = node[Q_KEY], node[SCALE_KEY]
    if (
        _kernel_enabled()
        and q.ndim == 3
        and _rows(x) <= 64
        and q.shape[1] % 128 == 0
        and q.shape[2] % 128 == 0
    ):
        return int8_matmul_stacked(
            x, q, s.reshape(q.shape[0], 1, q.shape[2]), layer_idx,
            interpret=interpret,
        )
    qi = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
    si = jax.lax.dynamic_index_in_dim(s, layer_idx, 0, keepdims=False)
    return x @ (qi.astype(jnp.float32) * si).astype(x.dtype)
