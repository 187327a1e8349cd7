"""Pallas int8-weight matmul: y = x @ (q * scale) with dequant in VMEM.

The quantized path in `ops/quant.py` dequantizes each layer's weights to bf16 in
HBM before the matmul — that costs a full extra write+read of the weight bytes
per step, erasing most of int8's bandwidth win on the decode path. This kernel
reads the int8 weights directly, dequantizes per-block in VMEM registers, and
multiplies — HBM sees exactly the int8 bytes (plus the tiny activations).

Weight-only quantization (activations stay bf16): per-output-channel scales
commute with the contraction, so
    y[b, f] = scale[f] * sum_d x[b, d] * q[d, f]
and the kernel computes x @ q in mixed precision then scales the block.

Used for the decode step's projections where x has few rows (B tokens); prefill
keeps the dequant-once path (weights amortize over thousands of rows there).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref, *, block_f: int):
    x = x_ref[...]  # [B, D] bf16
    w = q_ref[...].astype(jnp.bfloat16)  # [D, bf] int8 -> bf16 in VMEM
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, bf] f32
    o_ref[...] = (y * s_ref[0, :]).astype(o_ref.dtype)


def int8_matmul(
    x: jnp.ndarray,  # [B, D] (or [..., D]; flattened)
    q: jnp.ndarray,  # [D, F] int8
    scale: jnp.ndarray,  # [1, F] f32 (per-output-channel)
    *,
    block_f: int = 512,
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
    # Cap the weight tile at ~4 MB int8 so double-buffered blocks fit VMEM even
    # for the 18944-deep down-projection.
    max_bf = max(128, (4 * 1024 * 1024 // max(d, 1)) // 128 * 128)
    bf = min(block_f, max_bf, f)
    while f % bf:
        bf //= 2
    nf = f // bf

    out = pl.pallas_call(
        functools.partial(_kernel, block_f=bf),
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


def qnode_matmul(x: jnp.ndarray, node, *, interpret: bool = False) -> jnp.ndarray:
    """x @ dequant(node) for a {"__q__", "__scale__"} node (2D kernels only).

    Default path dequantizes once and uses the dense MXU matmul: integrated
    decode measured FASTER that way (the per-call Pallas launch overhead x
    7 projections x num_layers outweighs the halved weight bytes — 144 vs 115
    decode tok/s at 7B). Set RADVLM_INT8_MM=1 to dispatch small-row matmuls to
    the in-VMEM-dequant kernel; making it win needs fusing several projections
    per launch (future work).
    """
    import os

    from radvlm_tpu.ops.quant import Q_KEY, SCALE_KEY, dequantize_array

    q, s = node[Q_KEY], node[SCALE_KEY]
    rows = 1
    for dim in x.shape[:-1]:
        rows *= dim
    if (
        os.environ.get("RADVLM_INT8_MM") == "1"
        and jax.default_backend() == "tpu"
        and q.ndim == 2
        and rows <= 64
        and q.shape[0] % 128 == 0
    ):
        return int8_matmul(x, q, s.reshape(1, -1), interpret=interpret)
    return x @ dequantize_array(node, x.dtype)
