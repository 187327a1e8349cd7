"""Pallas W8A8 prefill matmul: y = (xq @ q) * xs * ws with int8 MXU dots.

Explicit-tiling alternative to the XLA s8xs8 emitter in
`ops/quant.w8a8_matmul`. Device-side scan-loop microbenchmarks (full-output
consumption — partial consumption lets XLA DCE columns of the dot and
fabricates impossible rates) on the 7B prefill shapes measured:

    gateup [3456,3584]x[3584,37888]: bf16 149 TF/s, XLA s8 235, Pallas 229
    down   [3456,18944]x[18944,3584]: bf16 121, XLA s8 160-180, Pallas 170

i.e. the doubled int8 MXU rate (394 peak) IS engaged by both the XLA emitter
and this kernel, at parity within shared-tenancy noise. `w8a8_matmul_fused`
below additionally folds the per-row activation quantization into the kernel
— but its resident-row-tile layout re-streams the full weight from HBM
m/bm times (bm capped by VMEM at ~64 rows for D=18944), which measured a
37% e2e serving REGRESSION on v5e (1.24 vs 1.98 img/s/chip, 2026-08-19 A/B
at the 7B bench). The default is therefore `xla` (the s8xs8 dot emitter);
RADVLM_W8A8_IMPL=pallas selects the pre-quantized explicit-tiling kernel,
=fused the fused kernel (opt-in; only sane for narrow-D shapes where the
full row-tile fits VMEM at bm>=256).

Structure: grid (M/bm, F/bf, D/bk), k innermost ("arbitrary") accumulating
int32 in VMEM scratch; per-row activation scales (`quantize_rows`) and
per-output-channel weight scales applied in the f32 epilogue on the last k
step. Role: the prefill-side analog of the reference's bitsandbytes int8
inference (`finetuning/llava/model/builder.py:30-34`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Scale = amax * (1/127), NOT amax / 127: a multiply by a constant is one
# correctly-rounded IEEE op in every compilation context, whereas XLA CPU's
# fast-math may lower a division differently inside a fused program vs a
# standalone one — that one-ulp xs difference flips round() at .5 boundaries
# and breaks bit-parity between the fused kernel and the quantize-then-dot
# reference path.
_INV127 = np.float32(1.0 / 127.0)


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8: returns (xq [..., D] int8, xs [..., 1] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) * _INV127
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _pick_bk(d: int, cap: int = 4736) -> int:
    """Largest 128-multiple divisor of d at most `cap` (VMEM budget)."""
    best = 0
    for mult in range(1, cap // 128 + 1):
        bk = 128 * mult
        if d % bk == 0:
            best = bk
    return best


def _kernel(xq_ref, xs_ref, q_ref, ws_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], q_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * xs_ref[...] * ws_ref[...]
        ).astype(o_ref.dtype)


def _fused_kernel(x_ref, q_ref, ws_ref, o_ref, xq_ref, xs_ref, acc_ref):
    j, k = pl.program_id(1), pl.program_id(2)
    bk = q_ref.shape[0]

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _quantize():
        # Quantize this row-tile ONCE, into VMEM scratch; every (j, k) tile of
        # the dot reuses it. This removes the separate HBM round-trip of the
        # XLA pre-pass (read bf16 x, write int8 xq + f32 xs, re-read both).
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) * _INV127  # see _INV127: bit-stable scale
        xs_ref[...] = xs
        xq_ref[...] = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[:, pl.dslice(k * bk, bk)], q_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * xs_ref[...] * ws_ref[...]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_f", "block_k", "out_dtype", "interpret")
)
def w8a8_matmul_fused(
    x: jnp.ndarray,  # [..., D] bf16/f32 activations (NOT pre-quantized)
    q: jnp.ndarray,  # [D, F] int8
    ws: jnp.ndarray,  # [1, F] f32 per-output-channel scales
    *,
    block_m: int = 256,
    block_f: int = 512,
    block_k: int = 0,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """W8A8 matmul with the per-row activation quantization FUSED into the
    kernel: x tiles are quantized to int8 in VMEM at (j==0, k==0) of each
    row-tile and reused across all F/D tiles of the dot.

    vs `w8a8_matmul_pallas` (which takes `quantize_rows` output): saves the
    quantize pre-pass's HBM round-trip — at 7B prefill shapes the XLA pre-pass
    costs a read of x plus a write+read of xq/xs per matmul site. The full x
    row-tile ([bm, D] bf16 + [bm, D] int8 scratch) must fit VMEM next to the
    weight tile, so bm shrinks for the wide `down` contraction (D=18944)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    f = q.shape[-1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    # Resident-row-tile VMEM: measured on v5e, Mosaic charges ~9 bytes/element
    # for the (bm, d) bf16 block + int8 scratch (double/triple buffering of the
    # input block; the 7B down shape d=18944 at bm=128 was reported as 21.94 MB
    # against the 16 MB scoped-vmem limit). Budget 11 MB so weight tiles +
    # accumulator + output fit beside it; bm may shrink below 128 (sublane
    # minimum for bf16 is 16).
    bm = min(block_m, m)
    while bm > 16 and bm * d * 9 > 11 * 1024 * 1024:
        bm //= 2
    pad_m = -m % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
        m += pad_m
    bf = block_f
    while f % bf:
        bf //= 2
    bk = block_k or _pick_bk(d, cap=1024)
    if not bk or d % bk:
        raise ValueError(f"D={d} has no 128-multiple divisor block")
    grid = (m // bm, f // bf, d // bk)

    out = pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j, k: (i, 0)),  # resident row-tile
            pl.BlockSpec((bk, bf), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bf), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, f), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, bf), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * m * d * f),
            bytes_accessed=int(x2.size * 2 + q.size + m * f * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, q, ws.reshape(1, -1).astype(jnp.float32))
    if pad_m:
        out = out[:-pad_m]
    return out.reshape(*lead, f)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_f", "block_k", "out_dtype", "interpret")
)
def w8a8_matmul_pallas(
    xq: jnp.ndarray,  # [..., D] int8 (from quantize_rows)
    xs: jnp.ndarray,  # [..., 1] f32 per-row scales
    q: jnp.ndarray,  # [D, F] int8
    ws: jnp.ndarray,  # [1, F] f32 per-output-channel scales
    *,
    block_m: int = 256,
    block_f: int = 512,
    block_k: int = 0,  # 0 -> largest 128-multiple divisor of D within VMEM cap
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    lead = xq.shape[:-1]
    d = xq.shape[-1]
    f = q.shape[-1]
    x2 = xq.reshape(-1, d)
    s2 = xs.reshape(-1, 1).astype(jnp.float32)
    m = x2.shape[0]
    bm = min(block_m, m)
    pad_m = -m % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
        s2 = jnp.pad(s2, ((0, pad_m), (0, 0)))
        m += pad_m
    bf = block_f
    while f % bf:
        bf //= 2
    bk = block_k or _pick_bk(d)
    if not bk or d % bk:  # D not 128-aligned: caller should use the XLA path
        raise ValueError(f"D={d} has no 128-multiple divisor block")
    grid = (m // bm, f // bf, d // bk)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((bk, bf), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bf), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bf), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, f), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bf), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * m * d * f),
            bytes_accessed=int(x2.size + q.size + m * f * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, s2, q, ws.reshape(1, -1).astype(jnp.float32))
    if pad_m:
        out = out[:-pad_m]
    return out.reshape(*lead, f)
