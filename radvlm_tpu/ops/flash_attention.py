"""Pallas TPU flash attention (fused online-softmax attention kernel).

TPU-native replacement for the reference's flash-attn-2 CUDA dependency
(`finetuning/llava/train/train.py:166`, `llama_flash_attn_monkey_patch.py:8-13`).
Varlen/packed batches use segment-id masking instead of cu_seqlens ragged kernels
(`modeling_llama.py:505-533`) — segment IDs compose with static shapes and cost one
VMEM vector per block.

Kernel design (see /opt/skills/guides/pallas_guide.md):
- internal layout is [batch, heads, seq, head_dim]; the public wrapper takes the
  framework-wide [batch, seq, heads, head_dim] and transposes (one fused HBM pass);
- grid = (batch, q_heads, num_q_blocks, num_kv_blocks), kv innermost ("arbitrary"
  semantics) carrying the online-softmax state (running max m, denominator l,
  fp32 output accumulator) in VMEM scratch across grid steps;
- GQA folds into the k/v BlockSpec index map (kv head = q head // group) — no
  repeat_kv materialization in HBM;
- causal masking prunes whole kv blocks via @pl.when plus an intra-block triangle
  mask on diagonal blocks, so causal attention does ~half the FLOPs;
- segment ids ride in TPU-friendly layouts (q: [b, sq, 128] lanes-broadcast, kv:
  [b, 8, sk] sublanes-broadcast) to avoid lane<->sublane relayouts in the kernel;
- logits/softmax in fp32 (preferred_element_type) with bf16 inputs on the MXU.

Backward: custom VJP with two Pallas kernel passes (flash-attention-2 style): dk/dv
with kv-major grid, dq with q-major grid, both recomputing p = exp(s - lse) from the
saved (q, k, v, o, logsumexp) so training memory stays O(S) instead of O(S^2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
SUBLANES = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_block(seq: int, pref: int) -> int:
    """Largest power-of-two block <= pref that divides seq (else seq itself)."""
    if seq <= pref:
        return seq
    b = pref
    while b >= LANES:
        if seq % b == 0:
            return b
        b //= 2
    return seq


def _seg_masks(qseg, kseg, shape, block_k):
    """qseg: [bq, LANES] (lane-broadcast), kseg: [1, bk]. Returns bool [bq, bk]."""
    repeats = block_k // LANES
    q2 = jnp.tile(qseg, (1, repeats)) if repeats > 1 else qseg  # [bq, bk]
    return (q2 == kseg) & (q2 != 0)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,  # [1, 1, bq, d]
    k_ref,  # [1, 1, bk, d]
    v_ref,  # [1, 1, bk, d]
    qseg_ref,  # [1, bq, LANES] or None
    kseg_ref,  # [1, SUBLANES, bk] or None
    o_ref,  # [1, 1, bq, d]
    lse_ref,  # [1, 1, bq, LANES] f32
    m_scr,  # VMEM [bq, LANES] f32
    l_scr,  # VMEM [bq, LANES] f32
    acc_scr,  # VMEM [bq, d] f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
):
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    run = True
    needs_mask = False
    if causal:
        run = (ik * block_k) <= (iq * block_q + block_q - 1)
        # Intra-block triangle needed only where the diagonal crosses the
        # block; cells fully below it are unmasked (the common case — the
        # mask iota/cmp/where VPU passes on [bq, bk] measured ~35% of the
        # whole kernel at the 7B prefill shape, 2026-08-20 scan-loop bench).
        needs_mask = (ik * block_k + block_k - 1) > (iq * block_q)
    if qseg_ref is not None:
        # One segment covering the whole q block and the whole k block (and
        # the same one) makes the segment mask all-true: skip building it.
        # Padding (seg 0) and packed-sample boundaries land in mixed blocks,
        # which take the masked path below.
        qs = qseg_ref[0]  # [bq, LANES]
        ks = kseg_ref[0, :1, :]  # [1, bk]
        q_lo, q_hi = jnp.min(qs), jnp.max(qs)
        k_lo, k_hi = jnp.min(ks), jnp.max(ks)
        uniform = (q_lo == q_hi) & (k_lo == k_hi) & (q_lo == k_lo) & (q_lo != 0)
        needs_mask = needs_mask | ~uniform

    def _accumulate(s, mask):
        v = v_ref[0, 0]  # [bk, d]
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m_prev = m_scr[:, :1]  # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        if mask is not None:
            # Zero masked entries EXPLICITLY: on a fully-masked row every
            # s == m_new == DEFAULT_MASK_VALUE, so exp(s - m_new) = 1 and the
            # row would accumulate l = sum-of-ones — output mean(v) and a
            # finite lse instead of the documented (0, -inf) contract that the
            # ring merge's guards rely on (code-review repro).
            p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)

        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _scores():
        # Scale folds into the q tile ([bq, d] VPU pass) instead of the
        # [bq, bk] score matrix; f32 round-trip keeps the bf16 rounding of
        # q*scale to one ulp.
        q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0, 0]  # [bk, d]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]

    if not causal and qseg_ref is None:  # statically mask-free
        _accumulate(_scores(), None)
        _emit_output(o_ref, lse_ref, m_scr, l_scr, acc_scr, ik, nk)
        return

    @pl.when(run & jnp.logical_not(needs_mask))
    def _compute_clean():
        _accumulate(_scores(), None)

    @pl.when(run & needs_mask)
    def _compute_masked():
        s = _scores()
        mask = None
        if causal:
            q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            mask = q_pos >= k_pos
        if qseg_ref is not None:
            seg = _seg_masks(qseg_ref[0], kseg_ref[0, :1, :], s.shape, block_k)
            mask = seg if mask is None else (mask & seg)
        _accumulate(s, mask if mask is not None else None)

    _emit_output(o_ref, lse_ref, m_scr, l_scr, acc_scr, ik, nk)


def _emit_output(o_ref, lse_ref, m_scr, l_scr, acc_scr, ik, nk):
    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padding) rows
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse = m_scr[:] + jnp.log(jnp.where(l_scr[:] == 0.0, 1.0, l_scr[:]))
        lse_ref[0, 0] = jnp.where(l_scr[:] == 0.0, -jnp.inf, lse)


def _fwd(q, k, v, qseg, kseg, *, causal, scale, block_q, block_k, interpret):
    """q: [b, h, sq, d]; k/v: [b, hkv, sk, d]; qseg: [b, sq] kseg: [b, sk] or None.

    Returns (o [b, h, sq, d], lse [b, h, sq, LANES] fp32).
    """
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    g = h // hkv
    bq = _pick_block(sq, block_q)
    bk = _pick_block(sk, block_k)
    nq, nk = sq // bq, sk // bk
    assert nq * bq == sq and nk * bk == sk, (sq, sk, bq, bk)

    has_seg = qseg is not None
    if has_seg and (bq % LANES or bk % LANES):
        raise ValueError(
            f"flash attention with segment ids needs block sizes that are "
            f"multiples of {LANES}; got block_q={bq}, block_k={bk} for "
            f"seq lengths ({sq}, {sk}) — pad sequences to a {LANES} multiple"
        )
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda ib, ih, iq, ik: (ib, ih // g, ik, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda ib, ih, iq, ik: (ib, ih // g, ik, 0)),
    ]
    args = [q, k, v]
    if has_seg:
        q_seg = jax.lax.broadcast_in_dim(
            qseg.astype(jnp.int32), (b, sq, LANES), (0, 1)
        )
        kv_seg = jax.lax.broadcast_in_dim(
            kseg.astype(jnp.int32), (b, SUBLANES, sk), (0, 2)
        )
        in_specs += [
            pl.BlockSpec((1, bq, LANES), lambda ib, ih, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, SUBLANES, bk), lambda ib, ih, iq, ik: (ib, 0, ik)),
        ]
        args += [q_seg, kv_seg]
        kernel = functools.partial(
            _fwd_kernel, scale=scale, causal=causal, block_q=bq, block_k=bk
        )
    else:
        base = functools.partial(
            _fwd_kernel, scale=scale, causal=causal, block_q=bq, block_k=bk
        )

        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr):
            base(q_ref, k_ref, v_ref, None, None, o_ref, lse_ref,
                 m_scr, l_scr, acc_scr)

    o, lse = pl.pallas_call(
        kernel,
        grid=(b, h, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, 1, bq, LANES), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * sq * sk * d * (0.5 if causal else 1.0)),
            bytes_accessed=int(
                (q.size + k.size + v.size + q.size) * q.dtype.itemsize
            ),
            transcendentals=int(b * h * sq * sk),
        ),
        interpret=interpret,
    )(*args)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels (flash-attention-2 style recompute)
# ---------------------------------------------------------------------------


def _recompute_p(q, k, lse, iq, ik, *, scale, causal, block_q, block_k,
                 qseg_ref, kseg_ref):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    mask = None
    if causal:
        q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = q_pos >= k_pos
    if qseg_ref is not None:
        seg = _seg_masks(qseg_ref[0], kseg_ref[0, :1, :], s.shape, block_k)
        mask = seg if mask is None else (mask & seg)
    p = jnp.exp(s - lse)  # lse = -inf on padding rows -> p = 0
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    return p


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, block_q, block_k,
):
    """Grid (b, h, nKV, nQ): q-block loop (innermost) accumulates dk/dv."""
    ik, iq = pl.program_id(2), pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = True
    if causal:
        run = (ik * block_k) <= (iq * block_q + block_q - 1)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]  # [bq, 1]
        delta = delta_ref[0, 0][:, :1]
        p = _recompute_p(q, k, lse, iq, ik, scale=scale, causal=causal,
                         block_q=block_q, block_k=block_k,
                         qseg_ref=qseg_ref, kseg_ref=kseg_ref)
        dv_scr[:] += jax.lax.dot_general(
            p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, d]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta) * scale
        dk_scr[:] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, d]

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scr,
    *, scale, causal, block_q, block_k,
):
    """Grid (b, h, nQ, nKV): kv-block loop (innermost) accumulates dq."""
    iq, ik = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = True
    if causal:
        run = (ik * block_k) <= (iq * block_q + block_q - 1)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]
        p = _recompute_p(q, k, lse, iq, ik, scale=scale, causal=causal,
                         block_q=block_q, block_k=block_k,
                         qseg_ref=qseg_ref, kseg_ref=kseg_ref)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale  # [bq, bk] f32
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd(q, k, v, qseg, kseg, o, lse, do,
         *, causal, scale, block_q, block_k, interpret, dlse=None):
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    g = h // hkv
    bq = _pick_block(sq, block_q)
    bk = _pick_block(sk, block_k)
    nq, nk = sq // bq, sk // bk

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dlse is not None:
        # Cotangent of the logsumexp output folds into delta: the extra score
        # gradient is ds += dlse_i * p_ij * scale, i.e. delta_eff = delta - dlse.
        delta = delta - dlse.astype(jnp.float32)
    delta = jax.lax.broadcast_in_dim(delta, (b, h, sq, LANES), (0, 1, 2))

    has_seg = qseg is not None
    seg_arrays = []
    if has_seg:
        seg_arrays = [
            jax.lax.broadcast_in_dim(qseg.astype(jnp.int32), (b, sq, LANES), (0, 1)),
            jax.lax.broadcast_in_dim(
                kseg.astype(jnp.int32), (b, SUBLANES, sk), (0, 2)
            ),
        ]

    def specs(order):
        """order: tuple mapping grid indices -> (iq_slot, ik_slot)."""
        if order == "kv_major":  # grid (b, h, ik, iq)
            qmap = lambda ib, ih, ik, iq: (ib, ih, iq, 0)
            kmap = lambda ib, ih, ik, iq: (ib, ih // g, ik, 0)
            qsmap = lambda ib, ih, ik, iq: (ib, iq, 0)
            ksmap = lambda ib, ih, ik, iq: (ib, 0, ik)
        else:  # grid (b, h, iq, ik)
            qmap = lambda ib, ih, iq, ik: (ib, ih, iq, 0)
            kmap = lambda ib, ih, iq, ik: (ib, ih // g, ik, 0)
            qsmap = lambda ib, ih, iq, ik: (ib, iq, 0)
            ksmap = lambda ib, ih, iq, ik: (ib, 0, ik)
        sp = [
            pl.BlockSpec((1, 1, bq, d), qmap),
            pl.BlockSpec((1, 1, bk, d), kmap),
            pl.BlockSpec((1, 1, bk, d), kmap),
        ]
        if has_seg:
            sp += [
                pl.BlockSpec((1, bq, LANES), qsmap),
                pl.BlockSpec((1, SUBLANES, bk), ksmap),
            ]
        sp += [
            pl.BlockSpec((1, 1, bq, d), qmap),  # do
            pl.BlockSpec((1, 1, bq, LANES), qsmap_row(order)),  # lse
            pl.BlockSpec((1, 1, bq, LANES), qsmap_row(order)),  # delta
        ]
        return sp

    def qsmap_row(order):
        if order == "kv_major":
            return lambda ib, ih, ik, iq: (ib, ih, iq, 0)
        return lambda ib, ih, iq, ik: (ib, ih, iq, 0)

    common = dict(scale=scale, causal=causal, block_q=bq, block_k=bk)

    base_dkv = functools.partial(_bwd_dkv_kernel, **common)
    if not has_seg:
        def kern_dkv(q_r, k_r, v_r, do_r, lse_r, dl_r, dk_r, dv_r, s1, s2):
            base_dkv(q_r, k_r, v_r, None, None, do_r, lse_r, dl_r,
                     dk_r, dv_r, s1, s2)
    else:
        kern_dkv = base_dkv

    dk, dv = pl.pallas_call(
        kern_dkv,
        grid=(b, h, nk, nq),
        in_specs=specs("kv_major"),
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, ik, iq: (ib, ih, ik, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, ik, iq: (ib, ih, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, sk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, *seg_arrays, do, lse, delta)

    if g > 1:
        dk = dk.reshape(b, hkv, g, sk, d).sum(axis=2)
        dv = dv.reshape(b, hkv, g, sk, d).sum(axis=2)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)

    base_dq = functools.partial(_bwd_dq_kernel, **common)
    if not has_seg:
        def kern_dq(q_r, k_r, v_r, do_r, lse_r, dl_r, dq_r, s1):
            base_dq(q_r, k_r, v_r, None, None, do_r, lse_r, dl_r, dq_r, s1)
    else:
        kern_dq = base_dq

    dq = pl.pallas_call(
        kern_dq,
        grid=(b, h, nq, nk),
        in_specs=specs("q_major"),
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, *seg_arrays, do, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry point (BSHD wrapper + custom VJP)
# ---------------------------------------------------------------------------


def _short_eligible(q, k, qseg, causal) -> bool:
    """Single-pass kernel dispatch: small square unmasked self-attention
    (the vision towers' 577/729-token tiles)."""
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    return (
        not causal
        and qseg is None
        and h == hkv
        and sq == sk
        and 128 <= sq <= 1024
        and d <= 128
    )


def _fwd_short(q, k, v, *, scale, interpret):
    """Single-pass non-causal attention for short unmasked sequences.

    The general kernel's online-softmax machinery (m/l scratch broadcast to
    LANES, fp32 lse output, rescale chain) is pure overhead when the whole
    kv sequence fits one block — which is exactly the vision-tower shape
    (729 tokens, head_dim 72: no power-of-two block divides 729, so
    `_pick_block` degrades to one whole-sequence block anyway). This kernel
    does plain softmax in one pass and folds G heads into each grid cell so
    the ~1.5 us/cell of work pipelines instead of draining between tiny
    cells. Measured on v5e (B=6, H=16, S=729, D=72): 131 TF/s vs 45 through
    the general kernel — right at the ceiling set by the 72->128 lane pad.

    Inference-only: `_flash`'s primal. Differentiation goes through the
    general `_fwd` (which produces the lse the FA2 backward needs).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    # G heads per grid cell: enough work to pipeline, bounded by scoped VMEM
    # (16M): fp32 score tile g*sqp*skp*4 plus the 4 q/k/v/o tiles at the
    # input dtype. f32 inputs at g=4/S=729 measured 16.29M > limit (fill
    # bench OOM); the estimate below reproduces that accounting with margin.
    dpad = -(-d // 128) * 128
    sqp = -(-sq // 8) * 8
    skp = -(-sk // 128) * 128
    g = 1
    for cand in (4, 2):
        est = cand * (sqp * skp * 4 + 4 * sqp * dpad * q.dtype.itemsize)
        if h % cand == 0 and est <= 14 * 2**20:
            g = cand
            break

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for i in range(g):
            qi, ki, vi = q_ref[0, i], k_ref[0, i], v_ref[0, i]
            s = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(vi.dtype), vi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, i] = (o / l).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, h // g),
        in_specs=[
            pl.BlockSpec((1, g, sq, d), lambda ib, ih: (ib, ih, 0, 0))
        ] * 3,
        out_specs=pl.BlockSpec((1, g, sq, d), lambda ib, ih: (ib, ih, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * sq * sk * d),
            bytes_accessed=int(4 * q.size * q.dtype.itemsize),
            transcendentals=int(b * h * sq * sk),
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, qseg, kseg, causal, scale, block_q, block_k, interpret):
    if _short_eligible(q, k, qseg, causal):
        return _fwd_short(q, k, v, scale=scale, interpret=interpret)
    o, _ = _fwd(q, k, v, qseg, kseg, causal=causal, scale=scale,
                block_q=block_q, block_k=block_k, interpret=interpret)
    return o


def _flash_fwd(q, k, v, qseg, kseg, causal, scale, block_q, block_k, interpret):
    o, lse = _fwd(q, k, v, qseg, kseg, causal=causal, scale=scale,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return o, (q, k, v, qseg, kseg, o, lse)


def _flash_bwd(causal, scale, block_q, block_k, interpret, res, do):
    q, k, v, qseg, kseg, o, lse = res
    dq, dk, dv = _bwd(q, k, v, qseg, kseg, o, lse, do,
                      causal=causal, scale=scale,
                      block_q=block_q, block_k=block_k, interpret=interpret)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_lse(q, k, v, qseg, kseg, causal, scale, block_q, block_k, interpret):
    o, lse = _fwd(q, k, v, qseg, kseg, causal=causal, scale=scale,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return o, lse[..., 0]


def _flash_lse_fwd(q, k, v, qseg, kseg, causal, scale, block_q, block_k,
                   interpret):
    o, lse = _fwd(q, k, v, qseg, kseg, causal=causal, scale=scale,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return (o, lse[..., 0]), (q, k, v, qseg, kseg, o, lse)


def _flash_lse_bwd(causal, scale, block_q, block_k, interpret, res, cts):
    do, dlse = cts
    q, k, v, qseg, kseg, o, lse = res
    dq, dk, dv = _bwd(q, k, v, qseg, kseg, o, lse, do,
                      causal=causal, scale=scale, block_q=block_q,
                      block_k=block_k, interpret=interpret, dlse=dlse)
    return dq, dk, dv, None, None


_flash_lse.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def _pad_target(s: int, block: int) -> int:
    """Sequence length the kernel should see: the next multiple of the block
    granularity (block, capped at 512) when `s` would otherwise degrade
    `_pick_block` to tiny tiles.

    The grid loop pays a fixed per-step cost (DMA issue + mask/softmax
    bookkeeping), so block size sets the compute:overhead ratio. A bucket like
    3456 (= 27 x 128) is only divisible by 128: the kernel silently ran
    128 x 128 tiles — measured 24 TF/s vs ~73+ at 512-class blocks on v5e
    (7.0 ms/layer attention = 57% of the 7B batch-1 prefill, 2026-08-19
    profile). Padding K/V/segs to the next 512 multiple costs <4% masked
    compute and restores full-size tiles.
    """
    grain = min(block, 512)
    # Only already-128-aligned lengths opt in: collate's buckets are 128
    # multiples, while e.g. the SigLIP tower's 729-token tiles run the
    # single-block no-segment path, where synthesizing segment ids would
    # trip the 128-multiple block check (and padding 729 -> 1024 wastes 40%).
    if s <= block or s % LANES != 0 or s % grain == 0:
        return s
    return -(-s // grain) * grain


def _pad_seq(x: jnp.ndarray, target: int, axis: int) -> jnp.ndarray:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_inputs(q, k, v, qseg, kseg, block_q, block_k):
    """Right-pad sequences to block-granularity multiples (BSHD layout).

    Pad tokens carry segment id 0, so the kernels mask them exactly like
    collate()'s padding — when the caller gave no segment ids, valid=1 ids are
    synthesized first. Returns (q, k, v, qseg, kseg, sq) with sq the original
    query length for the caller to slice outputs back to.
    """
    sq, sk = q.shape[1], k.shape[1]
    tq, tk = _pad_target(sq, block_q), _pad_target(sk, block_k)
    if tq != sq or tk != sk:
        if qseg is None:
            qseg = jnp.ones((q.shape[0], sq), jnp.int32)
            kseg = jnp.ones((k.shape[0], sk), jnp.int32)
        q, k, v = _pad_seq(q, tq, 1), _pad_seq(k, tk, 1), _pad_seq(v, tk, 1)
        qseg, kseg = _pad_seq(qseg, tq, 1), _pad_seq(kseg, tk, 1)
    return q, k, v, qseg, kseg, sq


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused attention returning (out [B,Sq,H,D], lse [B,H,Sq]).

    The logsumexp output makes partial attentions mergeable — the building block
    for ring attention (`parallel/ring.py`). Fully-masked rows have lse = -inf
    and zero output. Differentiable: a custom VJP reuses the FA2 backward
    kernels, with the lse cotangent folded into delta (ring attention's merge
    backpropagates through both outputs).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("provide both or neither of q/kv segment ids")
    q, k, v, q_segment_ids, kv_segment_ids, sq = _pad_inputs(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k
    )
    o, lse = _flash_lse(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        q_segment_ids,
        kv_segment_ids,
        bool(causal),
        float(scale),
        int(block_q),
        int(block_k),
        bool(interpret),
    )
    return o.transpose(0, 2, 1, 3)[:, :sq], lse[:, :, :sq]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. q:[B,Sq,H,D] k,v:[B,Sk,Hkv,D] -> [B,Sq,H,D].

    Constraints: head_dim should be >= 64 (ideally 128-aligned) and Sq/Sk divisible
    by a 128-multiple block (the collate pads sequences to 128 multiples).
    Default blocks (512, 1024) measured best on v5e at 8k causal (73 TF/s vs 45 at
    512/512); larger k blocks exceed VMEM.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("provide both or neither of q/kv segment ids")
    q, k, v, q_segment_ids, kv_segment_ids, sq = _pad_inputs(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k
    )
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = _flash(qt, kt, vt, q_segment_ids, kv_segment_ids,
               bool(causal), float(scale), int(block_q), int(block_k),
               bool(interpret))
    return o.transpose(0, 2, 1, 3)[:, :sq]
