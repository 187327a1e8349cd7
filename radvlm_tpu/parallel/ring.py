"""Ring attention: sequence-parallel attention over an ICI mesh axis.

TPU-native realization of the reference's *dormant* zigzag ring flash attention
(`finetuning/llava/model/language_model/modeling_llama.py:385-563,833-836` —
implemented for CUDA/NCCL P2P but never enabled; SURVEY.md §2.7). Here it is a
first-class long-context mechanism: the sequence dim is sharded over a mesh axis;
each device holds one q/k/v shard, K/V shards rotate around the ring with
`jax.lax.ppermute` (compiled onto ICI), local chunks attend via the Pallas flash
kernel, and partial results merge with the online-softmax rule using the kernel's
logsumexp output.

Two schedules:
- "contiguous": rank i holds positions [i*S, (i+1)*S). A kv chunk strictly
  before the q chunk attends fully, the diagonal chunk causally, future chunks
  are skipped (a real lax.switch skip) — simple, but the last rank computes N
  chunk pairs while the first computes 1.
- "zigzag": the sequence is pre-permuted into 2N chunks with rank i holding
  chunks (i, 2N-1-i) (the reference's dormant zigzag ring flash attention,
  `modeling_llama.py:385-563`). Per ring step every rank computes exactly 2
  half-chunk attentions (3 on the diagonal step) — load-balanced causal SP.
  Data enters already zigzag-permuted (see `zigzag_indices` /
  `zigzag_shift_batch`): the permutation travels with positions/segment ids so
  rope and masking stay correct, and training pre-shifts labels so the loss is
  permutation-invariant.

Backward: recomputation — the whole ring forward is wrapped in `jax.checkpoint`
at the call site (engineered for training under remat), so autodiff re-runs the
ring; each local flash call contributes its own VJP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from radvlm_tpu.ops.attention import make_attention_mask, mha_reference


def _local_attn_with_lse(
    q, k, v, q_seg, kv_seg, *, causal, scale, impl, interpret=False
):
    """(out, lse) for one chunk pair. impl="flash" uses the Pallas kernel;
    "xla" uses the reference path (CPU tests)."""
    if impl == "flash":
        from radvlm_tpu.ops.flash_attention import flash_attention_with_lse

        return flash_attention_with_lse(
            q, k, v, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            causal=causal, scale=scale, interpret=interpret,
        )
    # XLA reference with explicit lse.
    b, sq, h, d = q.shape
    hkv = k.shape[2]
    if hkv != h:
        from radvlm_tpu.ops.attention import repeat_kv

        k = repeat_kv(k, h // hkv)
        v = repeat_kv(v, h // hkv)
    mask = make_attention_mask(q_seg, kv_seg, causal)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1)  # [b,h,q]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - m_safe[..., None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o = (o / safe_l.transpose(0, 2, 1)[..., None]).astype(q.dtype)
    lse = jnp.where(l == 0.0, -jnp.inf, m_safe + jnp.log(safe_l))
    return o, lse


def _merge(o_acc, m_acc, l_acc, o_t, lse_t):
    """Online-softmax merge of a new partial attention into the running state.

    Invariant: o_acc is the UNNORMALIZED numerator relative to scale m_acc
    (i.e. true_out = o_acc / l_acc); each chunk's normalized o_t re-enters the
    numerator with weight exp(lse_t - m_new).
    """
    m_new = jnp.maximum(m_acc, lse_t)
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.where(jnp.isfinite(m_acc), jnp.exp(m_acc - m_safe), 0.0)
    beta = jnp.where(jnp.isfinite(lse_t), jnp.exp(lse_t - m_safe), 0.0)
    l_new = l_acc * alpha + beta
    a = alpha.transpose(0, 2, 1)[..., None]
    b = beta.transpose(0, 2, 1)[..., None]
    o_new = o_acc * a + o_t.astype(jnp.float32) * b
    return o_new, m_new, l_new


def _pair_attn(q, k_t, v_t, qseg, kseg_t, rel, *, scale, impl, interpret):
    """One chunk-pair attention with a traced relation: rel < 0 full,
    rel == 0 diagonal (causal), rel > 0 skip (no compute — lax.switch runs only
    the selected branch, so skipped pairs cost nothing)."""
    b, sq, h, d = q.shape

    def full(_):
        return _local_attn_with_lse(
            q, k_t, v_t, qseg, kseg_t,
            causal=False, scale=scale, impl=impl, interpret=interpret,
        )

    def diag(_):
        return _local_attn_with_lse(
            q, k_t, v_t, qseg, kseg_t,
            causal=True, scale=scale, impl=impl, interpret=interpret,
        )

    def skip(_):
        return (
            jnp.zeros((b, sq, h, d), q.dtype),
            jnp.full((b, h, sq), -jnp.inf, jnp.float32),
        )

    return jax.lax.switch(jnp.clip(rel, -1, 1) + 1, (full, diag, skip), None)


def ring_attention(
    q: jnp.ndarray,  # [B, S_local, H, D] (this rank's sequence shard)
    k: jnp.ndarray,  # [B, S_local, Hkv, D]
    v: jnp.ndarray,
    *,
    axis_name: str,
    q_segment_ids: Optional[jnp.ndarray] = None,  # [B, S_local]
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    impl: str = "flash",
    schedule: str = "contiguous",
    interpret: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel attention inside shard_map over `axis_name`.

    Equivalent to full attention over the concatenated sequence. For
    schedule="contiguous", rank i holds positions [i*S_local, (i+1)*S_local);
    for "zigzag", rank i holds zigzag chunks (i, 2N-1-i) of the pre-permuted
    sequence (see module docstring).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if schedule == "zigzag" and causal:
        return _ring_attention_zigzag(
            q, k, v, axis_name=axis_name, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, scale=scale, impl=impl,
            interpret=interpret,
        )
    axis_size = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, s_local), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((b, s_local), jnp.int32)

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def body(t, carry):
        k_t, v_t, kvseg_t, o_acc, m_acc, l_acc = carry
        src = (my - t) % axis_size  # which rank's kv chunk we hold now

        # rel: src < my -> full; src == my -> diagonal; src > my -> skip
        # (non-causal: everything attends fully).
        rel = (src - my) if causal else jnp.int32(-1)
        o_t, lse_t = _pair_attn(
            q, k_t, v_t, q_segment_ids, kvseg_t, rel,
            scale=scale, impl=impl, interpret=interpret,
        )
        o_acc, m_acc, l_acc = _merge(o_acc, m_acc, l_acc, o_t, lse_t)

        k_n = jax.lax.ppermute(k_t, axis_name, perm)
        v_n = jax.lax.ppermute(v_t, axis_name, perm)
        kvseg_n = jax.lax.ppermute(kvseg_t, axis_name, perm)
        return k_n, v_n, kvseg_n, o_acc, m_acc, l_acc

    o0 = jnp.zeros((b, s_local, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_local), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s_local), jnp.float32)
    carry = (k, v, kv_segment_ids, o0, m0, l0)
    carry = jax.lax.fori_loop(0, axis_size, body, carry)
    _, _, _, o_acc, m_acc, l_acc = carry
    safe_l = jnp.where(l_acc == 0.0, 1.0, l_acc)
    out = o_acc / safe_l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def _ring_attention_zigzag(
    q, k, v, *, axis_name, q_segment_ids, kv_segment_ids, scale, impl,
    interpret,
):
    """Zigzag schedule: local shard = [chunk my, chunk 2N-1-my] halves.

    Chunk-pair causal relations with kv from source rank j (q rank i):
      lo x lo: full if j < i, diagonal if j == i, skip if j > i
      hi x lo: always full (every low chunk precedes every high chunk)
      hi x hi: full if j > i, diagonal if j == i, skip if j < i
      lo x hi: always skip
    At step t == 0 every rank runs the two diagonals + one full; at t > 0
    exactly one of lo x lo / hi x hi is live — 2 half-pairs per rank per step,
    perfectly balanced (the reference zigzag property).
    """
    axis_size = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    sh = s_local // 2
    assert sh * 2 == s_local, "zigzag needs an even local shard"
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, s_local), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((b, s_local), jnp.int32)

    q_lo, q_hi = q[:, :sh], q[:, sh:]
    qs_lo, qs_hi = q_segment_ids[:, :sh], q_segment_ids[:, sh:]
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def body(t, carry):
        k_t, v_t, kvseg_t, acc_lo, acc_hi = carry
        src = (my - t) % axis_size
        k_lo, k_hi = k_t[:, :sh], k_t[:, sh:]
        v_lo, v_hi = v_t[:, :sh], v_t[:, sh:]
        ks_lo, ks_hi = kvseg_t[:, :sh], kvseg_t[:, sh:]

        pair = functools.partial(
            _pair_attn, scale=scale, impl=impl, interpret=interpret
        )
        # q_lo x kv_lo
        o_t, lse_t = pair(q_lo, k_lo, v_lo, qs_lo, ks_lo, src - my)
        acc_lo = _merge(*acc_lo, o_t, lse_t)
        # q_hi x kv_lo (always full)
        o_t, lse_t = pair(q_hi, k_lo, v_lo, qs_hi, ks_lo, jnp.int32(-1))
        acc_hi = _merge(*acc_hi, o_t, lse_t)
        # q_hi x kv_hi
        o_t, lse_t = pair(q_hi, k_hi, v_hi, qs_hi, ks_hi, my - src)
        acc_hi = _merge(*acc_hi, o_t, lse_t)

        k_n = jax.lax.ppermute(k_t, axis_name, perm)
        v_n = jax.lax.ppermute(v_t, axis_name, perm)
        kvseg_n = jax.lax.ppermute(kvseg_t, axis_name, perm)
        return k_n, v_n, kvseg_n, acc_lo, acc_hi

    def zero_acc():
        return (
            jnp.zeros((b, sh, h, d), jnp.float32),
            jnp.full((b, h, sh), -jnp.inf, jnp.float32),
            jnp.zeros((b, h, sh), jnp.float32),
        )

    carry = (k, v, kv_segment_ids, zero_acc(), zero_acc())
    carry = jax.lax.fori_loop(0, axis_size, body, carry)
    _, _, _, acc_lo, acc_hi = carry

    def finish(acc):
        o_acc, _, l_acc = acc
        safe_l = jnp.where(l_acc == 0.0, 1.0, l_acc)
        return o_acc / safe_l.transpose(0, 2, 1)[..., None]

    return jnp.concatenate([finish(acc_lo), finish(acc_hi)], axis=1).astype(
        q.dtype
    )


# ---------------------------------------------------------------------------
# Zigzag data layout helpers (host-side, numpy)
# ---------------------------------------------------------------------------


def zigzag_indices(seq_len: int, n_ranks: int):
    """Permutation p with x[..., p] in zigzag layout: rank i's contiguous shard
    holds chunks (i, 2N-1-i) of the original sequence."""
    import numpy as np

    c = 2 * n_ranks
    if seq_len % c:
        raise ValueError(f"seq_len {seq_len} not divisible by 2*n_ranks={c}")
    cs = seq_len // c
    order = []
    for i in range(n_ranks):
        order.extend(range(i * cs, (i + 1) * cs))
        order.extend(range((c - 1 - i) * cs, (c - i) * cs))
    return np.asarray(order, np.int64)


def inverse_zigzag_indices(seq_len: int, n_ranks: int):
    import numpy as np

    p = zigzag_indices(seq_len, n_ranks)
    inv = np.empty_like(p)
    inv[p] = np.arange(seq_len)
    return inv


def zigzag_shift_batch(batch, n_ranks: int):
    """Host transform for zigzag SP training: pre-shift labels (labels_next[t]
    supervises logits[t], replicating loss_fn's shifted masking), then permute
    every per-position array into zigzag layout. The model's loss becomes a
    positionwise CE — permutation-invariant by construction."""
    import numpy as np

    from radvlm_tpu.config import IGNORE_INDEX

    labels = batch["labels"]
    seg = batch["segment_ids"]
    b = labels.shape[0]
    nxt = np.concatenate(
        [labels[:, 1:], np.full((b, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )
    seg_next = np.concatenate([seg[:, 1:], np.zeros((b, 1), seg.dtype)], axis=1)
    nxt = np.where(seg_next != 0, nxt, IGNORE_INDEX)

    perm = zigzag_indices(labels.shape[1], n_ranks)
    out = {k: v for k, v in batch.items() if k != "labels"}
    for key in ("tokens", "img_src", "positions", "segment_ids"):
        out[key] = np.ascontiguousarray(batch[key][:, perm])
    out["labels_next"] = np.ascontiguousarray(nxt[:, perm])
    return out


# ---------------------------------------------------------------------------
# Training integration: a process-global ring context consulted by ops.attention
# when the train step runs with attn_impl="ring".
# ---------------------------------------------------------------------------

_RING_CONTEXT = None  # (mesh, axis_name, local_impl, schedule)


def enable_ring_attention(mesh, *, axis_name: str = "seq", impl: str = "flash",
                          schedule: str = "zigzag"):
    """Register the mesh/axis for ring attention (train step with
    attn_impl='ring'). Pass mesh=None to disable."""
    global _RING_CONTEXT
    _RING_CONTEXT = None if mesh is None else (mesh, axis_name, impl, schedule)


def get_ring_context():
    if _RING_CONTEXT is None:
        raise RuntimeError(
            "attn_impl='ring' requires parallel.ring.enable_ring_attention(mesh)"
        )
    return _RING_CONTEXT


def ring_attention_sharded(q, k, v, q_segment_ids, kv_segment_ids, *,
                           causal: bool, scale):
    """shard_map'd ring attention over the registered context, for global
    [B, S, H, D] activations inside a pjit train step: batch shards over
    (data, fsdp), sequence over the ring axis, heads over tensor."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    mesh, axis_name, impl, schedule = get_ring_context()
    b, s = q.shape[:2]
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((b, s), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((b, s), jnp.int32)
    spec_q = P(("data", "fsdp"), axis_name, "tensor", None)
    spec_seg = P(("data", "fsdp"), axis_name)

    # ring_attention takes segs as kwargs; adapt positional order for shard_map.
    def positional(q, k, v, qs, ks, *, axis_name=axis_name, impl=impl):
        return ring_attention(
            q, k, v, axis_name=axis_name, q_segment_ids=qs,
            kv_segment_ids=ks, causal=causal, scale=scale, impl=impl,
            schedule=schedule,
        )

    fn = shard_map(
        positional, mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q, spec_seg, spec_seg),
        out_specs=spec_q, check_vma=False,
    )
    return fn(q, k, v, q_segment_ids, kv_segment_ids)


def make_ring_attention(mesh, *, axis_name: str = "seq", impl: str = "flash",
                        schedule: str = "contiguous", interpret: bool = False):
    """shard_map-wrapped ring attention over `mesh[axis_name]`.

    Returns fn(q, k, v, q_seg, kv_seg) with global [B, S, H, D] arrays sharded
    S over the axis (other mesh axes replicate here; compose with your own
    in/out shardings for combined DP+SP). With schedule="zigzag" the inputs
    must already be in zigzag layout (`zigzag_indices`).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec4 = P(None, axis_name, None, None)
    spec2 = P(None, axis_name)

    fn = functools.partial(ring_attention, axis_name=axis_name, impl=impl,
                           schedule=schedule, interpret=interpret)

    def wrapped(q, k, v, q_seg, kv_seg):
        return fn(
            q, k, v, q_segment_ids=q_seg, kv_segment_ids=kv_seg
        )

    return shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2, spec2),
        out_specs=spec4,
        check_vma=False,
    )
