"""Qwen2 decoder as pure-functional JAX (TPU-native rebuild of the reference LLM).

The reference wraps HF's torch Qwen2 (`finetuning/llava/model/language_model/
llava_qwen.py:46-145`). Here the decoder is a functional pytree-of-arrays model:

- parameters are nested dicts; the per-layer blocks are *stacked* along a leading
  layer axis and the forward pass runs `jax.lax.scan` over them (one compiled block
  body, fast XLA compiles, natural pipeline-parallel unit);
- attention dispatches through `radvlm_tpu.ops.attention.mha` (Pallas flash kernel on
  TPU, XLA reference elsewhere) with segment-id masking for packed/padded batches;
- the KV cache is a stacked [num_layers, B, Smax, Hkv*D] pair (heads folded into
  the minor dim for contiguous kernel DMAs). Prefill runs cache-less and collects
  per-layer K/V as scan outputs (`collect_kv`); decode carries the cache through
  the layer scan writing only the new token's slice, with the Pallas fused-heads
  kernel (`ops/decode_attention.py`) reading the stacked cache in place — enabling
  `lax.while_loop` decode without per-layer Python state.

Numerics contract (tested against HF transformers in tests/test_qwen2_parity.py):
RMSNorm in fp32, rotary "rotate_half" convention, GQA with QKV bias, SwiGLU MLP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from radvlm_tpu.config import Qwen2Config
from radvlm_tpu.ops.attention import apply_rope, mha, rms_norm

Params = Dict[str, Any]


def _dense(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def init_params(cfg: Qwen2Config, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameters (layout identical to what the HF importer produces)."""
    keys = jax.random.split(key, 16)
    d, hd = cfg.hidden_size, cfg.head_dim
    h, hkv = cfg.num_heads, cfg.num_kv_heads
    L = cfg.num_layers

    def stack(shape, k, scale=0.02):
        return _dense(k, (L,) + shape, scale).astype(dtype)

    params: Params = {
        "embed": {"embedding": _dense(keys[0], (cfg.vocab_size, d)).astype(dtype)},
        "layers": {
            "ln1": jnp.ones((L, d), dtype),
            "ln2": jnp.ones((L, d), dtype),
            "attn": {
                # Qwen2 has QKV bias; the Llama family (attention_bias=False)
                # omits the bias leaves entirely (HF-layout compatible).
                "q": {"kernel": stack((d, h * hd), keys[1]),
                      **({"bias": jnp.zeros((L, h * hd), dtype)} if cfg.attention_bias else {})},
                "k": {"kernel": stack((d, hkv * hd), keys[2]),
                      **({"bias": jnp.zeros((L, hkv * hd), dtype)} if cfg.attention_bias else {})},
                "v": {"kernel": stack((d, hkv * hd), keys[3]),
                      **({"bias": jnp.zeros((L, hkv * hd), dtype)} if cfg.attention_bias else {})},
                "o": {"kernel": stack((h * hd, d), keys[4])},
            },
            "mlp": {
                # MPT's non-gated ffn omits the gate branch entirely.
                **({"gate": {"kernel": stack((d, cfg.intermediate_size), keys[5])}}
                   if cfg.mlp_gated else {}),
                "up": {"kernel": stack((d, cfg.intermediate_size), keys[6])},
                "down": {"kernel": stack((cfg.intermediate_size, d), keys[7])},
            },
        },
        "norm": jnp.ones((d,), dtype),
    }
    if cfg.num_experts:
        # Qwen2-MoE: sparse expert MLPs + always-on shared expert with a
        # sigmoid gate; the dense "mlp" subtree is replaced wholesale.
        # Mixtral (shared_expert_intermediate_size=0) has no shared expert.
        e, m = cfg.num_experts, cfg.moe_intermediate_size
        ms = cfg.shared_expert_intermediate_size
        mkeys = jax.random.split(keys[9], 8)
        moe = {
            "router": {"kernel": stack((d, e), mkeys[0])},
            "experts": {
                "gate": _dense(mkeys[1], (L, e, d, m)).astype(dtype),
                "up": _dense(mkeys[2], (L, e, d, m)).astype(dtype),
                "down": _dense(mkeys[3], (L, e, m, d)).astype(dtype),
            },
        }
        if ms:
            moe["shared"] = {
                "gate": {"kernel": stack((d, ms), mkeys[4])},
                "up": {"kernel": stack((d, ms), mkeys[5])},
                "down": {"kernel": stack((ms, d), mkeys[6])},
            }
            moe["shared_gate"] = {"kernel": stack((d, 1), mkeys[7])}
        params["layers"]["mlp"] = {"moe": moe}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _dense(keys[8], (d, cfg.vocab_size)).astype(dtype)}
    return params


def _take(a: jnp.ndarray, idx) -> jnp.ndarray:
    return jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False)


def _mm_take(idx):
    """(matmul, slice) pair for a block body.

    idx=None: `lp` leaves are already per-layer (scan-over-xs slicing) — plain
    qmm + identity. idx given: `lp` is the FULL stacked layer tree and the
    body runs under a scan over layer indices — quantized matmuls hit the
    Pallas stacked-int8 kernel (ops/int8_matmul.int8_matmul_stacked) so the
    decode step streams int8 weight bytes with zero per-layer slice copies."""
    from radvlm_tpu.ops.quant import qmm, qmm_idx

    if idx is None:
        return qmm, lambda a: a
    return (lambda x, w: qmm_idx(x, w, idx)), (lambda a: _take(a, idx))


def fuse_projections(params: Params) -> Params:
    """Fuse attn q/k/v into one `qkv` projection and mlp gate/up into
    `gateup` (concatenated along the output axis; per-output-channel int8
    scales concatenate the same way, so quantization commutes with fusion).

    Inference-time transform (generation engine / eval / serving): halves the
    number of decode matmul launches and widens each launch's weight tile.
    Training, HF import/export, and checkpoints keep the unfused layout.
    Equivalent role to fused-QKV in serving stacks; the reference's HF/torch
    path has no analog (per-projection nn.Linear)."""
    from radvlm_tpu.ops.quant import Q_KEY, SCALE_KEY, is_qnode

    layers = params["layers"]
    attn, mlp = layers["attn"], layers["mlp"]
    if "qkv" in attn:  # already fused
        return params

    def cat(nodes):
        from radvlm_tpu.ops.int4_matmul import Q4_KEY, is_q4node

        if is_q4node(nodes[0]):
            # int4 packs along the contraction axis; output-axis concat is
            # valid for both the packed bytes and the group scales.
            return {
                Q4_KEY: jnp.concatenate([n[Q4_KEY] for n in nodes], axis=-1),
                SCALE_KEY: jnp.concatenate([n[SCALE_KEY] for n in nodes], axis=-1),
            }
        if is_qnode(nodes[0]):
            return {
                Q_KEY: jnp.concatenate([n[Q_KEY] for n in nodes], axis=-1),
                SCALE_KEY: jnp.concatenate([n[SCALE_KEY] for n in nodes], axis=-1),
            }
        return jnp.concatenate(nodes, axis=-1)

    new_layers = dict(layers)
    qkv = {"kernel": cat([attn[k]["kernel"] for k in ("q", "k", "v")])}
    if "bias" in attn["q"]:
        qkv["bias"] = jnp.concatenate(
            [attn[k]["bias"] for k in ("q", "k", "v")], axis=-1
        )
    new_layers["attn"] = {"qkv": qkv, "o": attn["o"]}
    if "moe" in mlp or "gate" not in mlp:
        # MoE blocks have no dense gate/up pair to fuse (experts stay in
        # their [L, E, ...] tables); MPT's non-gated ffn is already a single
        # up matmul. Only the attention projections fuse.
        new_layers["mlp"] = mlp
    else:
        new_layers["mlp"] = {
            "gateup": {"kernel": cat([mlp["gate"]["kernel"], mlp["up"]["kernel"]])},
            "down": mlp["down"],
        }
    out = dict(params)
    out["layers"] = new_layers
    return out


def _no(cfg: Qwen2Config) -> float:
    """RMSNorm weight offset: Gemma stores zero-centered weights, applied
    as (1 + w) in fp32 (HF GemmaRMSNorm)."""
    return 1.0 if cfg.rms_norm_offset else 0.0


def _norm(cfg: Qwen2Config, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pre/post-block normalization: RMSNorm for the rope families,
    weight-only LayerNorm for MPT (HF MptBlock norm_1/norm_2, no_bias)."""
    if cfg.norm_kind == "layernorm":
        from radvlm_tpu.ops.attention import layer_norm

        return layer_norm(x, w, None, cfg.rms_norm_eps)
    return rms_norm(x, w, cfg.rms_norm_eps, _no(cfg))


def _act(cfg: Qwen2Config, x: jnp.ndarray) -> jnp.ndarray:
    """MLP gate activation: SwiGLU (silu) for Qwen2/Llama/Mistral, GeGLU
    (tanh-approx gelu) for Gemma (HF hidden_act="gelu_pytorch_tanh"),
    exact GELU for MPT (HF MptMLP nn.GELU(approximate="none"))."""
    if cfg.hidden_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if cfg.hidden_act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.silu(x)


def _qkv(cfg: Qwen2Config, lp: Params, y: jnp.ndarray, positions: jnp.ndarray,
         idx=None):
    mm, take = _mm_take(idx)
    b, s, _ = y.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    attn = lp["attn"]
    if "qkv" in attn:
        qkv = mm(y, attn["qkv"]["kernel"])
        if "bias" in attn["qkv"]:
            qkv = qkv + take(attn["qkv"]["bias"])
        q, k, v = jnp.split(qkv, [h * hd, (h + hkv) * hd], axis=-1)
        q, k, v = (
            q.reshape(b, s, h, hd),
            k.reshape(b, s, hkv, hd),
            v.reshape(b, s, hkv, hd),
        )
    else:
        def proj(node):
            out = mm(y, node["kernel"])
            if "bias" in node:  # Llama family: no attention bias
                out = out + take(node["bias"])
            return out

        q = proj(attn["q"]).reshape(b, s, h, hd)
        k = proj(attn["k"]).reshape(b, s, hkv, hd)
        v = proj(attn["v"]).reshape(b, s, hkv, hd)
    llama3 = None
    if cfg.rope_scaling_type == "llama3":
        llama3 = dict(
            factor=cfg.rope_scaling,
            low_freq_factor=cfg.rope_low_freq_factor,
            high_freq_factor=cfg.rope_high_freq_factor,
            original_max_position=cfg.rope_original_max_position,
        )
    elif cfg.rope_scaling != 1.0:  # "linear"
        positions = positions.astype(jnp.float32) / cfg.rope_scaling
    if cfg.pos_embedding == "rope":
        q = apply_rope(q, positions, cfg.rope_theta, llama3)
        k = apply_rope(k, positions, cfg.rope_theta, llama3)
    return q, k, v


def _alibi(cfg: Qwen2Config) -> int:
    """`alibi` argument for ops.attention.mha: bias_max for the MPT family,
    0 (disabled) for the rope families."""
    return cfg.alibi_bias_max if cfg.pos_embedding == "alibi" else 0


def decode_kernel_eligible(
    cfg: Qwen2Config, cache_max_len: int, attn_impl: str
) -> bool:
    """Can the stacked-cache Pallas decode kernels serve this config?

    Single source of truth for BOTH the `_block_cached` dispatch below and
    the engine's `kernel_provenance` telemetry — keeping them one predicate
    means provenance can never silently mis-report the kernel path when the
    dispatch conditions change (the invisible-fallback failure mode the
    telemetry exists to catch)."""
    return (
        attn_impl in ("auto", "flash")
        and cache_max_len % 128 == 0
        and cfg.head_dim % 64 == 0
        and cfg.sliding_window == 0  # decode kernels have no window mask
        and cfg.pos_embedding == "rope"  # ...nor ALiBi bias
        and jax.default_backend() == "tpu"
    )


def _moe_mlp(cfg: Qwen2Config, moe: Params, y: jnp.ndarray, mm, take):
    """Sparse MoE block (HF `Qwen2MoeSparseMoeBlock` / `MixtralSparseMoeBlock`
    semantics): softmax router over `num_experts`, top-k per token (optionally
    renormalized — Mixtral always renormalizes), sparse expert SwiGLUs, plus —
    for Qwen2-MoE only — an always-on shared expert scaled by a sigmoid gate.
    Returns (out [b, s, d], aux_loss scalar).

    Two compute modes (cfg.moe_capacity_factor):
    - 0 (exact): every expert processes every token, combined with the sparse
      top-k weights — bitwise the reference's per-expert loop, used for
      parity/eval and tiny decode batches;
    - >0 (capacity): GShard-style static dispatch — top-k assignments ranked
      rank-major, positions by running count per expert, tokens past capacity
      C = ceil(T*k/E * factor) dropped. All shapes static; the expert
      dimension shards over the mesh's `expert` axis (sharding rules map the
      [L, E, d, m] tables to P(None, "expert", ...) and XLA inserts the
      dispatch/combine all-to-alls).

    Aux = Switch/GShard load-balancing loss E * sum_e f_e * P_e over the
    top-k assignment fractions f and mean router probs P."""
    b, s, d = y.shape
    t = b * s
    x = y.reshape(t, d)
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = mm(y, moe["router"]["kernel"]).reshape(t, e)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(probs, k)  # [T, k]
    if cfg.norm_topk_prob:
        vals = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-20)
    vals = vals.astype(x.dtype)
    wg = take(moe["experts"]["gate"])  # [E, d, m]
    wu = take(moe["experts"]["up"])
    wd = take(moe["experts"]["down"])  # [E, m, d]

    oh = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # [T, k, E]
    if cfg.moe_capacity_factor <= 0:
        h = jnp.einsum("td,edm->tem", x, wg)
        u = jnp.einsum("td,edm->tem", x, wu)
        eo = jnp.einsum("tem,emd->ted", jax.nn.silu(h) * u, wd)
        w_te = jnp.einsum("tke,tk->te", oh.astype(vals.dtype), vals)
        out = jnp.einsum("ted,te->td", eo, w_te)
    else:
        import math as _math

        cap = max(1, int(_math.ceil(t * k / e * cfg.moe_capacity_factor)))
        # rank-major priority: all rank-0 picks first, then rank-1, ...
        ohm = oh.transpose(1, 0, 2).reshape(k * t, e)
        before = jnp.cumsum(ohm, axis=0) - ohm
        my_pos = (
            jnp.sum(before * ohm, axis=-1).reshape(k, t).T.astype(jnp.int32)
        )  # [T, k]
        keep = (my_pos < cap).astype(x.dtype)
        pos_oh = jax.nn.one_hot(my_pos, cap, dtype=x.dtype)  # [T, k, C]
        # [T, E, C] dispatch/combine tensors
        disp = jnp.einsum(
            "tke,tkc,tk->tec", oh.astype(x.dtype), pos_oh, keep
        )
        comb = jnp.einsum(
            "tke,tkc,tk->tec", oh.astype(x.dtype), pos_oh, keep * vals
        )
        xe = jnp.einsum("tec,td->ecd", disp, x)
        h = jnp.einsum("ecd,edm->ecm", xe, wg)
        u = jnp.einsum("ecd,edm->ecm", xe, wu)
        eo = jnp.einsum("ecm,emd->ecd", jax.nn.silu(h) * u, wd)
        out = jnp.einsum("tec,ecd->td", comb, eo)

    # shared expert with sigmoid gate (Qwen2-MoE only; Mixtral has none —
    # HF `MixtralSparseMoeBlock` is router + experts alone)
    if "shared" in moe:
        sh = jax.nn.silu(mm(y, moe["shared"]["gate"]["kernel"])) * mm(
            y, moe["shared"]["up"]["kernel"]
        )
        sh = mm(sh, moe["shared"]["down"]["kernel"]).reshape(t, d)
        sgate = jax.nn.sigmoid(
            mm(y, moe["shared_gate"]["kernel"]).reshape(t, 1).astype(jnp.float32)
        ).astype(x.dtype)
        out = out + sgate * sh

    # Switch/GShard load-balancing aux: f_e = fraction of tokens picking
    # expert e (any rank), P_e = mean router prob; loss = E * sum f_e P_e.
    aux = (e * jnp.sum(probs.mean(0) * oh.sum(1).mean(0))).astype(jnp.float32)
    return out.reshape(b, s, d), aux


def _finish_block(cfg: Qwen2Config, lp: Params, res: jnp.ndarray,
                  attn: jnp.ndarray, idx=None, with_aux: bool = False):
    # Under the inference tensor-parallel context (parallel/tp.py, set inside
    # the serving engine's shard_map bodies) the o/down kernels are
    # row-parallel: their matmul outputs are partial sums, all-reduced here —
    # the only two collectives per decoder block. Outside the context
    # maybe_psum is the identity.
    from radvlm_tpu.parallel.tp import maybe_psum

    mm, take = _mm_take(idx)
    b, s = attn.shape[:2]
    x = res + maybe_psum(mm(attn.reshape(b, s, -1), lp["attn"]["o"]["kernel"]))
    res = x
    y = _norm(cfg, x, take(lp["ln2"]))
    mlp = lp["mlp"]
    if "moe" in mlp:
        out, aux = _moe_mlp(cfg, mlp["moe"], y, mm, take)
        out = res + out
        return (out, aux) if with_aux else out
    if not cfg.mlp_gated:  # MPT ffn: up -> act -> down, no gate branch
        hidden = _act(cfg, mm(y, mlp["up"]["kernel"]))
        out = res + maybe_psum(mm(hidden, mlp["down"]["kernel"]))
        return (out, jnp.float32(0.0)) if with_aux else out
    if "gateup" in mlp:
        gu = mm(y, mlp["gateup"]["kernel"])
        gate, up = jnp.split(gu, 2, axis=-1)
        gate = _act(cfg, gate)
    else:
        gate = _act(cfg, mm(y, mlp["gate"]["kernel"]))
        up = mm(y, mlp["up"]["kernel"])
    out = res + maybe_psum(mm(gate * up, mlp["down"]["kernel"]))
    return (out, jnp.float32(0.0)) if with_aux else out


def _block(
    cfg: Qwen2Config,
    lp: Params,
    x: jnp.ndarray,
    positions: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    attn_impl: str,
    collect_kv: bool = False,
    with_aux: bool = False,
):
    """One decoder block, no cache. x:[B,S,D]. With collect_kv, also returns the
    roped (k, v) as flat [B, S, Hkv*D] pairs — scan stacks them into a ready KV
    cache with zero copies (the prefill fast path: carrying a preallocated cache
    through the scan measured 2.6x slower from per-layer buffer copies).
    With with_aux, also returns the MoE router aux loss (0.0 for dense).

    Quantized kernels pass through to `quant.qmm` at each matmul site (dequant
    happens per-matmul in the dense path or in-VMEM in the int8 kernel)."""
    res = x
    y = _norm(cfg, x, lp["ln1"])
    q, k, v = _qkv(cfg, lp, y, positions)
    attn = mha(
        q, k, v,
        q_segment_ids=segment_ids,
        kv_segment_ids=segment_ids,
        causal=True,
        impl=attn_impl,
        window=cfg.sliding_window,
        alibi=_alibi(cfg),
    )
    out = _finish_block(cfg, lp, res, attn, with_aux=with_aux)
    aux = None
    if with_aux:
        out, aux = out
    ys = None
    if collect_kv:
        b, s = x.shape[:2]
        hkv_d = cfg.num_kv_heads * cfg.head_dim
        ys = (
            k.reshape(b, s, hkv_d).astype(jnp.bfloat16),
            v.reshape(b, s, hkv_d).astype(jnp.bfloat16),
        )
    if collect_kv and with_aux:
        return out, (ys, aux)
    if collect_kv:
        return out, ys
    if with_aux:
        return out, aux
    return out


def _block_cached(
    cfg: Qwen2Config,
    layers: Params,  # FULL stacked layer tree (scan closes over it)
    layer_idx: jnp.ndarray,
    x: jnp.ndarray,
    cache: Tuple[jnp.ndarray, ...],  # (ck, cv) bf16 or (ck, cv, ks, vs) int8
    positions: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    cache_index,
    cache_segment_ids: jnp.ndarray,
    attn_impl: str,
):
    """One decoder block writing/reading the stacked KV cache in place.

    The cache rides in the scan *carry* and only the new tokens' [B,s,Hkv*D]
    slice is written per layer — a per-step decode touches O(s) cache bytes for
    writes instead of restacking the whole [L,...] cache (which the naive
    scan-over-(params, cache) formulation does, costing a full read+write of the
    cache every decode step). Layout [.., S, Hkv*D]: heads fold into the minor
    dim so cache writes are reshape-free and the decode kernel's DMAs are fully
    contiguous (see ops/decode_attention.py).

    The body receives the FULL stacked layer weights plus `layer_idx` (not a
    per-layer slice): quantized matmuls dispatch to the stacked-int8 Pallas
    kernel, which scalar-prefetches the index into its BlockSpec maps and DMAs
    exactly one layer's int8 bytes — no dynamic-slice copy, no bf16 dequant
    round trip through HBM. Small leaves (norms, biases) slice on the fly.

    int8 KV mode (4-tuple cache: int8 k/v + per-(token, kv-head) scales
    [L, B, Hkv, Smax]): writes quantize the new row (`ops/kv_quant`), reads
    hit the q8 decode kernel with dequant folded into the score/PV math —
    the cache never exists in bf16 (halved HBM stream + residency).
    """
    if attn_impl == "ring":
        attn_impl = "auto"  # ring applies to training prefill, not cached decode
    quantized = len(cache) == 4
    if quantized:
        ck_all, cv_all, ks_all, vs_all = cache
    else:
        ck_all, cv_all = cache
    res = x
    y = _norm(cfg, x, _take(layers["ln1"], layer_idx))
    q, k, v = _qkv(cfg, layers, y, positions, idx=layer_idx)
    b, s = x.shape[:2]
    hkv, hd = cfg.num_kv_heads, cfg.head_dim
    kv_el = jnp.bfloat16 if quantized else ck_all.dtype
    k_flat = k.reshape(b, s, hkv * hd).astype(kv_el)
    v_flat = v.reshape(b, s, hkv * hd).astype(kv_el)

    from radvlm_tpu.parallel import sp_decode as spd

    sp_ctx = spd.context()
    if sp_ctx is not None and s == 1:
        if cfg.pos_embedding != "rope":
            raise NotImplementedError(
                "sequence-parallel decode has no ALiBi bias support"
            )
        # Sequence-parallel decode: `ck_all`/`cv_all` are this shard's LOCAL
        # cache block (running under shard_map over the seq axis). Write the
        # new K/V on the owning shard only, then merge per-shard partial
        # attention with the distributed flash-decoding lse combine.
        _, axis_name = sp_ctx
        s_local = ck_all.shape[2]
        shard = jax.lax.axis_index(axis_name)
        global_idx = jnp.asarray(cache_index)
        if global_idx.ndim == 0:
            global_idx = jnp.broadcast_to(global_idx, (b,))
        local_idx = global_idx.astype(jnp.int32) - shard * s_local
        in_range = (local_idx >= 0) & (local_idx < s_local)
        rows = jnp.arange(b)
        if quantized:
            # int8 KV x SP decode: the capacity win of the int8 cache is
            # exactly what long-context SP serving exists for. The new row
            # quantizes on the owning shard; the LOCAL block (1/n of the
            # sequence) dequantizes in-register for the partial attention —
            # the same per-step dequant the single-device XLA fallback does,
            # on an n-times smaller block.
            from radvlm_tpu.ops.kv_quant import dequantize_kv, quantize_kv_row

            kq, ksc = quantize_kv_row(k_flat[:, 0], hkv)
            vq, vsc = quantize_kv_row(v_flat[:, 0], hkv)
            ck_all = spd.local_write(
                ck_all, layer_idx, rows, local_idx, in_range, kq
            )
            cv_all = spd.local_write(
                cv_all, layer_idx, rows, local_idx, in_range, vq
            )
            ks_all = spd.local_write_scale(
                ks_all, layer_idx, rows, local_idx, in_range, ksc
            )
            vs_all = spd.local_write_scale(
                vs_all, layer_idx, rows, local_idx, in_range, vsc
            )
            ck_i = jax.lax.dynamic_index_in_dim(ck_all, layer_idx, 0, keepdims=False)
            cv_i = jax.lax.dynamic_index_in_dim(cv_all, layer_idx, 0, keepdims=False)
            ks_i = jax.lax.dynamic_index_in_dim(ks_all, layer_idx, 0, keepdims=False)
            vs_i = jax.lax.dynamic_index_in_dim(vs_all, layer_idx, 0, keepdims=False)
            attn = spd.cached_attention_merge(
                q,
                dequantize_kv(ck_i, ks_i, hkv),
                dequantize_kv(cv_i, vs_i, hkv),
                cache_segment_ids,
                num_kv_heads=hkv, axis_name=axis_name,
            )
            return (
                _finish_block(cfg, layers, res, attn, idx=layer_idx),
                (ck_all, cv_all, ks_all, vs_all),
            )
        ck_all = spd.local_write(
            ck_all, layer_idx, rows, local_idx, in_range, k_flat[:, 0]
        )
        cv_all = spd.local_write(
            cv_all, layer_idx, rows, local_idx, in_range, v_flat[:, 0]
        )
        ck_i = jax.lax.dynamic_index_in_dim(ck_all, layer_idx, 0, keepdims=False)
        cv_i = jax.lax.dynamic_index_in_dim(cv_all, layer_idx, 0, keepdims=False)
        attn = spd.cached_attention_merge(
            q, ck_i, cv_i, cache_segment_ids,
            num_kv_heads=hkv, axis_name=axis_name,
        )
        return _finish_block(cfg, layers, res, attn, idx=layer_idx), (ck_all, cv_all)

    if sp_ctx is not None and s > 1:
        raise NotImplementedError(
            "multi-token cached decode (speculative verify) is not wired for "
            "sequence-parallel decode — the cache here is a LOCAL seq shard"
        )
    per_row = getattr(cache_index, "ndim", 0) == 1
    if per_row and s > 1:
        # Speculative-decoding verify window (generation/spec.py): each slot
        # writes s = spec_k+1 candidate tokens at its own cache offset. The
        # scatter covers [idx, idx+s) per row; positions past the accepted
        # prefix hold stale K/V until the NEXT window — which always starts at
        # idx+acc+1 <= idx+s and spans s positions, so it fully overwrites
        # them before any query can attend at-or-beyond their cache index
        # (the causal mask keys on cache index via per-row q_offset below).
        rows = jnp.arange(b)[:, None]  # [B, 1]
        idxw = cache_index[:, None] + jnp.arange(s)[None]  # [B, s]
        if quantized:
            from radvlm_tpu.ops.kv_quant import quantize_kv

            kq, ksc = quantize_kv(k_flat, hkv)  # scales [B, Hkv, s]
            vq, vsc = quantize_kv(v_flat, hkv)
            ck_all = ck_all.at[layer_idx, rows, idxw].set(kq)
            cv_all = cv_all.at[layer_idx, rows, idxw].set(vq)
            # Scales layout [L, B, Hkv, S]: the slice between the advanced
            # indices moves the advanced block to the front -> values [B, s, Hkv].
            ks_all = ks_all.at[layer_idx, rows, :, idxw].set(
                jnp.moveaxis(ksc, 1, 2)
            )
            vs_all = vs_all.at[layer_idx, rows, :, idxw].set(
                jnp.moveaxis(vsc, 1, 2)
            )
        else:
            ck_all = ck_all.at[layer_idx, rows, idxw].set(k_flat)
            cv_all = cv_all.at[layer_idx, rows, idxw].set(v_flat)
    elif per_row:
        # Continuous batching: each slot decodes at its own cache position —
        # scatter one row per slot (s == 1).
        rows = jnp.arange(b)
        if quantized:
            from radvlm_tpu.ops.kv_quant import quantize_kv_row

            kq, ksc = quantize_kv_row(k_flat[:, 0], hkv)
            vq, vsc = quantize_kv_row(v_flat[:, 0], hkv)
            ck_all = ck_all.at[layer_idx, rows, cache_index].set(
                kq, unique_indices=True
            )
            cv_all = cv_all.at[layer_idx, rows, cache_index].set(
                vq, unique_indices=True
            )
            ks_all = ks_all.at[layer_idx, rows, :, cache_index].set(
                ksc, unique_indices=True
            )
            vs_all = vs_all.at[layer_idx, rows, :, cache_index].set(
                vsc, unique_indices=True
            )
        else:
            ck_all = ck_all.at[layer_idx, rows, cache_index].set(
                k_flat[:, 0], unique_indices=True
            )
            cv_all = cv_all.at[layer_idx, rows, cache_index].set(
                v_flat[:, 0], unique_indices=True
            )
    else:
        if quantized:
            from radvlm_tpu.ops.kv_quant import quantize_kv

            kq, ksc = quantize_kv(k_flat, hkv)
            vq, vsc = quantize_kv(v_flat, hkv)
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, kq[None], (layer_idx, 0, cache_index, 0)
            )
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, vq[None], (layer_idx, 0, cache_index, 0)
            )
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, ksc[None], (layer_idx, 0, 0, cache_index)
            )
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, vsc[None], (layer_idx, 0, 0, cache_index)
            )
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k_flat[None], (layer_idx, 0, cache_index, 0)
            )
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v_flat[None], (layer_idx, 0, cache_index, 0)
            )
    smax = ck_all.shape[2]
    if s == 1 and decode_kernel_eligible(cfg, smax, attn_impl):
        # Decode hot path: Pallas kernel indexes the stacked cache directly via
        # scalar-prefetched layer index — zero slice materialization.
        if quantized:
            from radvlm_tpu.ops.decode_attention import decode_attention_stacked_q8

            attn = decode_attention_stacked_q8(
                q[:, 0], ck_all, cv_all, ks_all, vs_all, cache_segment_ids,
                layer_idx, num_kv_heads=hkv,
            )[:, None]
        else:
            from radvlm_tpu.ops.decode_attention import decode_attention_stacked

            attn = decode_attention_stacked(
                q[:, 0], ck_all, cv_all, cache_segment_ids, layer_idx,
                num_kv_heads=hkv,
            )[:, None]
    elif per_row and 1 < s <= 16 and decode_kernel_eligible(cfg, smax, attn_impl):
        # Speculative verify window: W = spec_k+1 queries per slot at cache
        # offset `cache_index` (per row). The windowed kernel streams the
        # cache ONCE per step like single-token decode — the XLA fallback
        # below dequantizes the whole int8 cache per layer per step, which
        # measured 29 s vs 3.6 s unloaded p50 at 7B on v5e (2026-08-19).
        if quantized:
            from radvlm_tpu.ops.decode_attention import (
                decode_attention_stacked_window_q8,
            )

            attn = decode_attention_stacked_window_q8(
                q, ck_all, cv_all, ks_all, vs_all, cache_segment_ids,
                layer_idx, cache_index, num_kv_heads=hkv,
            )
        else:
            from radvlm_tpu.ops.decode_attention import (
                decode_attention_stacked_window,
            )

            attn = decode_attention_stacked_window(
                q, ck_all, cv_all, cache_segment_ids,
                layer_idx, cache_index, num_kv_heads=hkv,
            )
    else:
        ck_i = jax.lax.dynamic_index_in_dim(ck_all, layer_idx, 0, keepdims=False)
        cv_i = jax.lax.dynamic_index_in_dim(cv_all, layer_idx, 0, keepdims=False)
        if quantized:
            from radvlm_tpu.ops.kv_quant import dequantize_kv

            ks_i = jax.lax.dynamic_index_in_dim(ks_all, layer_idx, 0, keepdims=False)
            vs_i = jax.lax.dynamic_index_in_dim(vs_all, layer_idx, 0, keepdims=False)
            ck_i = dequantize_kv(ck_i, ks_i, hkv)
            cv_i = dequantize_kv(cv_i, vs_i, hkv)
        attn = mha(
            q,
            ck_i.reshape(b, smax, hkv, hd),
            cv_i.reshape(b, smax, hkv, hd),
            q_segment_ids=segment_ids,
            kv_segment_ids=cache_segment_ids,
            causal=True,
            q_offset=0 if isinstance(cache_index, int) and cache_index == 0
            else cache_index,
            impl=attn_impl,
            window=cfg.sliding_window,
            alibi=_alibi(cfg),
        )
    new_cache = (
        (ck_all, cv_all, ks_all, vs_all) if quantized else (ck_all, cv_all)
    )
    return _finish_block(cfg, layers, res, attn, idx=layer_idx), new_cache


def embed_tokens(
    params: Params, input_ids: jnp.ndarray, cfg: Optional[Qwen2Config] = None
) -> jnp.ndarray:
    from radvlm_tpu.ops.quant import Q_KEY, SCALE_KEY, is_qnode

    emb = params["embed"]["embedding"]
    if is_qnode(emb):
        # int8 embedding: gather rows + per-row scales, dequant only the gather.
        rows = jnp.take(emb[Q_KEY], input_ids, axis=0).astype(jnp.float32)
        scales = jnp.take(emb[SCALE_KEY][:, 0], input_ids, axis=0)
        out = (rows * scales[..., None]).astype(params["norm"].dtype)
    else:
        out = jnp.take(emb, input_ids, axis=0)
    if cfg is not None and cfg.embed_normalizer:
        # Gemma: hidden states scaled by sqrt(hidden_size); HF rounds the
        # normalizer to the embedding dtype before multiplying.
        out = out * jnp.asarray(cfg.hidden_size ** 0.5, out.dtype)
    return out


def forward(
    params: Params,
    cfg: Qwen2Config,
    *,
    input_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    cache_index: Optional[jnp.ndarray] = None,
    cache_segment_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    return_hidden: bool = False,
    collect_kv: bool = False,
    return_aux: bool = False,
):
    """Run the decoder stack.

    input_embeds: [B, S, D] (callers embed tokens or splice image embeddings first —
    mirrors the reference's `inputs_embeds` path, `llava_qwen.py:103-114`).
    kv_cache: stacked (k, v) each [L, B, Smax, Hkv, D]; cache_index: scalar write
    offset; cache_segment_ids: [B, Smax] segment ids of cache contents (callers keep
    them updated).

    Returns (logits_or_hidden [B,S,V|D], new_kv_cache or None); with
    return_aux (training, no-cache path only) additionally the mean per-layer
    MoE router load-balancing loss as a third element.
    """
    if return_aux and kv_cache is not None:
        raise ValueError("return_aux is a training-path (no-cache) feature")
    x = input_embeds
    layer_params = params["layers"]

    if kv_cache is not None:
        def body_cached(carry, i):
            x, cache = carry[0], carry[1:]
            x, cache = _block_cached(
                cfg, layer_params, i, x, cache, positions, segment_ids,
                cache_index, cache_segment_ids, attn_impl,
            )
            return (x, *cache), None

        if remat:
            body_cached = jax.checkpoint(
                body_cached, policy=jax.checkpoint_policies.nothing_saveable
            )
        carry, _ = jax.lax.scan(
            body_cached,
            (x, *tuple(kv_cache)),
            jnp.arange(cfg.num_layers),
        )
        x, new_cache = carry[0], tuple(carry[1:])
    else:
        def body_nocache(carry, lp):
            out = _block(
                cfg, lp, carry, positions, segment_ids, attn_impl,
                collect_kv=collect_kv, with_aux=return_aux,
            )
            if collect_kv or return_aux:
                return out
            return out, None

        if remat:
            body_nocache = jax.checkpoint(
                body_nocache, policy=jax.checkpoint_policies.nothing_saveable
            )
        x, collected = jax.lax.scan(body_nocache, x, layer_params)
        aux = None
        if collect_kv and return_aux:
            new_cache, aux = collected
        elif collect_kv:
            new_cache = collected
        elif return_aux:
            new_cache, aux = None, collected
        else:
            new_cache = None

    x = _norm(cfg, x, params["norm"])
    out = x if return_hidden else unembed(params, cfg, x)
    if return_aux:
        return out, new_cache, jnp.mean(aux)
    return out, new_cache


def unembed(params: Params, cfg: Qwen2Config, hidden: jnp.ndarray) -> jnp.ndarray:
    from radvlm_tpu.ops.quant import is_qnode, maybe_dequant, qmm

    if cfg.tie_word_embeddings:
        emb = params["embed"]["embedding"]
        if is_qnode(emb):
            # Tied embeddings need the transpose; scales are per ROW of the
            # embedding (= per vocab column of the matmul), so the Pallas kernel
            # layout doesn't apply — dequant-transpose instead.
            return hidden @ maybe_dequant(emb, hidden.dtype).T
        return hidden @ emb.T
    # Logits keep weight-only precision (w8a8's per-token activation noise can
    # flip near-tie argmax; every other matmul's error washes through norms).
    return qmm(hidden, params["lm_head"]["kernel"], w8a8=False)


def init_kv_cache(
    cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stacked KV cache, layout [L, B, Smax, Hkv*D]: kv heads folded into the
    minor dim so writes are reshape-free and the Pallas decode kernel's DMAs are
    fully contiguous lane-aligned tiles."""
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads * cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def init_kv_cache_q8(
    cfg: Qwen2Config, batch: int, max_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """int8 KV cache: (k, v) int8 [L, B, Smax, Hkv*D] + per-(token, kv-head)
    scales [L, B, Hkv, Smax] f32 (S minor: lane-aligned scale tiles for the
    q8 decode kernel, `ops/kv_quant.py`). Halves cache residency + decode
    attention HBM traffic vs bf16 — 2x the decode slots on a 16 GB chip."""
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads * cfg.head_dim)
    sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len)
    return (
        jnp.zeros(shape, jnp.int8),
        jnp.zeros(shape, jnp.int8),
        jnp.zeros(sshape, jnp.float32),
        jnp.zeros(sshape, jnp.float32),
    )
