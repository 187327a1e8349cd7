"""Autoregressive generation engine (TPU-native decode loop).

Rebuild of the reference's generation path (`finetuning/llava/model/language_model/
llava_qwen.py:116-135` -> HF `generate` with KV cache): here prefill and decode are
two jitted functions over a preallocated static-shape KV cache, and the full decode
loop runs on-device inside `jax.lax.while_loop` (no per-token host round trip).

Batching convention: prompts are LEFT-padded (multimodal.collate(left_pad=True)),
so every row's last prompt token sits at index L-1 and decode writes at uniform
cache index L+step while rotary positions stay per-sample (lengths[i]+step).

Sampling: greedy / temperature / top-k / top-p, all compiled (sort-based top-p).
Stop handling: eos-id set checked in-loop; stop *strings* are trimmed host-side by
callers (the reference's KeywordsStoppingCriteria, `mm_utils.py:372-395`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from radvlm_tpu.config import RadVLMConfig
from radvlm_tpu.models import qwen2, radvlm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    eos_token_ids: Tuple[int, ...] = ()
    pad_token_id: int = 0
    temperature: float = 0.0  # 0 -> greedy
    top_k: int = 0  # 0 -> disabled
    top_p: float = 1.0  # 1 -> disabled


def sample_token_vec(
    logits: jnp.ndarray,
    temperature: jnp.ndarray,  # [B] f32; <=0 -> greedy for that row
    top_p: jnp.ndarray,  # [B] f32; >=1 -> disabled for that row
    rng: jax.Array,
    *,
    top_k: int = 0,  # scalar (shape-static); 0 -> disabled
) -> jnp.ndarray:
    """Per-ROW temperature/top-p sampling for the continuous engine: each
    slot serves a different request with its own sampling params (the
    threaded worker honors per-request temperature/top_p; the shared-batch
    engine must too)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    l = logits.astype(jnp.float32) / t
    if top_k > 0:
        kth = jax.lax.top_k(l, top_k)[0][:, -1:]
        l = jnp.where(l < kth, -jnp.inf, l)
    p = jnp.maximum(top_p, 1e-6)[:, None]
    sorted_logits = jnp.sort(l, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < p  # first token always kept (0 < p)
    threshold = jnp.min(
        jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    l = jnp.where(l < threshold, -jnp.inf, l)
    sampled = jax.random.categorical(rng, l, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def sample_token(
    logits: jnp.ndarray, gen: GenerationConfig, rng: jax.Array
) -> jnp.ndarray:
    """logits [B, V] -> token ids [B]."""
    if gen.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / gen.temperature
    if gen.top_k > 0:
        kth = jax.lax.top_k(logits, gen.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest set of tokens with cumulative prob >= top_p.
        keep = cum - probs < gen.top_p
        threshold = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def prefill(
    params: Params,
    cfg: RadVLMConfig,
    batch: Dict[str, jnp.ndarray],
    max_len: int,
    *,
    attn_impl: str = "auto",
    cache_dtype=jnp.bfloat16,
    cache_format: str = "bf16",
):
    """Encode images + run the prompt through the decoder, filling the KV cache.

    batch: left-padded collate() output with padded length L <= max_len.
    Returns (cache, cache_segment_ids [B, max_len], last_logits [B, V]).
    cache_format="int8": the returned cache is the 4-tuple int8 layout
    (k, v int8 + per-(token, kv-head) scales, `ops/kv_quant.py`) — prompt K/V
    are quantized once here, in the same jit as the prefill.
    """
    b, l = batch["tokens"].shape
    seg = batch["segment_ids"]
    cache_seg = jnp.concatenate(
        [seg, jnp.zeros((b, max_len - l), seg.dtype)], axis=1
    )
    # Prefill runs CACHE-LESS with collect_kv: the per-layer roped K/V come back
    # as scan outputs, already stacked [L, B, l, Hkv*D] — one splice into the
    # preallocated decode cache. (Carrying the cache through the layer scan
    # measured 2.6x slower — per-layer whole-buffer copies.) The last-position
    # unembed avoids the [B, L, vocab] logits tensor (10 GB at 7B shapes).
    hidden, (ks, vs) = radvlm.forward(
        params,
        cfg,
        batch,
        attn_impl=attn_impl,
        return_hidden=True,
        collect_kv=True,
    )
    if cache_format == "int8":
        from radvlm_tpu.ops.kv_quant import quantize_kv

        hkv = cfg.text.num_kv_heads
        kq, ksc = quantize_kv(ks, hkv)
        vq, vsc = quantize_kv(vs, hkv)
        ck, cv, kscale, vscale = qwen2.init_kv_cache_q8(cfg.text, b, max_len)
        cache = (
            jax.lax.dynamic_update_slice(ck, kq, (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cv, vq, (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(kscale, ksc, (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(vscale, vsc, (0, 0, 0, 0)),
        )
    else:
        ck, cv = qwen2.init_kv_cache(cfg.text, b, max_len, cache_dtype)
        cache = (
            jax.lax.dynamic_update_slice(ck, ks.astype(ck.dtype), (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cv, vs.astype(cv.dtype), (0, 0, 0, 0)),
        )
    logits = qwen2.unembed(params["text"], cfg.text, hidden[:, l - 1])
    return cache, cache_seg, logits


def make_sp_prefill_fn(
    cfg: RadVLMConfig,
    mesh,
    *,
    axis_name: str = "seq",
    local_impl: str = "flash",
):
    """Sequence-parallel prefill: ring attention over the mesh's `seq` axis.

    Long-context generation support (the reference's dormant ring attention,
    `modeling_llama.py:385-563`, covers only training; here prefill shards the
    padded prompt across the seq axis so a 16k+ multimodal prompt's O(S^2)
    attention and O(S) projections split across chips, while the KV cache and
    last-token logits come back replicated for the normal decode loop).

    Returns prefill_fn(params, batch, max_len static) -> (cache, cache_seg,
    last_logits) — same contract as `prefill`. The padded prompt length must
    be divisible by the seq-axis size. Uses the contiguous ring schedule
    (natural token order — no zigzag pre-permutation, prefill runs once so
    the diagonal imbalance is irrelevant next to the decode loop).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radvlm_tpu.parallel.ring import enable_ring_attention

    seq_sharded = NamedSharding(mesh, P(None, axis_name))
    replicated = NamedSharding(mesh, P())

    def in_shard(batch):
        return {
            k: seq_sharded
            if k in ("tokens", "img_src", "positions", "segment_ids")
            else replicated
            for k in batch
        }

    @functools.partial(jax.jit, static_argnames=("max_len",))
    def _pf(params, batch, max_len: int):
        return prefill(params, cfg, batch, max_len, attn_impl="ring")

    def prefill_fn(params, batch, max_len: int):
        # Save/restore the process-global ring context: a mid-training eval
        # pass must not clobber the trainer's registered zigzag schedule
        # (code-review finding).
        import radvlm_tpu.parallel.ring as ring_mod

        prev = ring_mod._RING_CONTEXT
        enable_ring_attention(
            mesh, axis_name=axis_name, impl=local_impl, schedule="contiguous"
        )
        try:
            b, l = batch["tokens"].shape
            n_seq = mesh.shape[axis_name]
            if l % n_seq:
                raise ValueError(
                    f"padded prompt length {l} not divisible by seq axis {n_seq}"
                )
            batch = jax.device_put(batch, in_shard(batch))
            return _pf(params, batch, max_len)
        finally:
            ring_mod._RING_CONTEXT = prev

    return prefill_fn


def make_sp_generate_fn(
    cfg: RadVLMConfig,
    mesh,
    gen: "GenerationConfig",
    *,
    axis_name: str = "seq",
    local_impl: str = "flash",
    kv_quant: bool = False,
):
    """Fully sequence-parallel generation for long multimodal contexts:
    ring-attention prefill (`make_sp_prefill_fn`) + cache-sharded decode
    (`parallel.sp_decode.make_sp_decode_step`). The KV cache never exists
    unsharded — at 32k context and 7B it is ~1.9 GB/sequence, so sharding it
    across the seq axis is what lets long-context batches fit a slice.

    Returns generate(params, batch, rng) -> {"tokens": [B, max_new],
    "num_tokens": [B]} matching `make_generate_fn`'s contract (left-padded
    prompts)."""
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    from radvlm_tpu.parallel.sp_decode import make_sp_decode_step

    sp_prefill = make_sp_prefill_fn(cfg, mesh, axis_name=axis_name,
                                    local_impl=local_impl)
    sp_step = make_sp_decode_step(cfg.text, mesh, axis_name=axis_name,
                                  kv_quant=kv_quant)
    cache_spec = NamedSharding(mesh, P(None, None, axis_name, None))
    scale_spec = NamedSharding(mesh, P(None, None, None, axis_name))
    seg_spec = NamedSharding(mesh, P(None, axis_name))
    n_seq = mesh.shape[axis_name]

    def generate(params, batch, rng):
        b, l = batch["tokens"].shape
        max_len = l + gen.max_new_tokens
        if max_len % n_seq:
            max_len += n_seq - max_len % n_seq
        cache, cache_seg, logits = sp_prefill(params, batch, max_len)
        if kv_quant:
            # Quantize the prompt K/V once (same contract as
            # `prefill(cache_format="int8")`), then shard int8 planes over
            # seq and scale planes over their token axis.
            from radvlm_tpu.ops.kv_quant import quantize_kv

            hkv = cfg.text.num_kv_heads
            kq, ksc = quantize_kv(cache[0], hkv)
            vq, vsc = quantize_kv(cache[1], hkv)
            cache = (
                jax.device_put(kq, cache_spec),
                jax.device_put(vq, cache_spec),
                jax.device_put(ksc, scale_spec),
                jax.device_put(vsc, scale_spec),
            )
        else:
            cache = tuple(jax.device_put(c, cache_spec) for c in cache)
        cache_seg = jax.device_put(cache_seg, seg_spec)
        lengths = batch["lengths"]
        rng, sub = jax.random.split(rng)
        tok = sample_token(logits, gen, sub)
        out_toks = [tok]
        num = np.full((b,), gen.max_new_tokens, np.int32)
        done = np.zeros((b,), bool)
        eos = np.asarray(list(gen.eos_token_ids), np.int32)
        for step in range(gen.max_new_tokens - 1):
            th = np.asarray(tok)
            newly = ~done & np.isin(th, eos)
            num[newly] = step + 1
            done |= newly
            if done.all():
                break
            cache, cache_seg, lg = sp_step(
                params["text"], cache, cache_seg, tok, lengths + step,
                l + step,
            )
            rng, sub = jax.random.split(rng)
            tok = sample_token(lg, gen, sub)
            out_toks.append(tok)
        toks = jnp.stack(out_toks, axis=1)
        pad = gen.max_new_tokens - toks.shape[1]
        pad_id = gen.pad_token_id or 0
        if pad:
            toks = jnp.pad(toks, ((0, 0), (0, pad)), constant_values=pad_id)
        # Positions past each row's emitted count hold garbage sampled tokens
        # (rows that hit eos early keep decoding until the batch breaks);
        # replace with pad so consumers masking by pad_token_id match
        # `make_generate_fn`'s contract.
        mask = jnp.arange(gen.max_new_tokens)[None, :] < jnp.asarray(num)[:, None]
        toks = jnp.where(mask, toks, pad_id)
        return {"tokens": toks, "num_tokens": jnp.asarray(num)}

    return generate


def decode_step(
    params: Params,
    cfg: RadVLMConfig,
    cache,
    cache_seg: jnp.ndarray,
    tok: jnp.ndarray,
    positions: jnp.ndarray,
    write_idx,
    *,
    attn_impl: str = "auto",
):
    """One decode step. tok [B], positions [B] (rope positions), write_idx scalar.

    Returns (cache, cache_seg, logits [B, V]).
    """
    b = tok.shape[0]
    cache_seg = jax.lax.dynamic_update_slice(
        cache_seg, jnp.ones((b, 1), cache_seg.dtype), (0, write_idx)
    )
    embeds = qwen2.embed_tokens(params["text"], tok[:, None], cfg.text)
    logits, cache = qwen2.forward(
        params["text"],
        cfg.text,
        input_embeds=embeds,
        positions=positions[:, None],
        segment_ids=jnp.ones((b, 1), jnp.int32),
        kv_cache=cache,
        cache_index=write_idx,
        cache_segment_ids=cache_seg,
        attn_impl=attn_impl,
    )
    return cache, cache_seg, logits[:, 0]


def _generate_impl(
    params: Params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    cfg: RadVLMConfig,
    gen: GenerationConfig,
    attn_impl: str,
) -> Dict[str, jnp.ndarray]:
    b, l = batch["tokens"].shape
    # Cache length rounded to a 128 multiple: the Pallas flash-prefill and
    # decode kernels require lane-aligned Smax (extra tail slots are never
    # attendable — their segment ids stay 0).
    max_len = l + gen.max_new_tokens
    max_len = ((max_len + 127) // 128) * 128
    cache, cache_seg, last_logits = prefill(
        params, cfg, batch, max_len, attn_impl=attn_impl
    )
    lengths = batch["lengths"]  # [B] true prompt lengths

    eos = jnp.asarray(
        gen.eos_token_ids if gen.eos_token_ids else (-1,), jnp.int32
    )

    rng0, rng = jax.random.split(rng)
    tok0 = sample_token(last_logits, gen, rng0)
    out = jnp.full((b, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    out = out.at[:, 0].set(tok0)
    done0 = jnp.any(tok0[:, None] == eos[None, :], axis=-1)
    num0 = jnp.ones((b,), jnp.int32)  # tok0 already emitted

    def cond(carry):
        step, done, *_ = carry
        return (step < gen.max_new_tokens) & ~jnp.all(done)

    def body(carry):
        step, done, num, tok, cache, cache_seg, out, rng = carry
        # `tok` was emitted at output slot step-1; its rope position is
        # lengths + (step-1) and its cache slot is l + (step-1).
        positions = lengths + step - 1
        write_idx = l + step - 1
        cache, cache_seg, logits = decode_step(
            params, cfg, cache, cache_seg, tok, positions, write_idx,
            attn_impl=attn_impl,
        )
        rng, sub = jax.random.split(rng)
        nxt = sample_token(logits, gen, sub)
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, step))
        num = num + (~done).astype(jnp.int32)
        done = done | jnp.any(nxt[:, None] == eos[None, :], axis=-1)
        return step + 1, done, num, nxt, cache, cache_seg, out, rng

    _, done, num, tok, cache, cache_seg, out, rng = jax.lax.while_loop(
        cond, body, (jnp.int32(1), done0, num0, tok0, cache, cache_seg, out, rng)
    )
    return {"tokens": out, "num_tokens": num}


def make_generate_fn(
    cfg: RadVLMConfig, gen: GenerationConfig, *, attn_impl: str = "auto"
):
    """Jitted generate(params, batch, rng) -> {tokens [B, max_new], num_tokens [B]}.

    One compilation per (batch, prompt-length) bucket; callers should pad prompts to
    a small set of bucket lengths (collate pad_to_multiple).
    """
    return jax.jit(
        functools.partial(_generate_impl, cfg=cfg, gen=gen, attn_impl=attn_impl)
    )


def make_stream_fns(cfg: RadVLMConfig, *, attn_impl: str = "auto"):
    """Jitted (prefill_fn, step_fn) pair for host-driven token streaming.

    The serving worker streams tokens as they decode (reference
    `model_worker.py:161-183` TextIteratorStreamer pattern): prefill once on
    device, then one jitted decode step per token with the cache donated between
    steps.

    prefill_fn(params, batch, max_len static) -> (cache, cache_seg, logits [B,V])
    step_fn(params, cache, cache_seg, tok [B], positions [B], write_idx) ->
        (cache, cache_seg, logits [B,V])
    """
    import functools as ft

    import jax

    pf = jax.jit(
        ft.partial(prefill, cfg=cfg, attn_impl=attn_impl),
        static_argnames=("max_len",),
    )

    @ft.partial(jax.jit, donate_argnums=(1, 2))
    def step_fn(params, cache, cache_seg, tok, positions, write_idx):
        return decode_step(
            params, cfg, cache, cache_seg, tok, positions, write_idx,
            attn_impl=attn_impl,
        )

    def prefill_fn(params, batch, max_len: int):
        return pf(params=params, batch=batch, max_len=max_len)

    return prefill_fn, step_fn


def stream_generate(
    params: Params,
    cfg: RadVLMConfig,
    batch: Dict[str, jnp.ndarray],
    gen: GenerationConfig,
    *,
    stream_fns=None,
    attn_impl: str = "auto",
    rng: Optional[jax.Array] = None,
):
    """Yield one [B] token array per decode step (host-streamed generation)."""
    import jax

    if stream_fns is None:
        stream_fns = make_stream_fns(cfg, attn_impl=attn_impl)
    prefill_fn, step_fn = stream_fns
    if rng is None:
        rng = jax.random.key(0)

    b, l = batch["tokens"].shape
    max_len = ((l + gen.max_new_tokens + 127) // 128) * 128
    cache, cache_seg, logits = prefill_fn(params, batch, max_len)
    lengths = batch["lengths"]
    eos = set(gen.eos_token_ids)
    import numpy as np

    done = np.zeros((b,), bool)
    rng, sub = jax.random.split(rng)
    tok = sample_token(logits, gen, sub)
    for step in range(gen.max_new_tokens):
        tok_np = np.asarray(tok)
        tok_np = np.where(done, gen.pad_token_id, tok_np)
        done |= np.isin(tok_np, list(eos)) if eos else False
        yield tok_np
        if done.all() or step == gen.max_new_tokens - 1:
            break
        positions = lengths + step
        write_idx = l + step
        cache, cache_seg, logits = step_fn(
            params, cache, cache_seg, jnp.asarray(tok_np), positions, write_idx
        )
        rng, sub = jax.random.split(rng)
        tok = sample_token(logits, gen, sub)


def trim_at_stop_strings(text: str, stop_strings: Sequence[str]) -> str:
    """Host-side stop-string trim (KeywordsStoppingCriteria semantics)."""
    cut = len(text)
    for s in stop_strings:
        i = text.find(s)
        if i >= 0:
            cut = min(cut, i)
    return text[:cut]
