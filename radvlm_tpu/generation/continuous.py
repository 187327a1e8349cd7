"""Continuous batching: slot-based always-full decode over a shared KV cache.

The reference serves one request per worker thread and evaluates at batch size 1
per GPU (`model_worker.py`, `evaluate_instructions.py:240-251`). For TPU
throughput (BASELINE.json config 4), this engine keeps a fixed batch of B slots
decoding every step and refills finished slots from a request queue without
disturbing the others:

- the shared cache is the framework's stacked [L, B, Smax, Hkv*D] layout; a new
  request prefills in a batch-1 jit (vision tower + prompt) into a fresh cache
  that is spliced into its slot with one dynamic_update_slice per k/v;
- the decode step runs ALL slots with per-slot write indices and rope
  positions (scatter writes in `qwen2._block_cached`); inactive/finished
  slots keep computing, and correctness comes from DISCARD + OVERWRITE, not
  segment masking: readback drops tokens whose slot was refilled since
  dispatch (snapshot identity check in `_process_chunk`) and `_fill_fn`
  splices the ENTIRE cache + segment row on refill, erasing any garbage the
  stale slot wrote;
- everything is fixed-shape: one prefill graph per prompt bucket, one decode
  graph total.

This is slot-granularity continuous batching (vLLM-style page tables are
unnecessary when each slot owns a contiguous Smax region — HBM is reserved per
slot as in the static-batch engine, but slots never idle waiting for the
longest request in a batch).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import queue
import time
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from radvlm_tpu.config import RadVLMConfig
from radvlm_tpu.generation.engine import (
    GenerationConfig,
    prefill,
    sample_token_vec,
)
from radvlm_tpu.models import multimodal, qwen2


@dataclasses.dataclass
class KVSnapshot:
    """Device-resident KV state of a finished request (prompt + reply), the
    unit of multi-turn conversation reuse (`Request.keep_kv` produces one,
    `submit(resume=...)` consumes one).

    The reference re-prefills the ENTIRE conversation every chat turn — its
    serving loop is stateless HF `generate` over the full concatenated
    history (`finetuning/llava/serve/model_worker.py:141-183`, prompts built
    by `gradio_web_server.py`'s conversation state). At anyres CXR scale
    that is ~3.4k tokens of prefill (vision tower included) per turn. A
    snapshot instead keeps the turn's KV rows on device: the next turn
    prefills ONLY its delta tokens (tens, not thousands) at the recorded
    cache offset — the vision tower never re-runs for images already in the
    prefix.

    `widx` is the next free cache index (everything below it is the clean
    prompt+reply KV — garbage beyond, from pipelined post-eos decode chunks,
    is clamped out at resume). `real_len` is the rope position of the next
    token (= count of real tokens so far; the cache is left-padded below
    `widx - real_len`)."""

    cache_rows: Tuple[Any, ...]  # per-component [L, 1, S, *] device rows
    seg_row: Any  # [1, S] int32 cache segment row
    widx: int  # next cache write index (clean-KV length)
    real_len: int  # rope position of the next token
    max_len: int  # cache geometry this snapshot was cut from
    kv_quant: bool
    hist_row: Optional[Any] = None  # [1, S] spec-mode token history row
    engine_idx: int = 0  # fleet affinity (serve/fleet.py routes resumes here)
    # How many of the request's emitted ids the snapshot covers. Usually all
    # of them; fewer when the final emitted token was produced by the last
    # dispatched chunk and never fed back (its K/V is then not in the cache —
    # possible at pipeline_depth=0). Callers storing conversation state must
    # pair the snapshot with ids[:n_reply] (see serve/batch_worker.py).
    n_reply: int = 0

    def truncated(self, k: int) -> "KVSnapshot":
        """A snapshot covering `k` fewer trailing reply tokens (device rows
        are shared — resume clamps segments/history at `widx`, so the extra
        KV above the shorter extent is never attendable)."""
        if k <= 0:
            return self
        if k > self.n_reply:
            raise ValueError(f"cannot drop {k} of {self.n_reply} reply tokens")
        return dataclasses.replace(
            self, widx=self.widx - k, real_len=self.real_len - k,
            n_reply=self.n_reply - k,
        )


@dataclasses.dataclass
class Request:
    uid: int
    sample: multimodal.MMSample
    max_new_tokens: int
    emitted: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # Multi-turn KV reuse: keep_kv snapshots this slot's cache rows at
    # completion into `kv_snapshot`; `resume` makes the fill a DELTA prefill
    # on top of a previous snapshot instead of a from-scratch prompt prefill.
    keep_kv: bool = False
    kv_snapshot: Optional[KVSnapshot] = None
    resume: Optional[KVSnapshot] = None
    # First token (sampled from the prefill logits), kept ON DEVICE as
    # (group_array, row) until the next chunk readback so _fill_slot never
    # blocks on the device (reading it eagerly would stall the pipelined
    # decode queue). The whole fill group shares one array so the readback
    # is ONE transfer per group, not one round-trip per request — over a
    # network-attached device per-request scalar reads dominated the emit
    # phase (3.6 s of a 44 s bench run, BENCH_r04 host_phase_s).
    tok0_dev: Optional[Any] = None
    # Pre-collated device batch + real (unpadded) length, built at submit()
    # time: host collate and the H2D tile transfer happen on the submitting
    # thread and pipeline ahead of the engine loop instead of stalling a
    # refill between decode chunks.
    dev_batch: Optional[Any] = None
    real_len: int = 0
    # Set when the engine aborted while this request was in flight; consumers
    # must not present `emitted` (possibly truncated) as a successful result.
    error: Optional[str] = None
    # Per-token streaming (submit(stream=True)): the engine puts each emitted
    # token here and a `None` sentinel at completion. Tokens arrive in bursts
    # of <= steps_per_sync (chunked decode readback).
    stream_q: Optional[Any] = None
    # Cooperative early stop (a streaming consumer saw its stop string): the
    # ENGINE thread (the only slot_req owner) frees the slot at the next
    # readback — consumers set the flag, never slot state.
    cancelled: bool = False
    # Per-request sampling params (None -> the engine GenerationConfig's).
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    # Tokens covered by dispatched work: 1 for the prefill's tok0 + K per
    # decode chunk whose snapshot includes this request. When planned >=
    # max_new_tokens the slot can be EAGERLY refilled (the remaining tokens
    # ride the in-flight chunks; emission reads the dispatch snapshot, not
    # slot ownership) — without this, a finished slot stays stranded for
    # (pipeline_depth+1) chunks until its final readback.
    planned: int = 0


class ContinuousBatcher:
    """Always-full decode over `num_slots` concurrent sequences."""

    def __init__(
        self,
        params: Any,
        cfg: RadVLMConfig,
        gen: GenerationConfig,
        *,
        num_slots: int = 8,
        max_len: int = 8192,
        prompt_buckets: Sequence[int] = (1024, 2048, 4096),
        pad_tiles: int = 6,
        attn_impl: str = "auto",
        seed: int = 0,
        steps_per_sync: int = 8,
        pipeline_depth: int = 2,
        kv_quant: Optional[bool] = None,
        fill_batch: Optional[int] = None,
        mesh: Optional[Any] = None,
        tp_axis: str = "tensor",
        device: Optional[Any] = None,
        spec_k: Optional[int] = None,
    ):
        import os

        import jax
        import jax.numpy as jnp

        # Single-device placement (serve/fleet.py: one engine per chip, the
        # reference's one-model-per-GPU worker fleet). Params and all engine
        # state are COMMITTED to `device`, so every fill/decode graph executes
        # there — N independent engines share one process. Exclusive with mesh.
        if device is not None and mesh is not None:
            raise ValueError("pass either device= (fleet) or mesh= (TP), not both")
        self.device = device
        if device is not None:
            params = jax.device_put(params, device)

        # Tensor-parallel serving (parallel/tp.py): with a mesh, the fill and
        # decode-chunk graphs run under shard_map over `tp_axis` (Megatron
        # column/row partition, KV cache sharded over kv heads, replicated
        # lm_head -> shard-identical sampling). Params are resharded here;
        # pass the UNFUSED layout (tp.tp_param_pspecs rejects fused trees).
        self.mesh = mesh
        self.tp_axis = tp_axis
        if mesh is not None:
            from radvlm_tpu.parallel import tp as tplib

            tp_size = dict(mesh.shape)[tp_axis]
            self._local_cfg = dataclasses.replace(
                cfg, text=tplib.local_text_cfg(cfg.text, tp_size)
            )
            params = tplib.shard_params_tp(mesh, params, tp_axis)
        else:
            self._local_cfg = cfg
        self.params = params
        self.cfg = cfg
        self.gen = gen
        self.num_slots = num_slots
        # Round the cache length up to a lane-aligned 128 multiple: the Pallas
        # decode kernels require smax % 128 == 0, and a stray max_len (e.g.
        # bucket + 16 new tokens) silently fell back to the XLA decode path —
        # measured ~2x decode slowdown and much slower compiles.
        self.max_len = max_len = -(-max_len // 128) * 128
        self.prompt_buckets = sorted(prompt_buckets)
        self.pad_tiles = pad_tiles
        self.attn_impl = attn_impl
        self.steps_per_sync = max(1, steps_per_sync)
        self.pipeline_depth = max(0, pipeline_depth)
        self._rng = jax.random.key(seed)
        # int8 KV cache (per-token/kv-head scales, ops/kv_quant.py): halves
        # cache residency + decode-attention HBM traffic — 2x the slots on a
        # 16 GB chip. None -> RADVLM_KV_INT8 env (bench/serving set it).
        if kv_quant is None:
            kv_quant = os.environ.get("RADVLM_KV_INT8", "0") == "1"
        self.kv_quant = bool(kv_quant)
        # Multi-slot refills: group same-bucket queued requests into one
        # prefill dispatch of up to `fill_batch` rows (amortizes the fixed
        # per-fill cost; fill_batch=1 keeps the single-slot graphs only).
        if fill_batch is None:
            fill_batch = int(os.environ.get("RADVLM_FILL_BATCH", "1"))
        self.fill_batch = max(1, int(fill_batch))
        # Speculative decoding (generation/spec.py): each greedy decode step
        # verifies spec_k prompt-lookup drafts in one spec_k+1-wide cached
        # forward — emitted tokens are IDENTICAL to plain greedy, steps
        # collapse by the acceptance rate. Per-slot positions/write indices
        # become DEVICE state (the accept count is data-dependent; host-side
        # counters would force a readback between pipelined chunks).
        if spec_k is None:
            spec_k = int(os.environ.get("RADVLM_SPEC_K", "0"))
        self.spec_k = max(0, int(spec_k))

        # Device state.
        self.cache = (
            qwen2.init_kv_cache_q8(cfg.text, num_slots, max_len)
            if self.kv_quant
            else qwen2.init_kv_cache(cfg.text, num_slots, max_len)
        )
        if mesh is not None:
            from jax.sharding import NamedSharding

            from radvlm_tpu.parallel import tp as tplib

            cache_specs = tplib.cache_pspecs(len(self.cache), tp_axis)
            self.cache = tuple(
                jax.device_put(c, NamedSharding(mesh, s))
                for c, s in zip(self.cache, cache_specs)
            )
        self.cache_seg = jnp.zeros((num_slots, max_len), jnp.int32)
        self.cur_tok = jnp.zeros((num_slots,), jnp.int32)
        # per-slot sampling params (requests may override the engine default)
        self.slot_temp = jnp.full((num_slots,), gen.temperature, jnp.float32)
        self.slot_top_p = jnp.full((num_slots,), gen.top_p, jnp.float32)
        # Spec-mode device state: rope position + cache write index of the
        # current token per slot, and the token history the prompt-lookup
        # proposer matches against (prompt ids at fill, accepted tokens as
        # decoding advances; -1 at pad/image positions).
        if self.spec_k:
            self.dec_pos = jnp.zeros((num_slots,), jnp.int32)
            self.dec_widx = jnp.zeros((num_slots,), jnp.int32)
            self.tok_hist = jnp.full((num_slots, max_len), -1, jnp.int32)
            self.spec_stats = {"verify_steps": 0, "emitted": 0}
        if device is not None:
            self.cache, self.cache_seg, self.cur_tok, self.slot_temp, \
                self.slot_top_p, self._rng = jax.device_put(
                    (self.cache, self.cache_seg, self.cur_tok,
                     self.slot_temp, self.slot_top_p, self._rng),
                    device,
                )
            if self.spec_k:
                self.dec_pos, self.dec_widx, self.tok_hist = jax.device_put(
                    (self.dec_pos, self.dec_widx, self.tok_hist), device
                )
        # Host slot state (incremental counters — no per-step device readback
        # or O(slots x max_len) scans).
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_len = np.zeros((num_slots,), np.int64)  # tokens in cache
        self.slot_real_len = np.zeros((num_slots,), np.int64)  # excl. left pad
        # Write index / rope position right AFTER each slot's fill: slot_len
        # advances optimistically per dispatched chunk (pipelining), so the
        # clean-KV extent of a finished request is fill_len + len(emitted) —
        # what KVSnapshot records (multi-turn resume).
        self.slot_fill_len = np.zeros((num_slots,), np.int64)
        self.slot_fill_real = np.zeros((num_slots,), np.int64)
        self.queue: "queue.Queue[Request]" = queue.Queue()
        self._uid = itertools.count(1)  # thread-safe-enough uid source

        self._fill_fns: Dict[int, Callable] = {}
        self._resume_fns: Dict[Tuple[int, int], Callable] = {}
        self._snap_fns: Dict[str, Callable] = {}
        self.resume_fills = 0  # telemetry: delta prefills served
        # Host wall-clock per run()-loop phase (cumulative seconds). The
        # readback phase is dominated by the wait for the oldest in-flight
        # chunk — i.e. it measures DEVICE-bound time; fill/dispatch measure
        # host dispatch cost; a large `idle` means the engine starved (the
        # feeder could not keep the queue non-empty). ~per-chunk perf_counter
        # pairs: negligible against 10ms+ chunks, so always on.
        self.host_stats = {
            "fill": 0.0, "dispatch": 0.0, "readback": 0.0, "emit": 0.0,
            "fills": 0, "chunks": 0,
        }
        self._step_fns = self._build_step()

    # ------------------------------------------------------------------
    def _tp_scope(self):
        """Context entered INSIDE traced bodies: under a mesh it turns on the
        row-parallel psums in qwen2._finish_block (parallel/tp.py)."""
        import contextlib

        if self.mesh is None:
            return contextlib.nullcontext()
        from radvlm_tpu.parallel import tp as tplib

        return tplib.active(self.tp_axis)

    def _shard_wrap(self, fn, n_extra_in: int, n_extra_out: int):
        """shard_map a (params, cache, *state) engine graph over the mesh:
        params get the Megatron TP specs, cache components the kv-head specs,
        everything else is replicated."""
        if self.mesh is None:
            return fn
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from radvlm_tpu.parallel import tp as tplib

        pspec = tplib.tp_param_pspecs(self.params, self.tp_axis)
        cache_specs = tplib.cache_pspecs(len(self.cache), self.tp_axis)
        return shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(pspec, cache_specs) + (P(),) * n_extra_in,
            out_specs=(cache_specs,) + (P(),) * n_extra_out,
            check_vma=False,
        )

    def _build_step(self):
        import jax
        import jax.numpy as jnp

        if self.spec_k:
            return self._build_step_spec()

        cfg = self._local_cfg

        K = self.steps_per_sync

        def make_chunk(use_sampling: bool):
            """K decode steps in ONE dispatch (lax.scan), returning all K
            sampled tokens [B, K].

            One jit call + one host readback per token is what the reference's
            HF `generate` loop does; over a network-attached accelerator every
            step pays a host round-trip (measured ~30x slowdown through the
            axon tunnel). Chunked decode keeps the device busy for K tokens
            per dispatch; `run()` additionally chains chunks without readback
            while no slot can possibly finish (JetStream-style decode loop).

            TWO compiled variants: the pure-greedy path (eval/serving default)
            uses a single argmax; the sampling path pays the per-row
            temperature/top-p machinery (a full-vocab sort per step — measured
            ~12% off e2e throughput when taken unconditionally). The host
            picks per chunk by whether any ACTIVE slot samples."""

            def step_chunk(params, cache, cache_seg, tok, positions, write_idx,
                           slot_temp, slot_top_p, rng):
                b = tok.shape[0]

                def body(carry, k):
                    cache, cache_seg, tok, positions, write_idx, rng = carry
                    cache_seg = cache_seg.at[jnp.arange(b), write_idx].set(1)
                    embeds = qwen2.embed_tokens(params["text"], tok[:, None], cfg.text)
                    rng, sub = jax.random.split(rng)
                    logits, cache = qwen2.forward(
                        params["text"], cfg.text,
                        input_embeds=embeds,
                        positions=positions[:, None],
                        segment_ids=jnp.ones((b, 1), jnp.int32),
                        kv_cache=cache,
                        cache_index=write_idx,
                        cache_segment_ids=cache_seg,
                        attn_impl=self.attn_impl,
                    )
                    if use_sampling:
                        nxt = sample_token_vec(
                            logits[:, 0], slot_temp, slot_top_p, sub,
                            top_k=self.gen.top_k,
                        )
                    else:
                        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                    positions = positions + 1
                    write_idx = jnp.minimum(write_idx + 1, self.max_len - 1)
                    return (cache, cache_seg, nxt, positions, write_idx, rng), nxt

                with self._tp_scope():
                    (cache, cache_seg, tok, _, _, _), toks = jax.lax.scan(
                        body,
                        (cache, cache_seg, tok, positions, write_idx, rng),
                        jnp.arange(K),
                    )
                return cache, cache_seg, tok, jnp.swapaxes(toks, 0, 1)

            return jax.jit(
                self._shard_wrap(step_chunk, n_extra_in=7, n_extra_out=3),
                donate_argnums=(1,),
            )

        return {False: make_chunk(False), True: make_chunk(True)}

    def _build_step_spec(self):
        """Spec-mode decode chunks: the greedy variant verifies spec_k
        prompt-lookup drafts per step in one (spec_k+1)-wide cached forward
        (generation/spec.py); the sampling variant is the plain one-token
        step, but BOTH carry the per-slot (pos, widx, hist) device state so
        the host never needs a readback to know where each slot is.

        Chunk outputs: toks [B, K, spec_k+1] greedy predictions (the emission
        stream per step is toks[:, step, :counts]) and counts [B, K]
        accepted+1 per step (all-ones for the sampling variant)."""
        import jax
        import jax.numpy as jnp

        from radvlm_tpu.generation import spec as speclib

        cfg = self._local_cfg
        K = self.steps_per_sync
        sk = self.spec_k
        max_len = self.max_len

        def make_chunk(use_sampling: bool):
            def step_chunk(params, cache, cache_seg, tok, pos, widx, hist,
                           slot_temp, slot_top_p, rng):
                b = tok.shape[0]
                rows = jnp.arange(b)

                def body_sample(carry, _):
                    cache, cache_seg, tok, pos, widx, hist, rng = carry
                    wc = jnp.minimum(widx, max_len - 1)
                    cache_seg = cache_seg.at[rows, wc].set(1)
                    hist = hist.at[rows, wc].set(tok)
                    embeds = qwen2.embed_tokens(
                        params["text"], tok[:, None], cfg.text
                    )
                    rng, sub = jax.random.split(rng)
                    logits, cache = qwen2.forward(
                        params["text"], cfg.text,
                        input_embeds=embeds,
                        positions=pos[:, None],
                        segment_ids=jnp.ones((b, 1), jnp.int32),
                        kv_cache=cache,
                        cache_index=wc,
                        cache_segment_ids=cache_seg,
                        attn_impl=self.attn_impl,
                    )
                    nxt = sample_token_vec(
                        logits[:, 0], slot_temp, slot_top_p, sub,
                        top_k=self.gen.top_k,
                    )
                    toks = jnp.concatenate(
                        [nxt[:, None], jnp.zeros((b, sk), jnp.int32)], axis=1
                    )
                    return (
                        cache, cache_seg, nxt, pos + 1,
                        jnp.minimum(widx + 1, max_len - 1), hist, rng,
                    ), (toks, jnp.ones((b,), jnp.int32))

                def body_spec(carry, _):
                    cache, cache_seg, tok, pos, widx, hist, rng = carry
                    # Clamp so the whole window fits the cache (active slots
                    # never bind — max_new is capped with spec_k headroom at
                    # fill time; finished slots decode clamped garbage that
                    # the refill's wholesale cache/seg/hist splice erases).
                    wc = jnp.minimum(widx, max_len - 1 - sk)
                    hist = speclib.write_history(hist, wc, tok[:, None])
                    draft = speclib.propose_ngram(hist, wc, sk)
                    window = jnp.concatenate([tok[:, None], draft], axis=1)
                    span = jnp.arange(sk + 1)[None]
                    idxw = wc[:, None] + span
                    cache_seg = cache_seg.at[rows[:, None], idxw].set(1)
                    embeds = qwen2.embed_tokens(
                        params["text"], window, cfg.text
                    )
                    logits, cache = qwen2.forward(
                        params["text"], cfg.text,
                        input_embeds=embeds,
                        positions=pos[:, None] + span,
                        segment_ids=jnp.ones((b, sk + 1), jnp.int32),
                        kv_cache=cache,
                        cache_index=wc,
                        cache_segment_ids=cache_seg,
                        attn_impl=self.attn_impl,
                    )
                    pred, n_emit, nxt = speclib.greedy_accept(logits, draft)
                    # History gets the model's own predictions (the accepted
                    # prefix is the true stream; the tail is stale-but-safe
                    # draft material for later lookups).
                    hist = speclib.write_history(hist, wc + 1, pred[:, :sk])
                    # Clear segment ids past the accepted prefix: the s==1
                    # paths (sampling variant, Pallas decode kernel) mask by
                    # segment only — a stale 1 would admit garbage K/V.
                    cache_seg = cache_seg.at[rows[:, None], idxw].set(
                        (span < n_emit[:, None]).astype(cache_seg.dtype)
                    )
                    return (
                        cache, cache_seg, nxt, pos + n_emit, wc + n_emit,
                        hist, rng,
                    ), (pred, n_emit)

                body = body_sample if use_sampling else body_spec
                with self._tp_scope():
                    (cache, cache_seg, tok, pos, widx, hist, _), \
                        (toks, counts) = jax.lax.scan(
                            body,
                            (cache, cache_seg, tok, pos, widx, hist, rng),
                            jnp.arange(K),
                        )
                return (
                    cache, cache_seg, tok, pos, widx, hist,
                    jnp.swapaxes(toks, 0, 1), jnp.swapaxes(counts, 0, 1),
                )

            return jax.jit(
                self._shard_wrap(step_chunk, n_extra_in=8, n_extra_out=7),
                donate_argnums=(1,),
            )

        return {False: make_chunk(False), True: make_chunk(True)}

    def _fill_fn(self, bucket: int, nfill: int = 1):
        """ONE jitted dispatch per refill of `nfill` slots: prefill the
        prompt batch, sample each first token, splice each row's
        cache/segments into its slot, set cur_tok. (Separate
        prefill/sample/insert/set calls each pay a dispatch round-trip to a
        network-attached device; fused they cost one. nfill=2 additionally
        amortizes the per-fill FIXED overhead — vision dispatch + prefill
        weight streaming — across two images, attacking the ~30% fixed
        fraction of the 7B fill cost.)"""
        import jax
        import jax.numpy as jnp

        key = (bucket, nfill)
        if key not in self._fill_fns:
            cfg, attn_impl, max_len = self._local_cfg, self.attn_impl, self.max_len
            gen = self.gen
            cache_format = "int8" if self.kv_quant else "bf16"
            spec_k = self.spec_k

            def fill(params, shared_cache, cache_seg, cur_tok, slot_temp,
                     slot_top_p, batch, slots, rng, temp, top_p,
                     pos=None, widx=None, hist=None, lengths=None):
                with self._tp_scope():
                    cache1, seg1, last_logits = prefill(
                        params, cfg, batch, max_len, attn_impl=attn_impl,
                        cache_format=cache_format,
                    )
                tok0 = sample_token_vec(
                    last_logits, temp, top_p, rng, top_k=gen.top_k,
                )  # [nfill]
                slot_temp = slot_temp.at[slots].set(temp)
                slot_top_p = slot_top_p.at[slots].set(top_p)
                # Splice every cache component row into its slot. Offset
                # (0, slot, 0, 0) is correct for both layouts: slot is dim 1
                # of the int8 k/v [L, B, S, Hkv*D] AND the scales
                # [L, B, Hkv, S].
                new_cache = shared_cache
                for j in range(nfill):
                    row = tuple(
                        jax.lax.dynamic_slice_in_dim(c, j, 1, axis=1)
                        for c in cache1
                    )
                    new_cache = tuple(
                        jax.lax.dynamic_update_slice(
                            sh, rc, (0, slots[j], 0, 0)
                        )
                        for sh, rc in zip(new_cache, row)
                    )
                    cache_seg = jax.lax.dynamic_update_slice(
                        cache_seg,
                        jax.lax.dynamic_slice_in_dim(seg1, j, 1, axis=0),
                        (slots[j], 0),
                    )
                cur_tok = cur_tok.at[slots].set(tok0)
                if spec_k:
                    # Reset the spec device state for the filled slots: rope
                    # position = real prompt length, write index = padded
                    # length (prompt occupies cache [0, l) left-padded), and
                    # the history row = prompt text ids (-1 at pad/image).
                    from radvlm_tpu.generation import spec as speclib

                    rows = speclib.history_from_prompt(
                        batch["tokens"], batch["segment_ids"],
                        batch["img_src"], max_len,
                    )
                    for j in range(nfill):
                        hist = jax.lax.dynamic_update_slice(
                            hist,
                            jax.lax.dynamic_slice_in_dim(rows, j, 1, axis=0),
                            (slots[j], 0),
                        )
                    l_pad = batch["tokens"].shape[1]
                    pos = pos.at[slots].set(lengths.astype(jnp.int32))
                    widx = widx.at[slots].set(l_pad)
                    return (new_cache, cache_seg, cur_tok, slot_temp,
                            slot_top_p, pos, widx, hist, tok0)
                return new_cache, cache_seg, cur_tok, slot_temp, slot_top_p, tok0

            if spec_k:
                self._fill_fns[key] = jax.jit(
                    self._shard_wrap(fill, n_extra_in=13, n_extra_out=8),
                    donate_argnums=(1, 2, 3, 4, 5, 11, 12, 13),
                )
            else:
                self._fill_fns[key] = jax.jit(
                    self._shard_wrap(fill, n_extra_in=9, n_extra_out=5),
                    donate_argnums=(1, 2, 3, 4, 5),
                )
        return self._fill_fns[key]

    def _snap_fn(self, kind: str):
        """Jitted row-slice of the shared cache (+ seg / spec history row) for
        one slot — the device copy a KVSnapshot owns. A copy, not a view:
        later chunks keep scattering garbage into the slot and refills splice
        over it; the snapshot buffers are untouched."""
        import jax

        if kind not in self._snap_fns:
            if kind == "cache":
                def f(cache, seg, slot):
                    rows = tuple(
                        jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1)
                        for c in cache
                    )
                    return rows, jax.lax.dynamic_slice_in_dim(seg, slot, 1, axis=0)
            else:  # "hist"
                def f(hist, slot):
                    return jax.lax.dynamic_slice_in_dim(hist, slot, 1, axis=0)
            self._snap_fns[kind] = jax.jit(f)
        return self._snap_fns[kind]

    def _take_snapshot(self, slot: int, req: Request) -> None:
        """Cut the finished request's clean KV extent into req.kv_snapshot.

        Runs on the engine thread at emission time (no device sync — the
        slices queue behind the in-flight chunks). Clean extent: the cache
        holds prompt + every FED token; tokens are fed in emission order, so
        [0, fill_len + len(emitted)) is exactly prompt + reply even while
        pipelined post-eos chunks still scatter garbage above it."""
        # A token's K/V is written when it is FED (the step after it was
        # produced). A final emitted token produced by the very last
        # dispatched chunk has no later chunk to feed it when the engine goes
        # idle (pipeline_depth=0), so it is excluded — the snapshot then
        # covers n-1 reply tokens and records that in n_reply (the worker
        # pairs stored ids with the covered count; the dropped token simply
        # rides the next turn's delta). Plain mode counts dispatched decode
        # writes exactly (slot_len advances K per chunk); spec mode advances
        # data-dependently on device, so it uses the conservative "is any
        # later chunk already dispatched" signal from _process_chunk.
        n = len(req.emitted)
        if self.spec_k:
            if getattr(self, "_chunks_in_flight", 0) == 0 and n > 0:
                n -= 1
        else:
            fed = int(self.slot_len[slot] - self.slot_fill_len[slot])
            n = min(n, max(0, fed))
        widx = int(self.slot_fill_len[slot]) + n
        real = int(self.slot_fill_real[slot]) + n
        rows, seg = self._snap_fn("cache")(
            self.cache, self.cache_seg, np.int32(slot)
        )
        hist = None
        if self.spec_k:
            hist = self._snap_fn("hist")(self.tok_hist, np.int32(slot))
        req.kv_snapshot = KVSnapshot(
            cache_rows=rows, seg_row=seg, widx=widx, real_len=real,
            max_len=self.max_len, kv_quant=self.kv_quant, hist_row=hist,
            engine_idx=getattr(self, "_fleet_idx", 0), n_reply=n,
        )

    def _resume_fill_fn(self, dl: int, t_tiles: int):
        """ONE jitted dispatch per resumed-conversation refill: splice the
        snapshot's KV rows back into the slot, run the new turn's tokens as a
        windowed cached forward at the recorded offset (the same per-row
        multi-token write path speculative verify uses,
        `qwen2._block_cached` s>1), and sample the first reply token from the
        last real delta position. The from-scratch alternative (_fill_fn)
        recomputes the whole conversation — at CXR chat shapes that is ~3.4k
        tokens + the vision tower per turn for an unchanged prefix."""
        import jax
        import jax.numpy as jnp

        from radvlm_tpu.models import radvlm

        key = (dl, t_tiles)
        if key not in self._resume_fns:
            cfg, attn_impl = self._local_cfg, self.attn_impl
            gen, max_len, spec_k = self.gen, self.max_len, self.spec_k

            def rfill(params, cache, cache_seg, cur_tok, slot_temp, slot_top_p,
                      batch, slot, snap_cache, snap_seg, widx, prefix_real,
                      rng, temp, top_p, pos_state=None, widx_state=None,
                      hist_state=None, snap_hist=None):
                ar = jnp.arange(max_len)[None]  # [1, S]
                real_delta = batch["lengths"].astype(jnp.int32)  # [1]
                # Clamp the snapshot's segment row to its clean extent (post-
                # eos pipelined chunks set garbage seg bits above widx), then
                # mark the delta's REAL positions; right-pad tail stays 0 so
                # neither the window's own queries nor later decode steps can
                # attend the pad writes.
                seg1 = jnp.where(ar < widx, snap_seg, 0)
                in_delta = (ar >= widx) & (ar < widx + real_delta[:, None])
                seg1 = jnp.where(in_delta, 1, seg1).astype(snap_seg.dtype)
                batch2 = dict(batch)
                # collate(left_pad=False) numbered positions 0..n-1; the
                # conversation continues at prefix_real (pad positions get
                # garbage rope — masked by segment ids).
                batch2["positions"] = batch["positions"] + prefix_real
                with self._tp_scope():
                    hidden, cache1 = radvlm.forward(
                        params, cfg, batch2,
                        kv_cache=snap_cache,
                        cache_index=jnp.full((1,), 0, jnp.int32) + widx,
                        cache_segment_ids=seg1,
                        attn_impl=attn_impl,
                        return_hidden=True,
                    )
                last = jnp.take_along_axis(
                    hidden,
                    jnp.reshape(real_delta - 1, (1, 1, 1)).astype(jnp.int32),
                    axis=1,
                )[:, 0]
                logits = qwen2.unembed(params["text"], cfg.text, last)
                tok0 = sample_token_vec(
                    logits, temp, top_p, rng, top_k=gen.top_k
                )  # [1]
                new_cache = tuple(
                    jax.lax.dynamic_update_slice(sh, rc, (0, slot, 0, 0))
                    for sh, rc in zip(cache, cache1)
                )
                cache_seg = jax.lax.dynamic_update_slice(
                    cache_seg, seg1, (slot, 0)
                )
                cur_tok = cur_tok.at[slot].set(tok0[0])
                slot_temp = slot_temp.at[slot].set(temp[0])
                slot_top_p = slot_top_p.at[slot].set(top_p[0])
                if spec_k:
                    # Rebuild the slot's prompt-lookup history: snapshot row
                    # (clamped like seg) + the delta's text ids at their cache
                    # positions (-1 at images/pad, same as fill).
                    hist_row = jnp.where(ar < widx, snap_hist, -1)
                    didx = jnp.clip(ar - widx, 0, dl - 1)
                    dtext = jnp.where(
                        (batch["segment_ids"] != 0) & (batch["img_src"] < 0),
                        batch["tokens"], -1,
                    ).astype(jnp.int32)
                    dvals = jnp.take_along_axis(dtext, didx, axis=1)
                    hist_row = jnp.where(in_delta, dvals, hist_row)
                    hist_state = jax.lax.dynamic_update_slice(
                        hist_state, hist_row, (slot, 0)
                    )
                    pos_state = pos_state.at[slot].set(
                        prefix_real + real_delta[0]
                    )
                    widx_state = widx_state.at[slot].set(widx + real_delta[0])
                    return (new_cache, cache_seg, cur_tok, slot_temp,
                            slot_top_p, pos_state, widx_state, hist_state,
                            tok0)
                return (new_cache, cache_seg, cur_tok, slot_temp, slot_top_p,
                        tok0)

            # Donate the engine's own state; NEVER the snapshot args — the
            # caller (a chat session store) keeps the snapshot alive for
            # retry/fallback if this fill or the request fails.
            donate = (1, 2, 3, 4, 5) + ((15, 16, 17) if spec_k else ())
            self._resume_fns[key] = jax.jit(rfill, donate_argnums=donate)
        return self._resume_fns[key]

    def _resume_fill(self, slot: int, req: Request) -> None:
        """Fill `slot` by delta prefill on req.resume (one dispatch)."""
        import jax
        import jax.numpy as jnp

        batch, real_len = self._materialize(req)
        snap = req.resume
        dl = batch["tokens"].shape[1]
        t_tiles = batch["tiles"].shape[1]
        self._rng, sub = jax.random.split(self._rng)
        temp = jnp.asarray(
            [self.gen.temperature if req.temperature is None
             else req.temperature], jnp.float32,
        )
        top = jnp.asarray(
            [self.gen.top_p if req.top_p is None else req.top_p], jnp.float32,
        )
        args = (
            self.params, self.cache, self.cache_seg, self.cur_tok,
            self.slot_temp, self.slot_top_p, batch, np.int32(slot),
            snap.cache_rows, snap.seg_row, np.int32(snap.widx),
            np.int32(snap.real_len), sub, temp, top,
        )
        if self.spec_k:
            args += (self.dec_pos, self.dec_widx, self.tok_hist,
                     snap.hist_row)
            (self.cache, self.cache_seg, self.cur_tok, self.slot_temp,
             self.slot_top_p, self.dec_pos, self.dec_widx, self.tok_hist,
             tok0) = self._resume_fill_fn(dl, t_tiles)(*args)
        else:
            (self.cache, self.cache_seg, self.cur_tok, self.slot_temp,
             self.slot_top_p, tok0) = self._resume_fill_fn(dl, t_tiles)(*args)
        end = snap.widx + real_len
        real_end = snap.real_len + real_len
        allowed = max(1, self.max_len - end + 1 - self.spec_k)
        if req.max_new_tokens > allowed:
            req.max_new_tokens = allowed
        self.slot_req[slot] = req
        req.planned = 1  # the delta prefill's tok0
        self.slot_len[slot] = end
        self.slot_real_len[slot] = real_end
        self.slot_fill_len[slot] = end
        self.slot_fill_real[slot] = real_end
        self.resume_fills += 1
        req.tok0_dev = (tok0, 0)
        tok0.copy_to_host_async()

    # ------------------------------------------------------------------
    def warmup(self) -> None:
        """Compile every prompt-bucket fill graph + the decode chunk up front.

        Call once after construction (serving startup / bench warmup): a
        bucket whose first request arrives mid-stream would otherwise stall
        the pipeline for its XLA compile. Uses a text-only dummy sample per
        bucket and resets all slot state afterwards.

        If the fused W8A8 prefill kernel fails to compile (its VMEM budget is
        geometry-dependent), the engine falls back to the XLA s8xs8 emitter
        and re-warms — a serving worker must come up rather than crash."""
        import logging
        import os

        import jax

        try:
            self._warmup_once()
            return
        except jax.errors.JaxRuntimeError as e:
            msg = str(e)
            fused = (
                os.environ.get("RADVLM_W8A8_IMPL", "xla") == "fused"
                and jax.default_backend() == "tpu"
            )
            # Only the fused kernel's own compile failures are recoverable by
            # switching emitters — XLA names the failing custom call / source
            # file in the message. Other Mosaic kernels (decode attention,
            # flash) don't read RADVLM_W8A8_IMPL; re-warming under a
            # different emitter would mutate global state, recompile every
            # fill graph, and then fail identically.
            fused_failure = (
                "w8a8_matmul_fused" in msg or "w8a8_matmul.py" in msg
            )
            if not (fused and fused_failure):
                raise
            del e
        logging.getLogger(__name__).warning(
            "fused W8A8 kernel failed to compile; falling back to "
            "RADVLM_W8A8_IMPL=xla"
        )
        os.environ["RADVLM_W8A8_IMPL"] = "xla"
        # impl is read at trace time inside quant.w8a8_matmul: drop the fill
        # graphs so they retrace (decode chunks use the int8 decode kernel,
        # not W8A8 — keep them).
        self._fill_fns.clear()
        self._warmup_once()

    def _precompile_fills(self, groups) -> None:
        """AOT-compile every bucket fill graph CONCURRENTLY and install the
        compiled executables in `_fill_fns` (the jit objects they replace are
        callable-compatible; donation is part of the lowering).

        Serving startup pays one XLA compile — or, warm, one persistent-cache
        load — per (bucket, group-size) fill graph, serially ~15 s each on a
        network-attached device. Tracing and compilation release the GIL, so
        a thread pool overlaps them. Opt out with RADVLM_PARALLEL_WARMUP=0
        (the serial dispatch path then compiles on first call, as before)."""
        import concurrent.futures

        import jax
        import jax.numpy as jnp

        def compile_one(bucket, nf, reqs):
            batch = (
                reqs[0].dev_batch if nf == 1 else {
                    k: jnp.concatenate([r.dev_batch[k] for r in reqs], axis=0)
                    for k in reqs[0].dev_batch
                }
            )
            l = batch["tokens"].shape[1]
            slots = jnp.arange(nf, dtype=jnp.int32)
            temps = jnp.zeros((nf,), jnp.float32)
            tops = jnp.ones((nf,), jnp.float32)
            rng = jax.random.key(0)
            jitfn = self._fill_fn(l, nf)
            args = (
                self.params, self.cache, self.cache_seg, self.cur_tok,
                self.slot_temp, self.slot_top_p, batch, slots, rng, temps,
                tops,
            )
            if self.spec_k:
                args += (
                    self.dec_pos, self.dec_widx, self.tok_hist,
                    jnp.zeros((nf,), jnp.int32),
                )
            compiled = jitfn.lower(*args).compile()
            tiles_shape = batch["tiles"].shape

            # AOT executables are pinned to exact avals; an image needing
            # more anyres tiles than pad_tiles changes the batch shape (the
            # jit path just recompiles) — guard and fall back.
            def dispatch(*args, _c=compiled, _j=jitfn, _t=tiles_shape):
                if args[6]["tiles"].shape == _t:
                    return _c(*args)
                return _j(*args)

            self._fill_fns[(l, nf)] = dispatch

        def compile_decode(sampling):
            # decode-chunk avals are fixed per engine instance (positions /
            # write_idx are int32 [num_slots] — _dispatch_chunk), so the AOT
            # executable can replace the jit object directly
            positions = jnp.zeros((self.num_slots,), jnp.int32)
            rng = jax.random.key(0)
            if self.spec_k:
                args = (
                    self.params, self.cache, self.cache_seg, self.cur_tok,
                    self.dec_pos, self.dec_widx, self.tok_hist,
                    self.slot_temp, self.slot_top_p, rng,
                )
            else:
                args = (
                    self.params, self.cache, self.cache_seg, self.cur_tok,
                    positions, positions, self.slot_temp, self.slot_top_p,
                    rng,
                )
            compiled = self._step_fns[sampling].lower(*args).compile()
            self._step_fns[sampling] = compiled

        jobs = [lambda g=g: compile_one(*g) for g in groups]
        jobs += [lambda s=s: compile_decode(s) for s in (False, True)]
        with concurrent.futures.ThreadPoolExecutor(
            max_workers=min(8, len(jobs))
        ) as pool:
            futs = [pool.submit(j) for j in jobs]
            for f in futs:
                f.result()  # re-raise compile failures in the caller

    def _warmup_once(self) -> None:
        import collections
        import os

        import time

        import jax
        import jax.numpy as jnp

        # Per-graph wall seconds (bucket fills + decode variants), kept for
        # startup diagnosis: warm restarts still pay ~15 s/graph through the
        # persistent cache and this breakdown says whether that is tracing,
        # cache load, or dispatch (read by bench.py / serving logs).
        self.warmup_timings: Dict[str, float] = {}
        # run() forms same-bucket groups of EVERY size 1..fill_batch (queue
        # remainders), so each size needs its own compiled fill graph or the
        # first odd-sized group stalls all slots on a mid-stream compile.
        nfills = list(range(1, min(self.fill_batch, self.num_slots) + 1))
        groups = []
        for bucket in self.prompt_buckets:
            for nf in nfills:
                reqs = []
                for _ in range(nf):
                    sample = multimodal.build_sample(
                        list(range(2, 8)), [], self.cfg
                    )
                    hb = multimodal.collate(
                        [sample], pad_len=bucket, pad_tiles=self.pad_tiles,
                        pad_to_multiple=128, left_pad=True,
                    )
                    r = Request(uid=0, sample=sample, max_new_tokens=1)
                    r.real_len = int(hb["lengths"][0])
                    r.dev_batch = {k: jnp.asarray(v) for k, v in hb.items()}
                    reqs.append(r)
                groups.append((bucket, nf, reqs))
        if (os.environ.get("RADVLM_PARALLEL_WARMUP", "1") == "1"
                and len(groups) > 1):
            t0 = time.perf_counter()
            self._precompile_fills(groups)
            self.warmup_timings["parallel_precompile"] = (
                time.perf_counter() - t0
            )
        for bucket, nf, reqs in groups:
            t0 = time.perf_counter()
            self._fill_group(list(enumerate(reqs)))
            jax.block_until_ready(self.cur_tok)
            self.warmup_timings[f"fill_{bucket}_x{nf}"] = (
                time.perf_counter() - t0
            )
        infl: "collections.deque" = collections.deque()
        # Compile BOTH decode-chunk variants: with no active slots
        # _sampling_active() is False, so an unforced dispatch only compiles
        # the greedy variant and the first temperature>0 request would stall
        # every slot on the sampling variant's XLA compile mid-stream.
        t0 = time.perf_counter()
        self._dispatch_chunk(infl, force_sampling=False)
        self._process_chunk(infl, [])
        self.warmup_timings["decode_greedy"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        self._dispatch_chunk(infl, force_sampling=True)
        self._process_chunk(infl, [])
        self.warmup_timings["decode_sampling"] = time.perf_counter() - t0
        # reset all device/host slot state touched by the dummies
        self.cache_seg = jnp.zeros_like(self.cache_seg)
        self.cur_tok = jnp.zeros_like(self.cur_tok)
        if self.spec_k:
            self.dec_pos = jnp.zeros_like(self.dec_pos)
            self.dec_widx = jnp.zeros_like(self.dec_widx)
            self.tok_hist = jnp.full_like(self.tok_hist, -1)
            self.spec_stats = {"verify_steps": 0, "emitted": 0}
        self.slot_len[:] = 0
        self.slot_real_len[:] = 0
        self.slot_fill_len[:] = 0
        self.slot_fill_real[:] = 0
        self.slot_req = [None] * self.num_slots

    def kernel_provenance(self) -> Dict[str, str]:
        """Which kernel implementations this engine's compiled graphs use.

        Emitted into the bench JSON / serving logs so a silent fallback (a
        fused-W8A8 compile failure flipping the env to `xla` in warmup(), or
        the decode-kernel predicate missing and landing on XLA attention)
        can never masquerade as an unexplained perf regression — the round-3
        1.98->1.20 img/s mystery was exactly such an invisible kernel-path
        change. Delegates to the dispatch predicates at their sources of
        truth (`quant.w8a8_impl_name`, `qwen2.decode_kernel_eligible`) so
        the telemetry cannot drift from the actual dispatch.
        """
        import jax

        from radvlm_tpu.models import qwen2
        from radvlm_tpu.ops import quant

        has_q = any(
            quant.is_qnode(x)
            for x in jax.tree_util.tree_leaves(
                self.params, is_leaf=quant.is_qnode
            )
        )
        if not (has_q and quant.w8a8_enabled()):
            w8a8 = "off"
        else:
            w8a8 = quant.w8a8_impl_name()
        if not qwen2.decode_kernel_eligible(
            self.cfg.text, self.max_len, self.attn_impl
        ):
            decode = "xla"
        else:
            decode = "q8" if self.kv_quant else "bf16"
        return {"w8a8_impl": w8a8, "decode_kernel": decode}

    def submit(self, sample: multimodal.MMSample,
               max_new_tokens: Optional[int] = None, *,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None,
               stream: bool = False,
               keep_kv: bool = False,
               resume: Optional[KVSnapshot] = None) -> Request:
        import jax.numpy as jnp

        if resume is not None:
            # Delta prefill on a previous turn's KV (multi-turn chat): the
            # sample holds ONLY the new turn's tokens/images. Right-padded to
            # a 128 multiple — the delta window writes cache [widx, widx+dl),
            # so the whole padded window must fit the cache.
            if self.mesh is not None:
                raise ValueError(
                    "KV resume is not supported on TP mesh engines — use a "
                    "single-device or fleet engine"
                )
            if resume.max_len != self.max_len or resume.kv_quant != self.kv_quant:
                raise ValueError(
                    "snapshot geometry mismatch: snapshot is "
                    f"(max_len={resume.max_len}, int8={resume.kv_quant}), "
                    f"engine is (max_len={self.max_len}, int8={self.kv_quant})"
                )
            if self.spec_k and resume.hist_row is None:
                raise ValueError(
                    "resuming on a spec-decoding engine needs a snapshot cut "
                    "by a spec engine (hist_row missing)"
                )
            dl = self._delta_pad_len(sample)
            if resume.widx + dl > self.max_len:
                raise ValueError(
                    f"delta pads to {dl} tokens at cache offset {resume.widx} "
                    f"but the cache holds {self.max_len} — start a fresh "
                    "conversation (full prefill)"
                )
        else:
            # Reject prompts the cache cannot hold: collate pads an over-bucket
            # prompt to its real length (rounded to 128), and once that reaches
            # max_len the prefill crashes on a negative pad — killing run() and,
            # in serving, the engine daemon thread (code-review repro). Prompts
            # between the largest bucket and max_len still work (they compile a
            # one-off fill graph for their padded length).
            largest = self.prompt_buckets[-1]
            padded = largest if sample.length <= largest else -(-sample.length // 128) * 128
            if padded > self.max_len:
                raise ValueError(
                    f"prompt pads to {padded} tokens but the cache holds "
                    f"{self.max_len} — truncate the prompt or raise max_len"
                )
        if max_new_tokens is None:
            max_new_tokens = self.gen.max_new_tokens
        # 0/negative would silently fall back (falsy) or never terminate; the
        # engine always emits the prefill token, so the effective floor is 1.
        max_new_tokens = max(1, int(max_new_tokens))
        req = Request(
            uid=next(self._uid), sample=sample,
            max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p,
            stream_q=queue.Queue() if stream else None,
            keep_kv=keep_kv, resume=resume,
        )
        # Collate + start the H2D transfer NOW (async): by the time the
        # engine loop refills a slot, the tiles are already on device.
        if resume is not None:
            host_batch = self._collate_delta(sample)
        else:
            bucket = self._bucket_for(sample.length)
            host_batch = multimodal.collate(
                [sample], pad_len=bucket, pad_tiles=self.pad_tiles,
                pad_to_multiple=128, left_pad=True,
            )
        req.real_len = int(host_batch["lengths"][0])
        if self.device is not None:
            import jax

            req.dev_batch = {
                k: jax.device_put(v, self.device) for k, v in host_batch.items()
            }
        else:
            req.dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        self.queue.put(req)
        return req

    def _bucket_for(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        return self.prompt_buckets[-1]

    @staticmethod
    def _delta_pad_len(sample: multimodal.MMSample) -> int:
        """Padded width of a resume delta window (must fit above the
        snapshot's widx — validated in submit, consumed in _collate_delta)."""
        return max(128, -(-sample.length // 128) * 128)

    def _collate_delta(self, sample: multimodal.MMSample):
        """Right-padded batch for a resume delta prefill (the window writes
        cache [widx, widx+dl), so real tokens lead and pads trail)."""
        return multimodal.collate(
            [sample], pad_len=self._delta_pad_len(sample),
            # text-only deltas skip the padded vision tower entirely
            pad_tiles=self.pad_tiles if (sample.img_src >= 0).any() else 1,
            pad_to_multiple=128, left_pad=False,
        )

    def _materialize(self, req: Request):
        """(device batch [1, L], real_len) for a request."""
        import jax.numpy as jnp

        if req.dev_batch is not None:  # pre-collated at submit()
            batch, real_len = req.dev_batch, req.real_len
            req.dev_batch = None  # release after fill
            return batch, real_len
        if req.resume is not None:  # delta prefill: right-pad (see submit)
            host_batch = self._collate_delta(req.sample)
        else:
            bucket = self._bucket_for(req.sample.length)
            host_batch = multimodal.collate(
                [req.sample], pad_len=bucket, pad_tiles=self.pad_tiles,
                pad_to_multiple=128, left_pad=True,
            )
        real_len = int(host_batch["lengths"][0])  # host-known; no sync
        if self.device is not None:
            import jax

            return {
                k: jax.device_put(v, self.device) for k, v in host_batch.items()
            }, real_len
        return {k: jnp.asarray(v) for k, v in host_batch.items()}, real_len

    def _fill_slot(self, slot: int, req: Request):
        self._fill_group([(slot, req)])

    def _fill_group(self, pairs):
        """Fill len(pairs) slots in ONE dispatch. All requests must share the
        same padded prompt length (callers group by bucket)."""
        import jax
        import jax.numpy as jnp

        if pairs[0][1].resume is not None:
            # Delta prefill (multi-turn KV reuse): always a singleton group —
            # run()'s grouping key isolates resume requests by uid.
            assert len(pairs) == 1
            self._resume_fill(*pairs[0])
            return
        mats = [self._materialize(req) for _, req in pairs]
        n = len(pairs)
        if n == 1:
            batch = mats[0][0]
        else:
            batch = {
                k: jnp.concatenate([m[0][k] for m in mats], axis=0)
                for k in mats[0][0]
            }
        l = batch["tokens"].shape[1]
        self._rng, sub = jax.random.split(self._rng)
        temps = jnp.asarray(
            [self.gen.temperature if r.temperature is None else r.temperature
             for _, r in pairs], jnp.float32,
        )
        tops = jnp.asarray(
            [self.gen.top_p if r.top_p is None else r.top_p
             for _, r in pairs], jnp.float32,
        )
        slots = jnp.asarray([s for s, _ in pairs], jnp.int32)
        if self.spec_k:
            lengths = jnp.asarray([rl for _, rl in mats], jnp.int32)
            (self.cache, self.cache_seg, self.cur_tok, self.slot_temp,
             self.slot_top_p, self.dec_pos, self.dec_widx, self.tok_hist,
             tok0) = self._fill_fn(l, n)(
                self.params, self.cache, self.cache_seg, self.cur_tok,
                self.slot_temp, self.slot_top_p, batch, slots, sub, temps,
                tops, self.dec_pos, self.dec_widx, self.tok_hist, lengths,
            )
        else:
            (self.cache, self.cache_seg, self.cur_tok, self.slot_temp,
             self.slot_top_p, tok0) = self._fill_fn(l, n)(
                self.params, self.cache, self.cache_seg, self.cur_tok,
                self.slot_temp, self.slot_top_p, batch, slots, sub, temps,
                tops,
            )
        for j, ((slot, req), (_, real_len)) in enumerate(zip(pairs, mats)):
            # Cap the request so cache writes never pass max_len: emitting N
            # tokens writes indices [l, l+N-2] (ADVICE r1: clamping the write
            # index instead corrupted output past the end of the cache).
            # Spec mode reserves spec_k extra: a verify window spans
            # [widx, widx+spec_k].
            allowed = max(1, self.max_len - l + 1 - self.spec_k)
            if req.max_new_tokens > allowed:
                req.max_new_tokens = allowed
            self.slot_req[slot] = req
            req.planned = 1  # the prefill's tok0
            self.slot_len[slot] = l  # prompt occupies [0, l) (left-padded)
            self.slot_real_len[slot] = real_len
            self.slot_fill_len[slot] = l  # KVSnapshot clean-extent anchors
            self.slot_fill_real[slot] = real_len
            # tok0 stays on device; emitted at the next chunk readback (keeps
            # the fill path free of device syncs so in-flight decode chunks
            # drain undisturbed). Stored as (group array, row): the group's
            # rows read back in one transfer at _process_chunk.
            req.tok0_dev = (tok0, j)
        tok0.copy_to_host_async()  # D2H queues behind the fill compute

    def _emit(self, slot: int, tok: int, req: Optional["Request"] = None):
        # `req` is the dispatch-snapshot owner of `slot` (eager refill can
        # hand the slot to a NEW request while this one's tokens are still in
        # flight); None = current owner (warmup / direct callers).
        if req is None:
            req = self.slot_req[slot]
        if req is None or req.done:
            return
        if req.cancelled:
            # consumer-side early stop (e.g. a stream hit its stop string):
            # free the slot here, on the engine thread
            req.done = True
        elif tok in self.gen.eos_token_ids:
            req.done = True
        else:
            req.emitted.append(tok)
            if req.stream_q is not None:
                req.stream_q.put(tok)
            if len(req.emitted) >= req.max_new_tokens:
                req.done = True
        if req.done:
            if req.keep_kv and req.error is None:
                # Snapshot BEFORE the slot is freed (a refill splices over the
                # rows). Cancelled streams still snapshot: their clean extent
                # is prompt + whatever was emitted, a valid conversation
                # prefix for the next turn. keep_kv requests are never
                # eagerly refilled, so the slot still holds their cache rows.
                self._take_snapshot(slot, req)
            if self.slot_req[slot] is req:  # eager refill may own it already
                self.slot_req[slot] = None
            if req.stream_q is not None:
                req.stream_q.put(None)  # end-of-stream sentinel

    def fail_all(self, error_msg: str, on_each=None) -> List["Request"]:
        """Fail every in-flight AND still-queued request EXPLICITLY (error +
        done + end-of-stream sentinel) and clear the slots — the crash
        recovery both serving loops (serve/batch_worker.py engine loop,
        serve/fleet.py per-engine loop) run so waiters never present
        truncated emissions or silent-empty text as success. `on_each` is
        invoked per failed request (completion signalling)."""
        failed = [r for r in self.slot_req if r is not None]
        self.slot_req = [None] * self.num_slots
        while True:
            try:
                failed.append(self.queue.get_nowait())
            except queue.Empty:
                break
        for req in failed:
            req.error = error_msg
            req.done = True
            if req.stream_q is not None:
                req.stream_q.put(None)
            if on_each is not None:
                on_each(req)
        return failed

    def _sampling_active(self) -> bool:
        """True when any active slot needs the sampling chunk variant."""
        for r in self.slot_req:
            if r is None:
                continue
            t = self.gen.temperature if r.temperature is None else r.temperature
            if t > 0.0:
                return True
        return False

    def _active(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req) if r is not None]

    def _dispatch_chunk(self, inflight, force_sampling: Optional[bool] = None) -> None:
        """Queue one K-step decode chunk on the device (no host sync).

        The chunk covers ALL slots (inactive ones compute garbage under
        segment id 0, discarded at readback). Host counters advance
        immediately — they describe the device-side state after the chunk."""
        import jax
        import jax.numpy as jnp

        self._rng, sub = jax.random.split(self._rng)
        sampling = (
            self._sampling_active() if force_sampling is None else force_sampling
        )
        step_fn = self._step_fns[sampling]
        counts = None
        if self.spec_k:
            # Positions/write indices live on DEVICE in spec mode (the accept
            # counts are data-dependent; host mirrors would need a readback).
            (self.cache, self.cache_seg, self.cur_tok, self.dec_pos,
             self.dec_widx, self.tok_hist, toks, counts) = step_fn(
                self.params, self.cache, self.cache_seg, self.cur_tok,
                self.dec_pos, self.dec_widx, self.tok_hist,
                self.slot_temp, self.slot_top_p, sub,
            )
        else:
            positions = np.minimum(self.slot_real_len, 2 ** 30).astype(np.int32)
            # Active slots never pass max_len (capped at fill time); inactive
            # slots decode garbage, so clamping their stale index is harmless.
            write_idx = np.minimum(
                self.slot_len, self.max_len - 1
            ).astype(np.int32)
            self.cache, self.cache_seg, self.cur_tok, toks = step_fn(
                self.params, self.cache, self.cache_seg, self.cur_tok,
                jnp.asarray(positions), jnp.asarray(write_idx),
                self.slot_temp, self.slot_top_p, sub,
            )
        self.slot_len += self.steps_per_sync
        self.slot_real_len += self.steps_per_sync
        # Snapshot (slot, req) pairs: readback emits to the SNAPSHOT request
        # — device order guarantees a chunk dispatched before any later
        # refill of the slot holds that request's valid tokens.
        snapshot = [
            (i, r) for i, r in enumerate(self.slot_req) if r is not None
        ]
        if not self.spec_k:
            # EAGER REFILL: once every remaining token of a request rides a
            # dispatched chunk, free the slot NOW instead of stranding it for
            # (pipeline_depth+1) chunk readbacks (measured: steps_per_sync 32
            # at 1.80 vs 16 at 2.07 img/s — stranded-slot lag scales with
            # chunk size). The in-flight tokens are emitted from the snapshot.
            # keep_kv requests are exempt: their KV snapshot is cut from the
            # slot's cache rows at completion, which a refill would overwrite.
            # Spec mode is exempt: accepted counts are data-dependent, so the
            # host cannot know when a request's tokens are covered.
            for i, r in snapshot:
                r.planned += self.steps_per_sync
                if (
                    not r.keep_kv
                    and r.planned >= r.max_new_tokens
                    and self.slot_req[i] is r
                ):
                    self.slot_req[i] = None
        # Start the D2H transfer the moment the chunk's compute finishes
        # instead of when the host drains it — the readback wait then covers
        # compute only, and the emit/readback phases overlap the copy.
        toks.copy_to_host_async()
        if counts is not None:
            counts.copy_to_host_async()
        inflight.append((toks, counts, snapshot))

    def _process_chunk(self, inflight, finished) -> None:
        """Read back the OLDEST in-flight chunk and emit its tokens."""
        toks_dev, counts_dev, snapshot = inflight.popleft()
        # chunks dispatched AFTER the one being read back — _take_snapshot's
        # "was the final emitted token fed" signal in spec mode
        self._chunks_in_flight = len(inflight)
        t0 = time.perf_counter()
        toks = np.asarray(toks_dev)  # waits for this chunk only (async queue)
        counts = None if counts_dev is None else np.asarray(counts_dev)
        # tok0 group arrays: ONE host transfer per fill group (the whole
        # group was filled in one dispatch and copy_to_host_async'd), cached
        # by array identity so group members share the fetch.
        tok0_host: Dict[int, np.ndarray] = {}
        for _, req in snapshot:
            if req.tok0_dev is not None and not req.done:
                arr = req.tok0_dev[0]
                if id(arr) not in tok0_host:
                    tok0_host[id(arr)] = np.asarray(arr)
        t1 = time.perf_counter()
        self.host_stats["readback"] += t1 - t0
        for slot, req in snapshot:
            if req.done:
                continue  # finished at an earlier readback
            if req.tok0_dev is not None:
                # Prefill token: device work long done by now (it was queued
                # before this chunk), so this read is latency-only.
                arr, row = req.tok0_dev
                t0 = int(tok0_host[id(arr)][row])
                req.tok0_dev = None
                self._emit(slot, t0, req)
            if counts is None:
                for t in toks[slot]:
                    if req.done:
                        break
                    self._emit(slot, int(t), req)
            else:
                # Spec chunk: toks [B, K, spec_k+1]; step emits the first
                # counts[slot, step] predictions (accepted prefix + 1).
                for step in range(toks.shape[1]):
                    if req.done:
                        break
                    n = int(counts[slot, step])
                    self.spec_stats["verify_steps"] += 1
                    before = len(req.emitted)
                    for t in toks[slot, step, :n]:
                        if req.done:
                            break
                        self._emit(slot, int(t), req)
                    # count ACTUAL emissions (eos/max_new can cut the window)
                    self.spec_stats["emitted"] += len(req.emitted) - before
            if req.done:
                finished.append(req)
        self.host_stats["emit"] += time.perf_counter() - t1
        self.host_stats["chunks"] += 1

    def run(self) -> Iterator[Request]:
        """Process the queue to completion, yielding finished requests.

        Software-pipelined decode loop (the serving engine's core): up to
        `pipeline_depth` K-step chunks stay in flight on the device while the
        host reads back and postprocesses older chunks, so the device never
        idles on a host round-trip (the reference's HF `generate` loop syncs
        every token; over a network-attached accelerator that is the dominant
        cost). A slot whose request finishes mid-chunk decodes garbage until
        the readback catches it (<= (pipeline_depth+1) * steps_per_sync steps)
        — wasted compute, never corrupt output, since emissions stop at eos /
        max_new_tokens and refills overwrite the slot's cache wholesale."""
        import collections

        inflight: "collections.deque" = collections.deque()
        finished: List[Request] = []
        while not self.queue.empty() or self._active() or inflight:
            # Refill empty slots (device ops only; no sync). Same-bucket
            # requests group into one multi-row prefill dispatch (up to
            # fill_batch rows).
            empties = [
                i for i, r in enumerate(self.slot_req) if r is None
            ]
            taken: List[Request] = []
            while len(taken) < len(empties) and not self.queue.empty():
                try:
                    req = self.queue.get_nowait()
                except queue.Empty:
                    break
                if req.cancelled:  # cancelled while still queued: never fill
                    req.done = True
                    if req.stream_q is not None:
                        req.stream_q.put(None)
                    finished.append(req)
                    continue
                taken.append(req)
            if taken:
                t0 = time.perf_counter()
                by_len: Dict[Any, List[Request]] = {}
                for req in taken:
                    if req.resume is not None:
                        # delta prefill: always its own singleton dispatch
                        l = ("resume", req.uid)
                    elif req.dev_batch is not None:
                        l = req.dev_batch["tokens"].shape[1]
                    else:
                        # not pre-collated: padded length unknown until
                        # collate — force a singleton group
                        l = ("solo", req.uid)
                    by_len.setdefault(l, []).append(req)
                for reqs in by_len.values():
                    for s in range(0, len(reqs), self.fill_batch):
                        group = reqs[s:s + self.fill_batch]
                        self._fill_group(
                            [(empties.pop(0), r) for r in group]
                        )
                self.host_stats["fill"] += time.perf_counter() - t0
                self.host_stats["fills"] += len(taken)
            if self._active():
                t0 = time.perf_counter()
                self._dispatch_chunk(inflight)
                self.host_stats["dispatch"] += time.perf_counter() - t0
            # Drain the pipeline: one chunk per iteration in steady state
            # (keeping `pipeline_depth` queued), everything once idle.
            while inflight and (
                len(inflight) > self.pipeline_depth or not self._active()
            ):
                self._process_chunk(inflight, finished)
            for r in finished:
                yield r
            finished = []
