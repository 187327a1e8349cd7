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
class Request:
    uid: int
    sample: multimodal.MMSample
    max_new_tokens: int
    emitted: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    # First token (sampled from the prefill logits), kept as a DEVICE scalar
    # until the next chunk readback so _fill_slot never blocks on the device
    # (reading it eagerly would stall the pipelined decode queue).
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
    # Per-request sampling params (None -> the engine GenerationConfig's).
    temperature: Optional[float] = None
    top_p: Optional[float] = None


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
    ):
        import os

        import jax
        import jax.numpy as jnp

        self.params = params
        self.cfg = cfg
        self.gen = gen
        self.num_slots = num_slots
        self.max_len = max_len
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

        # Device state.
        self.cache = (
            qwen2.init_kv_cache_q8(cfg.text, num_slots, max_len)
            if self.kv_quant
            else qwen2.init_kv_cache(cfg.text, num_slots, max_len)
        )
        self.cache_seg = jnp.zeros((num_slots, max_len), jnp.int32)
        self.cur_tok = jnp.zeros((num_slots,), jnp.int32)
        # per-slot sampling params (requests may override the engine default)
        self.slot_temp = jnp.full((num_slots,), gen.temperature, jnp.float32)
        self.slot_top_p = jnp.full((num_slots,), gen.top_p, jnp.float32)
        # Host slot state (incremental counters — no per-step device readback
        # or O(slots x max_len) scans).
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_len = np.zeros((num_slots,), np.int64)  # tokens in cache
        self.slot_real_len = np.zeros((num_slots,), np.int64)  # excl. left pad
        self.queue: "queue.Queue[Request]" = queue.Queue()
        self._uid = itertools.count(1)  # thread-safe-enough uid source

        self._fill_fns: Dict[int, Callable] = {}
        self._step_fns = self._build_step()

    # ------------------------------------------------------------------
    def _build_step(self):
        import jax
        import jax.numpy as jnp

        cfg = self.cfg

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

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step_chunk(params, cache, cache_seg, tok, positions, write_idx,
                           slot_temp, slot_top_p, rng):
                b = tok.shape[0]

                def body(carry, k):
                    cache, cache_seg, tok, positions, write_idx, rng = carry
                    cache_seg = cache_seg.at[jnp.arange(b), write_idx].set(1)
                    embeds = qwen2.embed_tokens(params["text"], tok[:, None])
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

                (cache, cache_seg, tok, _, _, _), toks = jax.lax.scan(
                    body,
                    (cache, cache_seg, tok, positions, write_idx, rng),
                    jnp.arange(K),
                )
                return cache, cache_seg, tok, jnp.swapaxes(toks, 0, 1)

            return step_chunk

        return {False: make_chunk(False), True: make_chunk(True)}

    def _fill_fn(self, bucket: int):
        """ONE jitted dispatch per refill: prefill the prompt, sample the
        first token, splice cache/segments into the slot, set cur_tok.
        (Separate prefill/sample/insert/set calls each pay a dispatch
        round-trip to a network-attached device; fused they cost one.)"""
        import jax
        import jax.numpy as jnp

        if bucket not in self._fill_fns:
            cfg, attn_impl, max_len = self.cfg, self.attn_impl, self.max_len
            gen = self.gen
            cache_format = "int8" if self.kv_quant else "bf16"

            @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
            def fill(params, shared_cache, cache_seg, cur_tok, slot_temp,
                     slot_top_p, batch, slot, rng, temp, top_p):
                cache1, seg1, last_logits = prefill(
                    params, cfg, batch, max_len, attn_impl=attn_impl,
                    cache_format=cache_format,
                )
                tok0 = sample_token_vec(
                    last_logits, temp[None], top_p[None], rng,
                    top_k=gen.top_k,
                )[0]
                slot_temp = slot_temp.at[slot].set(temp)
                slot_top_p = slot_top_p.at[slot].set(top_p)
                # Splice every cache component into the slot. Offset
                # (0, slot, 0, 0) is correct for both layouts: slot is dim 1
                # of the int8 k/v [L, B, S, Hkv*D] AND the scales
                # [L, B, Hkv, S].
                new_cache = tuple(
                    jax.lax.dynamic_update_slice(sh, nw, (0, slot, 0, 0))
                    for sh, nw in zip(shared_cache, cache1)
                )
                cache_seg = jax.lax.dynamic_update_slice(
                    cache_seg, seg1, (slot, 0)
                )
                cur_tok = cur_tok.at[slot].set(tok0)
                return new_cache, cache_seg, cur_tok, slot_temp, slot_top_p, tok0

            self._fill_fns[bucket] = fill
        return self._fill_fns[bucket]

    # ------------------------------------------------------------------
    def warmup(self) -> None:
        """Compile every prompt-bucket fill graph + the decode chunk up front.

        Call once after construction (serving startup / bench warmup): a
        bucket whose first request arrives mid-stream would otherwise stall
        the pipeline for its XLA compile. Uses a text-only dummy sample per
        bucket and resets all slot state afterwards."""
        import collections

        import jax
        import jax.numpy as jnp

        for bucket in self.prompt_buckets:
            sample = multimodal.build_sample(list(range(2, 8)), [], self.cfg)
            hb = multimodal.collate(
                [sample], pad_len=bucket, pad_tiles=self.pad_tiles,
                pad_to_multiple=128, left_pad=True,
            )
            batch = {k: jnp.asarray(v) for k, v in hb.items()}
            l = batch["tokens"].shape[1]
            self._rng, sub = jax.random.split(self._rng)
            (self.cache, self.cache_seg, self.cur_tok, self.slot_temp,
             self.slot_top_p, _) = self._fill_fn(l)(
                self.params, self.cache, self.cache_seg, self.cur_tok,
                self.slot_temp, self.slot_top_p, batch, 0, sub,
                jnp.float32(self.gen.temperature), jnp.float32(self.gen.top_p),
            )
        infl: "collections.deque" = collections.deque()
        # Compile BOTH decode-chunk variants: with no active slots
        # _sampling_active() is False, so an unforced dispatch only compiles
        # the greedy variant and the first temperature>0 request would stall
        # every slot on the sampling variant's XLA compile mid-stream.
        self._dispatch_chunk(infl, force_sampling=False)
        self._dispatch_chunk(infl, force_sampling=True)
        self._process_chunk(infl, [])
        self._process_chunk(infl, [])
        # reset all device/host slot state touched by the dummies
        self.cache_seg = jnp.zeros_like(self.cache_seg)
        self.cur_tok = jnp.zeros_like(self.cur_tok)
        self.slot_len[:] = 0
        self.slot_real_len[:] = 0
        self.slot_req = [None] * self.num_slots

    def submit(self, sample: multimodal.MMSample,
               max_new_tokens: Optional[int] = None, *,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None) -> Request:
        import jax.numpy as jnp

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
        )
        # Collate + start the H2D transfer NOW (async): by the time the
        # engine loop refills a slot, the tiles are already on device.
        bucket = self._bucket_for(sample.length)
        host_batch = multimodal.collate(
            [sample], pad_len=bucket, pad_tiles=self.pad_tiles,
            pad_to_multiple=128, left_pad=True,
        )
        req.real_len = int(host_batch["lengths"][0])
        req.dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        self.queue.put(req)
        return req

    def _bucket_for(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        return self.prompt_buckets[-1]

    def _fill_slot(self, slot: int, req: Request):
        import jax
        import jax.numpy as jnp

        if req.dev_batch is not None:  # pre-collated at submit()
            batch, real_len = req.dev_batch, req.real_len
            req.dev_batch = None  # release after fill
        else:
            bucket = self._bucket_for(req.sample.length)
            host_batch = multimodal.collate(
                [req.sample], pad_len=bucket, pad_tiles=self.pad_tiles,
                pad_to_multiple=128, left_pad=True,
            )
            real_len = int(host_batch["lengths"][0])  # host-known; no sync
            batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        l = batch["tokens"].shape[1]
        self._rng, sub = jax.random.split(self._rng)
        temp = self.gen.temperature if req.temperature is None else req.temperature
        top_p = self.gen.top_p if req.top_p is None else req.top_p
        (self.cache, self.cache_seg, self.cur_tok, self.slot_temp,
         self.slot_top_p, tok0) = self._fill_fn(l)(
            self.params, self.cache, self.cache_seg, self.cur_tok,
            self.slot_temp, self.slot_top_p, batch, slot, sub,
            jnp.float32(temp), jnp.float32(top_p),
        )
        # Cap the request so cache writes never pass max_len: emitting N tokens
        # writes indices [l, l+N-2] (ADVICE r1: clamping the write index
        # instead corrupted output past the end of the cache).
        allowed = max(1, self.max_len - l + 1)
        if req.max_new_tokens > allowed:
            req.max_new_tokens = allowed
        self.slot_req[slot] = req
        self.slot_len[slot] = l  # prompt occupies [0, l) (left-padded)
        self.slot_real_len[slot] = real_len
        # tok0 stays on device; emitted at the next chunk readback (keeps the
        # fill path free of device syncs so in-flight decode chunks drain
        # undisturbed).
        req.tok0_dev = tok0

    def _emit(self, slot: int, tok: int):
        req = self.slot_req[slot]
        if req is None or req.done:
            return
        if tok in self.gen.eos_token_ids:
            req.done = True
        else:
            req.emitted.append(tok)
            if len(req.emitted) >= req.max_new_tokens:
                req.done = True
        if req.done:
            self.slot_req[slot] = None

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

        positions = np.minimum(self.slot_real_len, 2 ** 30).astype(np.int32)
        # Active slots never pass max_len (capped at fill time); inactive
        # slots decode garbage, so clamping their stale index is harmless.
        write_idx = np.minimum(self.slot_len, self.max_len - 1).astype(np.int32)
        self._rng, sub = jax.random.split(self._rng)
        sampling = (
            self._sampling_active() if force_sampling is None else force_sampling
        )
        step_fn = self._step_fns[sampling]
        self.cache, self.cache_seg, self.cur_tok, toks = step_fn(
            self.params, self.cache, self.cache_seg, self.cur_tok,
            jnp.asarray(positions), jnp.asarray(write_idx),
            self.slot_temp, self.slot_top_p, sub,
        )
        self.slot_len += self.steps_per_sync
        self.slot_real_len += self.steps_per_sync
        # Snapshot (slot, req) pairs: at readback, a slot refilled since this
        # dispatch is detected by identity mismatch and its tokens discarded.
        snapshot = [
            (i, r) for i, r in enumerate(self.slot_req) if r is not None
        ]
        inflight.append((toks, snapshot))

    def _process_chunk(self, inflight, finished) -> None:
        """Read back the OLDEST in-flight chunk and emit its tokens."""
        toks_dev, snapshot = inflight.popleft()
        toks = np.asarray(toks_dev)  # waits for this chunk only (async queue)
        for slot, req in snapshot:
            if req.done or self.slot_req[slot] is not req:
                continue  # finished earlier or slot since refilled
            if req.tok0_dev is not None:
                # Prefill token: device work long done by now (it was queued
                # before this chunk), so this read is latency-only.
                t0 = int(np.asarray(req.tok0_dev))
                req.tok0_dev = None
                self._emit(slot, t0)
            for t in toks[slot]:
                if req.done:
                    break
                self._emit(slot, int(t))
            if req.done:
                finished.append(req)

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
            # Refill empty slots (device ops only; no sync).
            for slot in range(self.num_slots):
                if self.slot_req[slot] is None and not self.queue.empty():
                    self._fill_slot(slot, self.queue.get())
            if self._active():
                self._dispatch_chunk(inflight)
            # Drain the pipeline: one chunk per iteration in steady state
            # (keeping `pipeline_depth` queued), everything once idle.
            while inflight and (
                len(inflight) > self.pipeline_depth or not self._active()
            ):
                self._process_chunk(inflight, finished)
            for r in finished:
                yield r
            finished = []
