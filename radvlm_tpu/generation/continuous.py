"""Continuous batching: slot-based always-full decode over a shared KV cache.

The reference serves one request per worker thread and evaluates at batch size 1
per GPU (`model_worker.py`, `evaluate_instructions.py:240-251`). For TPU
throughput (BASELINE.json config 4), this engine keeps a fixed batch of B slots
decoding every step and refills finished slots from a request queue without
disturbing the others:

- the shared cache is the framework's stacked [L, B, Smax, Hkv*D] layout; a new
  request prefills in a batch-1 jit (vision tower + prompt) into a fresh cache
  that is spliced into its slot with one dynamic_update_slice per k/v;
- the decode step runs ALL slots with per-slot write indices and rope positions
  (scatter writes in `qwen2._block_cached`, segment-id masking in the Pallas
  decode kernel — inactive slots carry segment id 0 everywhere and decode
  garbage harmlessly);
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
from radvlm_tpu.generation.engine import GenerationConfig, prefill, sample_token
from radvlm_tpu.models import multimodal, qwen2


@dataclasses.dataclass
class Request:
    uid: int
    sample: multimodal.MMSample
    max_new_tokens: int
    emitted: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


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
    ):
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
        self._rng = jax.random.key(seed)

        # Device state.
        self.cache = qwen2.init_kv_cache(cfg.text, num_slots, max_len)
        self.cache_seg = jnp.zeros((num_slots, max_len), jnp.int32)
        self.cur_tok = jnp.zeros((num_slots,), jnp.int32)
        # Host slot state (incremental counters — no per-step device readback
        # or O(slots x max_len) scans).
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_len = np.zeros((num_slots,), np.int64)  # tokens in cache
        self.slot_real_len = np.zeros((num_slots,), np.int64)  # excl. left pad
        self.queue: "queue.Queue[Request]" = queue.Queue()
        self._uid = itertools.count(1)  # thread-safe-enough uid source

        self._prefill_fns: Dict[int, Callable] = {}
        self._step_fn = self._build_step()
        self._insert_fn = jax.jit(self._insert_impl, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _build_step(self):
        import jax
        import jax.numpy as jnp

        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, cache_seg, tok, positions, write_idx, rng):
            b = tok.shape[0]
            cache_seg = cache_seg.at[jnp.arange(b), write_idx].set(1)
            embeds = qwen2.embed_tokens(params["text"], tok[:, None])
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
            nxt = sample_token(logits[:, 0], self.gen, rng)
            return cache, cache_seg, nxt

        return step

    @staticmethod
    def _insert_impl(shared_cache, new_cache, cache_seg, new_seg_row, slot):
        import jax
        import jax.numpy as jnp

        ck, cv = shared_cache
        nk, nv = new_cache
        ck = jax.lax.dynamic_update_slice(ck, nk, (0, slot, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, nv, (0, slot, 0, 0))
        cache_seg = jax.lax.dynamic_update_slice(
            cache_seg, new_seg_row[None], (slot, 0)
        )
        return (ck, cv), cache_seg

    def _prefill_fn(self, bucket: int):
        import jax

        if bucket not in self._prefill_fns:
            cfg, attn_impl, max_len = self.cfg, self.attn_impl, self.max_len

            @jax.jit
            def pf(params, batch):
                return prefill(params, cfg, batch, max_len, attn_impl=attn_impl)

            self._prefill_fns[bucket] = pf
        return self._prefill_fns[bucket]

    # ------------------------------------------------------------------
    def submit(self, sample: multimodal.MMSample,
               max_new_tokens: Optional[int] = None) -> Request:
        req = Request(
            uid=next(self._uid), sample=sample,
            max_new_tokens=max_new_tokens or self.gen.max_new_tokens,
        )
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

        bucket = self._bucket_for(req.sample.length)
        batch = multimodal.collate(
            [req.sample], pad_len=bucket, pad_tiles=self.pad_tiles,
            pad_to_multiple=128, left_pad=True,
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        l = batch["tokens"].shape[1]
        cache1, seg1, last_logits = self._prefill_fn(l)(self.params, batch)
        self._rng, sub = jax.random.split(self._rng)
        tok0 = sample_token(last_logits, self.gen, sub)

        self.cache, self.cache_seg = self._insert_fn(
            self.cache, cache1, self.cache_seg, seg1[0], slot
        )
        # Cap the request so cache writes never pass max_len: emitting N tokens
        # writes indices [l, l+N-2] (ADVICE r1: clamping the write index
        # instead corrupted output past the end of the cache).
        allowed = max(1, self.max_len - l + 1)
        if req.max_new_tokens > allowed:
            req.max_new_tokens = allowed
        self.slot_req[slot] = req
        self.slot_len[slot] = l  # prompt occupies [0, l) (left-padded)
        self.slot_real_len[slot] = int(np.asarray(seg1[0]).sum())
        self.cur_tok = self.cur_tok.at[slot].set(tok0[0])
        self._emit(slot, int(tok0[0]))

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

    def _active(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req) if r is not None]

    def run(self) -> Iterator[Request]:
        """Process the queue to completion, yielding finished requests."""
        import jax
        import jax.numpy as jnp

        pending_done: List[Request] = []
        while not self.queue.empty() or self._active():
            # Refill empty slots.
            for slot in range(self.num_slots):
                if self.slot_req[slot] is None and not self.queue.empty():
                    req = self.queue.get()
                    self._fill_slot(slot, req)
                    if req.done:  # 1-token request edge case
                        pending_done.append(req)
            active = self._active()
            if not active:
                for r in pending_done:
                    yield r
                pending_done = []
                continue

            # One decode step for ALL slots (inactive ones compute garbage
            # under segment-id 0, discarded on emit).
            # Each slot's new token was emitted at output position
            # len(emitted)-1; its rope position is prompt_real_len + that, its
            # cache slot is slot_len (the next free index).
            positions = self.slot_real_len.astype(np.int32)
            # Active slots never pass max_len (capped at fill time); inactive
            # slots decode garbage, so clamping their stale index is harmless.
            write_idx = np.minimum(self.slot_len, self.max_len - 1).astype(np.int32)
            for i in active:
                assert self.slot_len[i] < self.max_len, (i, self.slot_len[i])
            self._rng, sub = jax.random.split(self._rng)
            self.cache, self.cache_seg, nxt = self._step_fn(
                self.params, self.cache, self.cache_seg, self.cur_tok,
                jnp.asarray(positions), jnp.asarray(write_idx), sub,
            )
            nxt_host = np.asarray(nxt)
            for i in active:
                self.slot_len[i] += 1
                self.slot_real_len[i] += 1
                req = self.slot_req[i]
                self._emit(i, int(nxt_host[i]))
                if req.done:
                    pending_done.append(req)
            self.cur_tok = nxt
            for r in pending_done:
                yield r
            pending_done = []
