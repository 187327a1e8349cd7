"""Worker-side conversation KV sessions (multi-turn prefix reuse).

The reference's chat stack is stateless below the UI: every gradio turn
re-sends the full conversation and the worker re-prefills it from scratch
(`finetuning/llava/serve/model_worker.py:141-183` builds HF `generate`
inputs from the whole prompt; conversation state lives in
`gradio_web_server.py`'s per-session `state`). At RadVLM shapes that is
~3.4k anyres tokens + a vision-tower pass per turn for a prefix that has
not changed.

Here the batch worker keeps an LRU of `KVSnapshot`s keyed by the client's
`session_id`: turn N's request tokenizes the full prompt, matches it against
the stored (prompt + reply) token prefix, and — on an exact prefix match —
submits ONLY the delta tokens with `resume=` (a windowed cached prefill at
the recorded cache offset, `generation/continuous.py`). Any mismatch
(retokenization drift, edited history, different worker) falls back to the
normal full prefill, so reuse is purely an optimization and never changes
output: the resumed stream is token-for-token the full-prefill stream
(tests/test_kv_resume.py).

Memory: one 7B snapshot is ~0.12 GB (int8 KV) / ~0.24 GB (bf16) of HBM for a
4k cache, so the store is capped (RADVLM_SESSION_CAP, default 4) and evicts
least-recently-used — an evicted conversation just pays full prefill again.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import threading
from collections import OrderedDict
from typing import List, Optional, Sequence, Tuple

import numpy as np

from radvlm_tpu.config import IMAGE_TOKEN_INDEX


def image_hash(img: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(str(getattr(img, "shape", None)).encode())
    h.update(np.ascontiguousarray(img).tobytes())
    return h.hexdigest()


@dataclasses.dataclass
class Session:
    ids: List[int]  # unexpanded prompt ids + emitted reply ids
    img_hashes: List[str]
    snapshot: object  # generation.continuous.KVSnapshot


class SessionStore:
    """Thread-safe LRU of conversation snapshots."""

    def __init__(self, cap: Optional[int] = None):
        if cap is None:
            cap = int(os.environ.get("RADVLM_SESSION_CAP", "4"))
        self.cap = cap
        self._d: "OrderedDict[str, Session]" = OrderedDict()
        self._lock = threading.Lock()

    def get(self, sid: str) -> Optional[Session]:
        with self._lock:
            ent = self._d.get(sid)
            if ent is not None:
                self._d.move_to_end(sid)
            return ent

    def put(self, sid: str, ent: Session) -> None:
        with self._lock:
            self._d[sid] = ent
            self._d.move_to_end(sid)
            while len(self._d) > self.cap:
                self._d.popitem(last=False)  # LRU eviction frees HBM rows

    def drop(self, sid: str) -> None:
        with self._lock:
            self._d.pop(sid, None)

    def __len__(self) -> int:
        with self._lock:
            return len(self._d)


def split_delta(
    ent: Session, ids: Sequence[int], img_hashes: Sequence[str]
) -> Optional[Tuple[List[int], int]]:
    """(delta ids, first-new-image index) when the new request extends the
    stored conversation exactly; None -> caller must full-prefill.

    Match is at the unexpanded-token level (image sentinels count as one id)
    plus image-content hashes: retokenization drift across the reply
    boundary, edited history, or swapped images all miss and fall back."""
    n = len(ent.ids)
    k = len(ent.img_hashes)
    if len(ids) <= n or list(ids[:n]) != list(ent.ids):
        return None
    if list(img_hashes[:k]) != list(ent.img_hashes):
        return None
    delta = list(ids[n:])
    # every image in the delta must be a NEW image (prefix images are in KV)
    if sum(1 for t in delta if t == IMAGE_TOKEN_INDEX) != len(img_hashes) - k:
        return None
    return delta, k
