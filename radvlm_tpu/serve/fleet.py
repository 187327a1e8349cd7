"""Device-fleet serving: one continuous engine per chip (or per TP submesh).

The reference serves one model instance per GPU, each a separate worker
process registered with the controller (`finetuning/llava/serve/
model_worker.py`, `sglang_worker.py` + the controller's lottery/shortest-queue
dispatch), and evaluates data-parallel with one model per GPU process
(`radvlm/evaluation/evaluate_instructions.py:231-266`). On a TPU host with N
local chips the natural analog is a single process owning N engines: params
are replicated per device (or sharded over a per-group TP submesh), each
engine runs its own slot-refilled `ContinuousBatcher`, and requests route to
the least-loaded engine. `fleet_size x tp_size = len(devices)` — a v5e-8
serves 7B as 8 x TP1 (max throughput), 4 x TP2, or 2 x TP4 (lower
per-request latency); with int4 weights, 8 x TP1 fits 7B per chip.

Failure isolation matches the reference's worker-expiry contract: an engine
whose dispatch loop raises fails ITS in-flight + queued requests explicitly
(never silent-empty success) and keeps serving; the other engines are
untouched.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Any, Callable, Iterator, List, Optional, Sequence

from radvlm_tpu.generation.continuous import ContinuousBatcher, Request
from radvlm_tpu.generation.engine import GenerationConfig

log = logging.getLogger(__name__)


class FleetEngine:
    """N continuous batchers + N dispatch threads behind one submit()."""

    def __init__(
        self,
        params: Any,
        cfg: Any,
        gen: GenerationConfig,
        *,
        devices: Optional[Sequence[Any]] = None,
        tp_size: int = 1,
        on_complete: Optional[Callable[[Request], None]] = None,
        **batcher_kw: Any,
    ):
        import jax

        devices = list(devices if devices is not None else jax.local_devices())
        if tp_size < 1 or len(devices) % tp_size:
            raise ValueError(
                f"{len(devices)} devices do not split into TP groups of {tp_size}"
            )
        self.tp_size = tp_size
        self.batchers: List[ContinuousBatcher] = []
        for g in range(0, len(devices), tp_size):
            group = devices[g:g + tp_size]
            if tp_size == 1:
                b = ContinuousBatcher(
                    params, cfg, gen, device=group[0], **batcher_kw
                )
            else:
                import numpy as np

                mesh = jax.sharding.Mesh(np.asarray(group), ("tensor",))
                b = ContinuousBatcher(params, cfg, gen, mesh=mesh, **batcher_kw)
            self.batchers.append(b)
        # One uid stream across the fleet: every batcher starts its own
        # counter at 1, and completion tracking / caller-side metadata is
        # keyed by uid.
        import itertools

        shared_uids = itertools.count(1)
        for b in self.batchers:
            b._uid = shared_uids
        self._on_complete = on_complete
        self._done: "queue.Queue[Request]" = queue.Queue()
        self._pending: set = set()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []

    # ------------------------------------------------------------------
    def warmup(self) -> None:
        for b in self.batchers:
            b.warmup()

    def start(self) -> "FleetEngine":
        """Spawn one dispatch thread per engine (device waits release the
        GIL, so N engines genuinely overlap on N chips)."""
        if self._threads:
            return self
        for i, b in enumerate(self.batchers):
            t = threading.Thread(
                target=self._loop, args=(i, b), daemon=True,
                name=f"fleet-engine-{i}",
            )
            t.start()
            self._threads.append(t)
        return self

    def _loop(self, idx: int, b: ContinuousBatcher) -> None:
        backoff = 0.0
        while not self._stop.is_set():
            progressed = False
            try:
                for req in b.run():
                    progressed = True
                    self._complete(req)
                backoff = 0.0
            except Exception as e:  # engine crash must not kill the fleet
                # capped exponential backoff: a persistently-broken engine
                # must not spin a core / spam a traceback every few ms
                backoff = min(max(backoff * 2, 0.05), 2.0)
                log.exception(
                    "fleet engine %d error; retrying in %.2fs", idx, backoff
                )
                for req in list(b.slot_req):
                    if req is not None:
                        req.error = f"engine {idx} error: {e}"
                        req.done = True
                        if req.stream_q is not None:
                            req.stream_q.put(None)
                        self._complete(req)
                b.slot_req = [None] * b.num_slots
                while True:
                    try:
                        req = b.queue.get_nowait()
                    except queue.Empty:
                        break
                    req.error = f"engine {idx} error: {e}"
                    req.done = True
                    if req.stream_q is not None:
                        req.stream_q.put(None)
                    self._complete(req)
            if not progressed:
                time.sleep(backoff or 0.002)

    def _complete(self, req: Request) -> None:
        # Deliver BEFORE clearing pending: drain() exits on "no pending and
        # done-queue empty", so the opposite order could drop the final
        # request (pending cleared, put not yet visible).
        if self._on_complete is not None:
            self._on_complete(req)
        else:
            self._done.put(req)
        with self._lock:
            self._pending.discard(req.uid)

    # ------------------------------------------------------------------
    def _load(self, b: ContinuousBatcher) -> int:
        return b.queue.qsize() + len(b._active())

    def submit(self, sample, **kw) -> Request:
        """Route to the least-loaded engine (the controller's shortest-queue
        policy, applied intra-process)."""
        b = min(self.batchers, key=self._load)
        req = b.submit(sample, **kw)
        with self._lock:
            self._pending.add(req.uid)
        return req

    def queue_length(self) -> int:
        return sum(self._load(b) for b in self.batchers)

    def drain(self, timeout: float = 600.0) -> Iterator[Request]:
        """Yield completed requests until none are pending (eval usage; only
        valid when on_complete is None). start() must have been called."""
        deadline = time.time() + timeout
        while True:
            with self._lock:
                n_pending = len(self._pending)
            if n_pending == 0 and self._done.empty():
                return
            try:
                # short poll once nothing is pending (a just-yielded request's
                # pending entry clears moments after its put — see _complete)
                wait = 0.05 if n_pending == 0 else 1.0
                yield self._done.get(
                    timeout=max(0.01, min(wait, deadline - time.time()))
                )
            except queue.Empty:
                if time.time() >= deadline:
                    raise TimeoutError(
                        f"fleet drain timed out with {n_pending} pending"
                    )

    def shutdown(self, join_timeout: float = 30.0) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=join_timeout)
