"""Device-fleet serving: one continuous engine per chip (or per TP submesh).

The reference serves one model instance per GPU, each a separate worker
process registered with the controller (`finetuning/llava/serve/
model_worker.py`, `sglang_worker.py` + the controller's lottery/shortest-queue
dispatch), and evaluates data-parallel with one model per GPU process
(`radvlm/evaluation/evaluate_instructions.py:231-266`). On a TPU host with N
local chips the natural analog is a single process owning N engines: params
are replicated per device (or sharded over a per-group TP submesh), each
engine runs its own slot-refilled `ContinuousBatcher`, and requests route to
the least-loaded engine. `fleet_size x tp_size = n_devices` — a v5e-8
serves 7B as 8 x TP1 (max throughput), 4 x TP2, or 2 x TP4 (lower
per-request latency); with int4 weights, 8 x TP1 fits 7B per chip.

Failure isolation matches the reference's worker-expiry contract: an engine
whose dispatch loop raises fails ITS in-flight + queued requests explicitly
(never silent-empty success); after QUARANTINE_AFTER consecutive failures the
engine is taken out of the routing rotation (a request-free broken engine
would otherwise always look least-loaded and black-hole all new traffic) —
like an expired reference worker, it rejoins only if it completes work again.
"""

from __future__ import annotations

import collections
import logging
import queue
import threading
import time
from typing import Any, Callable, Iterator, List, Optional, Sequence

from radvlm_tpu.generation.continuous import ContinuousBatcher, Request
from radvlm_tpu.generation.engine import GenerationConfig

log = logging.getLogger(__name__)

# consecutive dispatch-loop failures before an engine leaves the rotation
QUARANTINE_AFTER = 3


class FleetEngine:
    """N continuous batchers + N dispatch threads behind one submit()."""

    def __init__(
        self,
        params: Any,
        cfg: Any,
        gen: GenerationConfig,
        *,
        fleet_size: Optional[int] = None,
        devices: Optional[Sequence[Any]] = None,
        tp_size: int = 1,
        on_complete: Optional[Callable[[Request], None]] = None,
        **batcher_kw: Any,
    ):
        import jax

        devices = list(devices if devices is not None else jax.local_devices())
        if tp_size < 1:
            raise ValueError(f"tp_size must be >= 1, got {tp_size}")
        if fleet_size is not None:
            # Validate rather than silently slicing short: a 4-chip host asked
            # for fleet 8 would otherwise build 4 engines while the caller
            # sizes waves / reports results for 8.
            need = fleet_size * tp_size
            if len(devices) < need:
                raise ValueError(
                    f"fleet {fleet_size} x tp {tp_size} needs {need} devices, "
                    f"have {len(devices)}"
                )
            devices = devices[:need]
        if len(devices) % tp_size:
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
        for i, b in enumerate(self.batchers):
            b._uid = shared_uids
            # KVSnapshot.engine_idx: a conversation's KV rows live on THIS
            # engine's device, so resumed turns must route back to it.
            b._fleet_idx = i
        self._on_complete = on_complete
        self._done: "queue.Queue[Request]" = queue.Queue()
        # Outstanding-request COUNT (incremented before the enqueue, see
        # submit): a uid set filled after b.submit() raced the dispatch
        # thread — a request could complete (and discard a uid not yet in the
        # set) before submit() added it, leaving drain() waiting forever.
        self._pending_n = 0
        self._errors = [0] * len(self.batchers)  # consecutive failures
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        # (engine idx, t_enter, t_exit) per PRODUCTIVE run() call — cheap
        # telemetry the multichip dryrun uses to assert the engines' busy
        # windows actually OVERLAP (a serialized fleet would pass
        # token-parity checks while scaling negatively, as the r03 CPU
        # rehearsal did). Idle spins are not recorded. Bounded so a
        # long-running fleet doesn't leak memory: the dryrun only needs
        # recent windows, and 4096 entries cover hours of productive runs.
        self.busy_log: "collections.deque[tuple]" = collections.deque(
            maxlen=4096
        )

    # ------------------------------------------------------------------
    def warmup(self) -> None:
        """Compile every engine's fill/decode graphs CONCURRENTLY (each
        batcher owns its own jitted instances; XLA compilation releases the
        GIL, so N engines' warmups overlap instead of paying N x serially)."""
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(
            max_workers=len(self.batchers)
        ) as pool:
            for f in [pool.submit(b.warmup) for b in self.batchers]:
                f.result()

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
            t_enter = time.monotonic()
            try:
                for req in b.run():
                    progressed = True
                    self._complete(req)
                if progressed:
                    self.busy_log.append((idx, t_enter, time.monotonic()))
                backoff = 0.0
                if progressed and self._errors[idx]:
                    self._errors[idx] = 0  # completed real work: healthy again
            except Exception as e:  # engine crash must not kill the fleet
                # capped exponential backoff: a persistently-broken engine
                # must not spin a core / spam a traceback every few ms
                backoff = min(max(backoff * 2, 0.05), 2.0)
                self._errors[idx] += 1
                log.exception(
                    "fleet engine %d error (%d consecutive); retrying in %.2fs",
                    idx, self._errors[idx], backoff,
                )
                b.fail_all(f"engine {idx} error: {e}", on_each=self._complete)
            if not progressed:
                time.sleep(backoff or 0.002)

    def _complete(self, req: Request) -> None:
        # Deliver BEFORE decrementing: drain() exits on "nothing pending and
        # done-queue empty", so the opposite order could drop the final
        # request (count at 0, put not yet visible).
        if self._on_complete is not None:
            self._on_complete(req)
        else:
            self._done.put(req)
        with self._lock:
            self._pending_n -= 1

    # ------------------------------------------------------------------
    def _load(self, i: int) -> float:
        if self._errors[i] >= QUARANTINE_AFTER:
            return float("inf")  # out of rotation until it completes work
        b = self.batchers[i]
        return b.queue.qsize() + len(b._active())

    def submit(self, sample, max_new_tokens=None, **kw) -> Request:
        """Route to the least-loaded healthy engine (the controller's
        shortest-queue policy, applied intra-process). A resumed conversation
        (kw["resume"] KVSnapshot) is pinned to the engine that cut the
        snapshot — its KV rows live on that engine's device."""
        resume = kw.get("resume")
        if resume is not None:
            i = resume.engine_idx
            if self._errors[i] >= QUARANTINE_AFTER:
                raise RuntimeError(
                    f"fleet engine {i} holding this conversation's KV is "
                    "quarantined — start a fresh conversation"
                )
        else:
            loads = [self._load(i) for i in range(len(self.batchers))]
            i = min(range(len(loads)), key=loads.__getitem__)
            if loads[i] == float("inf"):
                raise RuntimeError(
                    f"all {len(self.batchers)} fleet engines are quarantined "
                    f"({QUARANTINE_AFTER}+ consecutive failures each)"
                )
        with self._lock:
            self._pending_n += 1
        try:
            return self.batchers[i].submit(
                sample, max_new_tokens=max_new_tokens, **kw
            )
        except BaseException:
            with self._lock:
                self._pending_n -= 1
            raise

    def queue_length(self) -> int:
        return sum(
            b.queue.qsize() + len(b._active()) for b in self.batchers
        )

    def drain(self, idle_timeout: float = 1800.0) -> Iterator[Request]:
        """Yield completed requests until none are pending (eval usage; only
        valid when on_complete is None). start() must have been called.

        `idle_timeout` bounds the wait since the LAST completion, not the
        total drain (the first wave legitimately sits behind each engine's
        XLA compiles when warmup() was skipped)."""
        deadline = time.time() + idle_timeout
        while True:
            with self._lock:
                n_pending = self._pending_n
            if n_pending == 0 and self._done.empty():
                return
            try:
                # short poll once nothing is pending (a just-yielded request's
                # pending count clears moments after its put — see _complete)
                wait = 0.05 if n_pending == 0 else 1.0
                req = self._done.get(
                    timeout=max(0.01, min(wait, deadline - time.time()))
                )
            except queue.Empty:
                if time.time() >= deadline:
                    raise TimeoutError(
                        f"fleet drain made no progress for {idle_timeout}s "
                        f"with {n_pending} pending"
                    )
                continue
            deadline = time.time() + idle_timeout
            yield req

    def shutdown(self, join_timeout: float = 30.0) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=join_timeout)
