"""Profiling / tracing utilities.

The reference has almost no tracing (SURVEY.md §5 — a tokens/sec print and
DeepSpeed's wall_clock_breakdown flag). TPU-native replacements:
- `trace(logdir)`: jax.profiler trace -> xplane dumps viewable in
  TensorBoard/XProf (covers device + host timelines, HLO cost analysis);
- `StepTimer`: host-side per-step wall timing with EMA + tokens/sec;
- `annotate`: named TraceAnnotation spans that show up in the device timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """EMA step timing + throughput accounting for train/serve loops."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.step_time: Optional[float] = None
        self._last: Optional[float] = None
        self.total_steps = 0
        self.total_tokens = 0
        self._window_tokens = 0
        self._window_start = time.perf_counter()

    def tick(self, tokens: int = 0) -> Dict[str, float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        self.total_steps += 1
        self.total_tokens += tokens
        self._window_tokens += tokens
        out = {
            "step_time_ema_s": self.step_time or 0.0,
            "steps": float(self.total_steps),
        }
        window = now - self._window_start
        if window > 0:
            out["tokens_per_sec"] = self._window_tokens / window
        return out

    def reset_window(self):
        self._window_tokens = 0
        self._window_start = time.perf_counter()
