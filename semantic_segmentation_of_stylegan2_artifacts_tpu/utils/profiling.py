"""Profiling / timing observability (absent in the reference; SURVEY §5).

* :class:`StepTimer` — per-step wall-clock with warmup discard and an
  images/sec summary (remember: on remote-relay backends the sync must be
  a value fetch, which callers do by reading the loss).
* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible trace directory (best effort: profiling may be
  unsupported on proxied backends, in which case it degrades to a no-op).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    @property
    def mean_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def images_per_sec(self, batch_size: int) -> float:
        m = self.mean_s
        return batch_size / m if m and m == m else float("nan")

    def summary(self, batch_size: Optional[int] = None) -> str:
        s = f"steps={len(self.times)} mean={self.mean_s*1000:.1f}ms"
        if batch_size:
            s += f" throughput={self.images_per_sec(batch_size):.2f} img/s"
        return s


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (no-op if the backend can't profile)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
