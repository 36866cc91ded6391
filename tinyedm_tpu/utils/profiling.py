"""Profiling/tracing hooks (SURVEY.md §5: the reference has none — its
closest analog is wandb gradient watching; this fills the gap the
TPU-idiomatic way with jax.profiler)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a code region:

        with trace("runs/x/profile"):
            for _ in range(10): state, m = step(...)
    """
    jax.profiler.start_trace(str(log_dir), create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timing with explicit device sync points.

    Use ``mark()`` every step and ``sync_value()`` with any device scalar from
    the step at measurement boundaries — over an async transport a host read
    of real step output is the only reliable fence.
    """

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: Optional[float] = None

    def mark(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def sync_value(self, device_scalar) -> float:
        v = float(device_scalar)
        self._last = time.perf_counter()
        return v

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def steps_per_sec(self) -> float:
        t = self.mean_step_time
        return 1.0 / t if t else 0.0


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = None
    return out
