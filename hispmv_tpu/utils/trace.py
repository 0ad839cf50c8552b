"""Tracing / profiling observability.

The reference's observability is wall-clock segment timing around
preprocessing and kernel runs plus platform power samplers (SURVEY.md
section 5).  TPU equivalents:

- :class:`Tracer` — named wall-clock segments with a report (the
  std::chrono segments analog, spmv-helper.cpp:659-714).
- :func:`profile_trace` — context manager around ``jax.profiler`` emitting
  a TensorBoard-compatible trace directory (the hardware-trace hook the
  reference lacks).
- :class:`PowerMonitor` — the FpgaPowerMonitor-shaped interface
  (start/stop/avg/max, fpga-power.h:17-38).  Cloud TPUs expose no on-host
  power counters; the default sampler records utilization proxies (device
  memory in use) and reports watts as NaN rather than inventing numbers.
"""

from __future__ import annotations

import contextlib
import math
import threading
import time
from typing import Dict, List, Optional


class Tracer:
    """Named wall-clock segments: ``with tracer.span("prepare"): ...``"""

    def __init__(self):
        self.segments: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.segments[name] = self.segments.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["segment               total_s   calls"]
        for name, total in sorted(
            self.segments.items(), key=lambda kv: -kv[1]
        ):
            lines.append(f"{name:20} {total:8.3f} {self.counts[name]:7d}")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace around a region (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PowerMonitor:
    """start/stop/avg/max sampler, FpgaPowerMonitor-shaped
    (fpga-power.cpp:3-63).  Cloud TPU exposes no power counters to the
    host; ``watts`` stay NaN and the samples record device-memory-in-use as
    a utilization proxy so the plumbing (sampling thread, CSV columns) is
    exercised end to end."""

    def __init__(self, interval_s: float = 1.0):
        self.interval_s = interval_s
        self.samples: List[float] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _sample_once(self) -> float:
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            return float(stats.get("bytes_in_use", float("nan")))
        except Exception:
            return float("nan")

    def _loop(self):
        while not self._stop.is_set():
            self.samples.append(self._sample_once())
            self._stop.wait(self.interval_s)

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    @property
    def avg_watts(self) -> float:
        return float("nan")  # no power telemetry on cloud TPU hosts

    @property
    def max_watts(self) -> float:
        return float("nan")

    @property
    def avg_bytes_in_use(self) -> float:
        good = [s for s in self.samples if not math.isnan(s)]
        return sum(good) / len(good) if good else float("nan")
