"""Per-stage latency metrics + JAX profiler hooks.

The reference's observability is log-lines only (SURVEY.md §5: loguru
sinks, no tracer). Here every pipeline stage (extract/encode/search/
rescore/confidence) records wall-clock into a bounded ring buffer, and
/stats surfaces counts + p50/p95/mean per stage. jax.profiler traces can
be started/stopped at runtime for deep dives (viewable in TensorBoard/
Perfetto).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from contextlib import contextmanager
from typing import Dict

import numpy as np


class StageMetrics:
    """Thread-safe ring-buffer latency recorder."""

    def __init__(self, window: int = 512):
        self.window = window
        self._lock = threading.Lock()
        self._samples: Dict[str, deque] = {}
        self._counts: Dict[str, int] = {}

    @contextmanager
    def timer(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(stage, time.perf_counter() - t0)

    def record(self, stage: str, seconds: float) -> None:
        with self._lock:
            buf = self._samples.setdefault(stage, deque(maxlen=self.window))
            buf.append(seconds)
            self._counts[stage] = self._counts.get(stage, 0) + 1

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            out = {}
            for stage, buf in self._samples.items():
                arr = np.asarray(buf, dtype=np.float64) * 1000  # ms
                out[stage] = {
                    "count": self._counts[stage],
                    "p50_ms": round(float(np.percentile(arr, 50)), 3),
                    "p95_ms": round(float(np.percentile(arr, 95)), 3),
                    "mean_ms": round(float(arr.mean()), 3),
                    "last_ms": round(float(arr[-1]), 3),
                }
            return out

    def reset(self) -> None:
        with self._lock:
            self._samples.clear()
            self._counts.clear()


# process-wide default registry
metrics = StageMetrics()


class Profiler:
    """Runtime-controllable jax.profiler trace (TensorBoard/Perfetto)."""

    def __init__(self, log_dir: str = "logs/profile"):
        self.log_dir = log_dir
        self._active = False

    def start(self) -> Dict:
        import jax

        if self._active:
            return {"status": "already_running", "log_dir": self.log_dir}
        jax.profiler.start_trace(self.log_dir)
        self._active = True
        return {"status": "started", "log_dir": self.log_dir}

    def stop(self) -> Dict:
        import jax

        if not self._active:
            return {"status": "not_running"}
        jax.profiler.stop_trace()
        self._active = False
        return {"status": "stopped", "log_dir": self.log_dir}

    @property
    def active(self) -> bool:
        return self._active


profiler = Profiler()
