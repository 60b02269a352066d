"""Structured metrics + profiling (SURVEY §5: the reference has only
carriage-return counters; the TPU build adds jax.profiler traces and a
JSONL metrics log)."""
from __future__ import annotations

import json
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Optional


class MetricsLogger:
    """Append-only JSONL metrics stream: one dict per step/event."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()

    def log(self, **fields):
        fields.setdefault("wall", round(time.time() - self._t0, 3))
        with open(self.path, "a") as f:
            f.write(json.dumps(fields) + "\n")

    def read(self):
        if not self.path.exists():
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


@contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """jax.profiler trace around a region (view in TensorBoard/XProf).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + per-step latency."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []

    def tick(self):
        self.times.append(time.perf_counter())
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self.times) < 2:
            return 0.0
        return (len(self.times) - 1) / (self.times[-1] - self.times[0])
