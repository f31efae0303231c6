"""Profiling and step-time observability.

The reference has no tracing/profiling at all (SURVEY.md §5 — only tqdm
bars). The TPU rebuild provides:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA op timeline, HBM usage);
* :class:`StepTimer` — wall-clock step timing with summary statistics,
  used by the trainer's periodic logging;
* :func:`device_memory_stats` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"): step()`` → TensorBoard trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with percentile summaries."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory usage in MB (when the backend reports it)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 2**20,
            }
        except Exception:
            out[str(d)] = {}
    return out
