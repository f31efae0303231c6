"""utils/profiling: trace emits a TensorBoard-loadable trace, StepTimer
drops warmup steps and reports percentile summaries, device_memory_stats
returns a per-device dict (SURVEY.md §5 — the reference has no tracing)."""

import os
import time

import jax
import jax.numpy as jnp

from image_captioning_ml_project_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    trace,
)


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "tr")
    with trace(log_dir):
        jnp.asarray(jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, "trace() produced no profile files"


def test_step_timer_warmup_and_summary():
    t = StepTimer(warmup=2)
    for i in range(5):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3  # 5 enters - 2 warmup
    assert s["mean_s"] >= 0.009
    assert s["p95_s"] >= s["p50_s"] > 0
    assert s["steps_per_sec"] > 0
    assert StepTimer().summary() == {"steps": 0}


def test_device_memory_stats_shape():
    out = device_memory_stats()
    assert len(out) == len(jax.devices())
    for v in out.values():
        assert isinstance(v, dict)
