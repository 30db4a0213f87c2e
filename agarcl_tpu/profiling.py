"""Tracing / profiling utilities (SURVEY §5: the reference has no internal
tracing — its harness is google-benchmark + ad-hoc SPS prints; the TPU-native
equivalents are jax.profiler traces and per-step device-time metrics).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/agarcl_trace"):
    """Capture a jax.profiler trace of the enclosed block (view with
    TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steps/sec + device-time bookkeeping for env loops (the reference's SPS
    accounting, go_bigger_example.py:113-116, done properly: block on device
    results, exclude compile)."""

    def __init__(self):
        self.steps = 0
        self.envs = 0
        self._t0 = None
        self.history = []

    def start(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.envs = 0

    def tick(self, num_envs: int, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.steps += 1
        self.envs += num_envs

    def stop(self) -> dict:
        dt = time.perf_counter() - self._t0
        out = dict(seconds=dt, calls=self.steps, env_steps=self.envs,
                   env_steps_per_sec=self.envs / dt if dt > 0 else 0.0)
        self.history.append(out)
        return out


def device_time_of(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                   **kw) -> float:
    """Median wall time per call of a jitted fn with device sync."""
    times = []
    out = None
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
