"""Profiling helpers: jax.profiler traces and wall-clock timing.

SURVEY §5: the reference has no tracing/profiling at all; these wrap JAX's
profiler so any pipeline stage can be traced to TensorBoard format.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "time_jitted"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, warmup: int = 1, reps: int = 5) -> float:
    """Median wall-clock seconds of fn(*args) with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
