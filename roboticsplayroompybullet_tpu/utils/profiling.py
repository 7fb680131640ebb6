"""Profiling / timing harness (SURVEY.md §5: tracing plan).

`timeit` is the canonical wall-clock microbench (block_until_ready
semantics, best-of-N); `trace` wraps `jax.profiler` for TensorBoard-style
device traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def timeit(fn: Callable, *args, warmup: int = 1, reps: int = 3,
           **kw) -> float:
    """Best-of-`reps` seconds for fn(*args), after `warmup` compile calls."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace context: `with trace('/tmp/tb'): run()` then inspect
    with TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
