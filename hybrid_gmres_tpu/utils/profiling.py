"""Tracing / timing utilities (SURVEY.md §5 tracing subsystem).

The reference's only instrumentation is tic/toc prints; here: a
``jax.profiler`` trace context for TPU timeline capture, a block-until-ready
benchmark helper, and throughput calculators for the nnz/s metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 3, warmup: int = 1,
              **kwargs) -> dict:
    """Best/mean wall time of ``fn(*args)`` with device synchronization."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
        "times": times,
    }


def spmv_throughput(nnz: int, seconds: float, dtype_bytes: int = 4) -> dict:
    """nnz/s and effective GB/s for one sparse matvec."""
    return {
        "nnz_per_s": nnz / seconds,
        "gb_per_s": nnz * (dtype_bytes + 4) / seconds / 1e9,  # value + index
    }
