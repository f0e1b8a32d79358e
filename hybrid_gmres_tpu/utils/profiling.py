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


def device_seconds(fn: Callable, *args, repeats: int = 10,
                   reps: tuple = (1, 3), stats: bool = False):
    """Pure DEVICE time of one ``fn(*args)`` call, dispatch excluded.

    The repeat-slope method (DESIGN §10): build two jitted programs that
    run the work ``reps[0]`` and ``reps[1]`` times inside one call — an
    outer ``lax.scan`` whose carry multiplies the first array argument by
    an exactly-1.0 factor derived from the result, so XLA can neither
    hoist nor parallelize the repeats — then time both INTERLEAVED
    (min-of-N per side; a transport slowdown spanning several calls would
    bias a blocked ordering) and take the slope.  The fixed per-call
    dispatch/transport cost cancels exactly, and unlike a size-scaling
    slope every shape stays at its true value.

    ``fn`` must accept ``*args`` with at least one float-array argument
    FIRST (the carry seed) and return an array or pytree whose first leaf
    is an array (non-finite leaves are neutralized before entering the
    carry chain, so a NaN result corrupts the measured program's VALUES
    but not the timing).  Through a ~20-25 ms dispatch tunnel the slope
    noise is ~±2-5% per call pair at default ``repeats``.

    ``stats=True`` returns a dict instead of the scalar slope:
    ``slope_s`` (min-of-N, the headline), ``slope_med_s`` (median-based —
    overlap between two runs' [slope_s, slope_med_s] bands is the
    weather-robust comparison), ``ts_lo``/``ts_hi`` (raw wall samples) and
    ``reps``.
    """
    import jax.numpy as jnp

    r_lo, r_hi = reps
    if not (isinstance(r_lo, int) and isinstance(r_hi, int) and
            r_lo < r_hi):
        raise ValueError(f"reps must be increasing ints, got {reps}")

    def rep(nrep):
        @jax.jit
        def run(first, *rest):
            def outer(carry, _):
                out = fn(carry, *rest)
                leaf = jax.tree_util.tree_leaves(out)[0]
                s = jnp.sum(leaf)
                # tanh bounds |s| <= 1 (huge outputs would make the factor
                # != 1.0f and drift the carry across repeats); the where
                # keeps a NaN/Inf leaf from poisoning the chain
                s = jnp.tanh(jnp.where(jnp.isfinite(s), s, 0.0))
                # (1 + 1e-30*s) is exactly 1.0f but not foldable
                return carry * (1.0 + 1e-30 * s), ()
            carry, _ = jax.lax.scan(outer, first, jnp.arange(nrep))
            return carry
        return run

    f_lo, f_hi = rep(r_lo), rep(r_hi)
    for f in (f_lo, f_hi):
        out = f(*args)
        jax.block_until_ready(out)
        float(jnp.sum(out))  # forced host readback (axon gotcha)
    ts_lo, ts_hi = [], []
    for _ in range(repeats):
        for f, ts in ((f_lo, ts_lo), (f_hi, ts_hi)):
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
    dr = r_hi - r_lo
    slope = (min(ts_hi) - min(ts_lo)) / dr
    if not stats:
        return slope

    def _med(ts):
        s = sorted(ts)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else 0.5 * (s[mid - 1] + s[mid])

    return {
        "slope_s": slope,
        "slope_med_s": (_med(ts_hi) - _med(ts_lo)) / dr,
        "ts_lo": ts_lo,
        "ts_hi": ts_hi,
        "reps": (r_lo, r_hi),
    }


def dispatch_floor_seconds(repeats: int = 5) -> float:
    """Measured fixed per-call dispatch/transport cost: the min wall time
    of a bare ``jit(x + 1)`` round-trip with forced host readback — ~20-25
    ms through the axon tunnel, ~0 locally.  Recording it next to a wall
    metric lets a reader decompose wall = dispatch + device (the bench
    artifact's weather-proofing, VERDICT r4 weak#1)."""
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)
