"""Timing / throughput helpers (reference: chrono wall-clock around MPF and
dgetrf, `benchmark.cpp:219-222,239-242`; here with ``block_until_ready``
bracketing and TFLOP/s derivation from the 2n^3/3 LU flop count, the
BASELINE.json headline metric)."""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax


def lu_flops(n: int) -> float:
    """Canonical LU flop count 2n^3/3 (BASELINE.json metric)."""
    return 2.0 * n**3 / 3.0


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> Tuple[float, object]:
    """Median wall-clock seconds of ``fn(*args)`` with device-sync
    bracketing.  Returns (seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], result


def tflops(n: int, seconds: float) -> float:
    return lu_flops(n) / seconds / 1e12
