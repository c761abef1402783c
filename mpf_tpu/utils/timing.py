"""Timing / throughput helpers (reference: chrono wall-clock around MPF and
dgetrf, `benchmark.cpp:219-222,239-242`).

Measurement methodology for this environment: the TPU is reached through a
tunnel where (a) ``block_until_ready`` does not actually synchronize and
(b) device->host transfers run at ~10 MB/s, so fetching results would
dominate any timing.  We therefore time a jitted wrapper that reduces the
result to ONE scalar on device and fetch only that — the scalar transfer
forces completion of the whole computation and costs microseconds of
bandwidth.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def lu_flops(n: int) -> float:
    """Canonical LU flop count 2n^3/3 (BASELINE.json metric)."""
    return 2.0 * n**3 / 3.0


def _fingerprint(tree) -> jnp.ndarray:
    """Reduce an arbitrary pytree to one fp32 scalar on device."""
    total = jnp.float32(0)
    for leaf in jax.tree.leaves(tree):
        total = total + jnp.sum(jnp.asarray(leaf).astype(jnp.float32))
    return total


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 3,
            rejit: bool = True) -> Tuple[float, object]:
    """Median wall-clock seconds of ``fn(*args)``, synchronized via a scalar
    fingerprint fetch.  Returns (seconds, fingerprint_of_last_run).

    ``rejit=False``: do NOT wrap ``fn`` in an outer jit — only the scalar
    fingerprint reduce is jitted, and the fetch still forces completion of
    everything it depends on.  REQUIRED for multi-part callables (the
    pair-layout split driver, `models/mpf.make_mpf`): an outer jit inlines
    the sequential part-jits back into ONE module, recreating exactly the
    compile-helper module-size wall the split exists to stay under."""
    if rejit:
        g = jax.jit(lambda *a: _fingerprint(fn(*a)))
    else:
        jfp = jax.jit(_fingerprint)
        g = lambda *a: jfp(fn(*a))  # noqa: E731
    fp = None
    for _ in range(warmup):
        fp = float(g(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fp = float(g(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], fp


def tflops(n: int, seconds: float) -> float:
    return lu_flops(n) / seconds / 1e12
