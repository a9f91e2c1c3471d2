"""Wall-clock timing / benchmark harness.

Replaces the reference ``timer`` (/root/reference/utils/timer.h:6-28,
gettimeofday-based ms) with a JAX-aware harness: results are only timed
after ``block_until_ready`` (XLA dispatch is async), warmup compilations are
excluded, and percentiles are reported in addition to the reference's plain
average (NMPC_solver.cpp:378).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List

import jax
import numpy as np


class Timer:
    """Minimal drop-in analogue of the reference timer (ms)."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def get(self) -> float:
        """Elapsed milliseconds since start()."""
        return (time.perf_counter() - self._t0) * 1e3


@dataclasses.dataclass(frozen=True)
class BenchResult:
    reps: int
    avg_ms: float
    p50_ms: float
    p90_ms: float
    min_ms: float
    times_ms: List[float]

    def __str__(self) -> str:
        return (f"avg {self.avg_ms:.3f} ms | p50 {self.p50_ms:.3f} ms | "
                f"p90 {self.p90_ms:.3f} ms | min {self.min_ms:.3f} ms "
                f"({self.reps} reps)")


def benchmark(fn: Callable, *args, reps: int = 100, warmup: int = 2) -> BenchResult:
    """Time ``fn(*args)`` with device sync; returns per-rep stats.

    ``fn`` should return a pytree of arrays (blocked on via
    ``jax.block_until_ready``).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(times)
    return BenchResult(
        reps=reps,
        avg_ms=float(arr.mean()),
        p50_ms=float(np.percentile(arr, 50)),
        p90_ms=float(np.percentile(arr, 90)),
        min_ms=float(arr.min()),
        times_ms=times,
    )
