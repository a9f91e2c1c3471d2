"""Profiling / tracing helpers.

The reference's only observability is the wall-clock ``timer``
(utils/timer.h) plus HPIPM's per-iteration ``lq_fact``/``itref`` timing
columns (SURVEY.md §5). The TPU-native equivalents:

- device traces: `trace(logdir)` wraps `jax.profiler` (view in
  TensorBoard / xprof — kernel timelines, HBM traffic, per-op FLOPs);
- named regions: `annotate(name)` adds TraceAnnotation spans so solver
  phases (linearize / riccati / line-search) are attributable in a trace;
- quick accounting: `solves_per_second` converts a BenchResult to the
  headline metric.
"""

from __future__ import annotations

import contextlib

import jax

from srbd_nmpc_tpu.utils.timing import BenchResult


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block.

    Usage:
        with profiling.trace("/tmp/nmpc-trace"):
            solver(...)  # block_until_ready inside
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines (and nestable)."""
    return jax.profiler.TraceAnnotation(name)


def solves_per_second(res: BenchResult, batch: int) -> float:
    """Headline throughput from a timed batched solve."""
    return batch * 1e3 / res.p50_ms
