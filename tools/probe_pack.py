"""Probe: sublane-packed 4-d SoA layout vs the 3-d batch-in-lanes layout.

The one-pass SQP kernel is VPU-throughput-bound (tools/roofline.py) and its
arrays put the matrix ROW dim in sublanes: a [12,12,block] operand occupies
12/16 sublanes (75 %), and the structured stage body's [3,3,block] /
[3,block] block operands only 3/8 (37.5 %). Packing part of the batch into
the sublane dim instead — [n, m, SUB, 128] with SUB*128 scenarios per
block — makes every elementwise/rank-1 op a full (8,128) vreg when SUB=8.

This tool measures the sustained throughput of the dominant op (the
ops/smallmat rank-1 k-loop matmul, dependent chain) in both layouts at
matrix sizes 12 and 3, using the same size-differencing trick as
tools/roofline.calibrate_vpu_gflops (K-hi minus K-lo cancels HBM traffic
and dispatch overhead). Run on the real chip:

    python tools/probe_pack.py

Interpretation: if mm12_4d / mm3_4d sustain ~1.3x/~2.5x the 3-d variants,
the packed layout is worth a kernel rewrite; if Mosaic rejects the 4-d
bodies or shows no gain, record the non-lever in CLAUDE.md and stop.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srbd_nmpc_tpu.ops import smallmat as sm


def _timed_median(fn, reps: int = 5) -> float:
    """Median wall time of fn, syncing via a HOST READBACK of fn's scalar
    result — on this image's remote-execution platform,
    ``jax.block_until_ready`` on a device-resident array returns without
    waiting for the remote execution (measured: a 260-GFLOP kernel 'ran'
    in 0.1 ms); ``float()`` forces the device->host transfer and a true
    sync. fn must return a scalar."""
    float(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _chain_kernel(K: int, n: int):
    """P <- Y - A @ P dependent matmul chain; A, Y from the input block."""

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        A = 0.3 * x
        Y = 0.5 * x
        P = x
        for _ in range(K):
            P = Y - sm.mm(A, P)
        o_ref[...] = P

    return kernel


def measure(n: int, packed: bool, K_hi: int = 96, K_lo: int = 24,
            total_b: int = 1 << 20) -> float:
    """Sustained GFLOP/s of the mm-chain at matrix size n in the given
    layout (packed: [n,n,8,128] blocks; else [n,n,256])."""
    if packed:
        sub, lanes = 8, 128
        beff = sub * lanes
        grid = total_b // beff
        shape = (n, n, sub, lanes)
        x = jnp.ones((n, n, sub, lanes * grid), jnp.float32) * 0.7
        spec = pl.BlockSpec(shape, lambda i: (0, 0, 0, i))
        out_shape = jax.ShapeDtypeStruct(x.shape, jnp.float32)
    else:
        beff = 256
        grid = total_b // beff
        shape = (n, n, beff)
        x = jnp.ones((n, n, beff * grid), jnp.float32) * 0.7
        spec = pl.BlockSpec(shape, lambda i: (0, 0, i))
        out_shape = jax.ShapeDtypeStruct(x.shape, jnp.float32)

    def make(K):
        return jax.jit(lambda v: jnp.sum(pl.pallas_call(
            _chain_kernel(K, n),
            grid=(grid,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=out_shape,
        )(v)))

    f_hi, f_lo = make(K_hi), make(K_lo)
    t_hi = _timed_median(lambda: f_hi(x))
    t_lo = _timed_median(lambda: f_lo(x))
    # one mm at size n over total_b scenarios: n rank-1 updates of [n,n]
    flops = 2.0 * n * n * n * total_b * (K_hi - K_lo)
    return flops / max(t_hi - t_lo, 1e-9) / 1e9


def _chain_kernel_t(K: int, n: int):
    """Same chain but with a leading-dim transpose per step: isolates the
    Mosaic cost of swapaxes(P, 0, 1) on [n, n, block] (sublane shuffle)."""

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        A = 0.3 * x
        Y = 0.5 * x
        P = x
        for _ in range(K):
            P = Y - sm.mm(A, jnp.swapaxes(P, 0, 1))
        o_ref[...] = P

    return kernel


def measure_t(n: int, K_hi: int = 96, K_lo: int = 24,
              total_b: int = 1 << 20) -> float:
    """GFLOP/s of the mm+transpose chain in 3-d layout (transpose FLOPs
    counted as zero, so the gap vs ``measure(n, False)`` IS the transpose
    cost)."""
    beff = 256
    grid = total_b // beff
    shape = (n, n, beff)
    x = jnp.ones((n, n, beff * grid), jnp.float32) * 0.7
    spec = pl.BlockSpec(shape, lambda i: (0, 0, i))

    def make(K):
        return jax.jit(lambda v: jnp.sum(pl.pallas_call(
            _chain_kernel_t(K, n),
            grid=(grid,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(v)))

    f_hi, f_lo = make(K_hi), make(K_lo)
    t_hi = _timed_median(lambda: f_hi(x))
    t_lo = _timed_median(lambda: f_lo(x))
    flops = 2.0 * n * n * n * total_b * (K_hi - K_lo)
    return flops / max(t_hi - t_lo, 1e-9) / 1e9


def main():
    print(f"devices: {jax.devices()}")
    for n in (12, 3):
        for packed in (False, True):
            tag = f"mm{n}_{'4d' if packed else '3d'}"
            try:
                g = measure(n, packed)
                print(f"  {tag:10s}  {g:8.1f} GFLOP/s")
            except Exception as e:  # noqa: BLE001 — probe records failures
                print(f"  {tag:10s}  FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
    try:
        g = measure_t(12)
        print(f"  mm12_3d+T   {g:8.1f} GFLOP/s (transpose folded in)")
    except Exception as e:  # noqa: BLE001
        print(f"  mm12_3d+T   FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
