"""Mosaic feature probe: can a kernel store/load VMEM scratch at a stage
index computed from program_id (dynamic major-axis ref slicing), and can
BlockSpec index maps use modular arithmetic on the grid index?

Both are prerequisites for the single-kernel fused SQP design
(ops/sqp_pallas.py round-3 follow-up): a 2N-step sequential grid whose
backward phase (g < N) parks per-stage Riccati products in VMEM scratch
and whose forward phase (g >= N) reads them back — so the [N,12,12,B]
closed-loop/gain tensors never touch HBM.

Run on the real chip: timeout 600 python tools/probe_dynscratch.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_kernel(x_ref, o_ref, scr, N: int):
    g = pl.program_id(1)

    @pl.when(g < N)
    def _():
        k = N - 1 - g
        # dynamic-major-index scratch STORE
        scr[pl.ds(k, 1)] = x_ref[...] * (k + 1).astype(x_ref.dtype)

    @pl.when(g >= N)
    def _():
        k = g - N
        # dynamic-major-index scratch LOAD
        o_ref[...] = scr[pl.ds(k, 1)]


def main():
    N, B, block = 8, 512, 256
    dtype = jnp.float32
    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, 8, B)), dtype)

    # input map: backward phase reads stage N-1-g; forward phase reads a
    # clamped/garbage block ((N-1-g) % N keeps it in range, branch-free)
    xmap = lambda i, g: ((N - 1 - g) % N, 0, i)
    omap = lambda i, g: ((g - N) % N, 0, i)  # garbage writes at g<N are
    # overwritten when the forward phase revisits the block in order

    out = pl.pallas_call(
        functools.partial(probe_kernel, N=N),
        grid=(B // block, 2 * N),
        in_specs=[pl.BlockSpec((1, 8, block), xmap)],
        out_specs=pl.BlockSpec((1, 8, block), omap),
        out_shape=jax.ShapeDtypeStruct((N, 8, B), dtype),
        scratch_shapes=[pltpu.VMEM((N, 8, block), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x)
    out = jax.block_until_ready(out)
    want = x * (jnp.arange(1, N + 1, dtype=dtype)[:, None, None])
    err = float(jnp.max(jnp.abs(out - want)))
    print(f"backend={jax.default_backend()} max_err={err:.3e}")
    assert err < 1e-6, "dynamic-scratch probe FAILED numerically"
    print("PROBE OK: dynamic scratch indexing + modular index maps work")


if __name__ == "__main__":
    main()
