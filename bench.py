"""Benchmark: full SRBD NMPC solves/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric definition (BASELINE.json): cold full NMPC solves/s/chip at N=20 —
each solve runs the whole SQP descent (linearize -> Riccati QP -> filter
line search, up to 15 iterations) from the reference's cold initialization
(x=0, u=100), on the reference benchmark problem (config/mpc_option.yaml).
``vs_baseline`` is value / 1e4 (the driver's v5e target; the reference
itself publishes no numbers — BASELINE.md).

Env knobs: BENCH_BATCH (default 1024), BENCH_REPS (default 20),
BENCH_REFINE (default 0; the fused Pallas QP kernel path).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    reps = int(os.environ.get("BENCH_REPS", "20"))
    refine = int(os.environ.get("BENCH_REFINE", "0"))

    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.parallel import sharded
    from srbd_nmpc_tpu.utils.config import MpcOptions
    from srbd_nmpc_tpu.nmpc.runner import build_from_options

    dtype = jnp.float32
    opts = MpcOptions.default()
    params, weights, cfg = build_from_options(opts, dtype, "euler", refine)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)

    import numpy as np
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.01 * rng.normal(size=(batch, srbd.NX)), dtype
    )

    @jax.jit
    def cold_solve(params, weights, x0s, x_ref):
        states = sharded.broadcast_state(
            engine.NmpcState.initial(cfg.N, dtype), batch
        )
        return sharded.solve_batch(params, weights, cfg, states, x0s, x_ref)

    # compile + correctness gate
    t0 = time.perf_counter()
    _, infos, summary = jax.block_until_ready(
        cold_solve(params, weights, x0s, x_ref)
    )
    compile_s = time.perf_counter() - t0
    n_conv = int(summary.n_converged)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(cold_solve(params, weights, x0s, x_ref))
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(np.asarray(times), 50))

    solves_per_s = batch / p50
    out = {
        "metric": "cold_nmpc_solves_per_s_chip_N20",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1.0e4, 4),
        "batch": batch,
        "p50_batch_latency_ms": round(p50 * 1e3, 3),
        "per_solve_us": round(1e6 * p50 / batch, 2),
        "converged": n_conv,
        "mean_sqp_iters": round(float(summary.mean_iters), 2),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
