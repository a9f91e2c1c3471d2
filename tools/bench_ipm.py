"""Batched constrained-QP (IPM) throughput benchmark — the example_mpc shape.

Solves B copies of the reference's closed-loop quadcopter MPC QP
(/root/reference/hpipm-cpp/examples/example_mpc.cpp:14-96: nx=12, nu=4,
N=10, thrust box bounds + one-sided-masked z bound) from perturbed initial
states, cold-started, with the SoA batch-in-lanes IPM
(ocpqp.ipm_solve_soa) — the TPU hot path for *hard-constrained* QPs; the
NMPC engine itself needs only the barrier/unconstrained path.

Prints one JSON line {metric, value, unit, ...} and, with BENCH_IPM_AOS=1,
also times the vmapped AoS einsum path for the layout-speedup claim.

Usage: python tools/bench_ipm.py   [env: BENCH_BATCH=4096 BENCH_REPS=10]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    time_aos = os.environ.get("BENCH_IPM_AOS", "0") == "1"

    from srbd_nmpc_tpu.models import quadcopter
    from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
    from srbd_nmpc_tpu.ocpqp.ipm_soa import ipm_solve_soa
    from srbd_nmpc_tpu.ocpqp.settings import IpmSettings, IpmStatus

    dtype = jnp.float32
    qp = jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a,
        quadcopter.build_mpc_qp(N=10, dtype=dtype),
    )
    # f32-appropriate tolerances (the f64 defaults are unreachable in f32)
    settings = IpmSettings(iter_max=20, mu0=1e1, tol_stat=1e-4, tol_eq=1e-4,
                           tol_ineq=1e-4, tol_comp=1e-5)

    rng = np.random.default_rng(0)
    x0 = np.zeros(12, np.float32)
    x0[2] = -1.0  # 1 m below the hover reference, like the example's start
    x0s = jnp.asarray(x0[None] + 0.05 * rng.normal(size=(batch, 12)), dtype)

    solve = jax.jit(lambda z: ipm_solve_soa(qp, z, settings))
    t0 = time.perf_counter()
    sol, stats = jax.block_until_ready(solve(x0s))
    compile_s = time.perf_counter() - t0
    n_succ = int(np.sum(np.asarray(stats.status) == int(IpmStatus.SUCCESS)))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(solve(x0s))
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(np.asarray(times), 50))

    out = {
        "metric": "constrained_qp_solves_per_s_chip_quadcopter_N10",
        "value": round(batch / p50, 1),
        "unit": "solves/s",
        "batch": batch,
        "p50_batch_latency_ms": round(p50 * 1e3, 3),
        "per_solve_us": round(1e6 * p50 / batch, 2),
        "success": n_succ,
        "mean_ipm_iters": round(float(np.mean(np.asarray(stats.iter))), 2),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "ok": n_succ / batch >= 0.99,
    }

    if time_aos:
        B_aos = min(batch, 256)  # the AoS path is too slow for full batch
        solve_aos = jax.jit(jax.vmap(lambda z: ipm_solve(qp, z, settings)))
        jax.block_until_ready(solve_aos(x0s[:B_aos]))
        t0 = time.perf_counter()
        jax.block_until_ready(solve_aos(x0s[:B_aos]))
        aos_dt = time.perf_counter() - t0
        out["aos_solves_per_s"] = round(B_aos / aos_dt, 1)
        out["soa_vs_aos_speedup"] = round((batch / p50) / (B_aos / aos_dt), 1)

    print(json.dumps(out))
    if not out["ok"]:
        print(f"BENCH_IPM FAILED: success {n_succ}/{batch}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
