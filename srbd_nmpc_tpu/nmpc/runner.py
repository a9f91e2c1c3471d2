"""CLI / benchmark runner: the ``main`` + ``controlLoop`` equivalent.

Reproduces the reference app layer (/root/reference/NMPC_solver.cpp:353-395):
load YAML, build the stance benchmark problem, time ``N_rep`` full NMPC
solves, print the average — plus the TPU-native extensions: scenario
batching, dtype selection, percentile timings and solves/s/chip.

Usage:
    python -m srbd_nmpc_tpu.nmpc.runner [--config config/mpc_option.yaml]
        [--nrep 100] [--batch 1] [--dtype f32] [--sensitivity euler]
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine
from srbd_nmpc_tpu.parallel import sharded
from srbd_nmpc_tpu.utils.config import MpcOptions, load_mpc_options
from srbd_nmpc_tpu.utils.timing import benchmark


def build_from_options(opts: MpcOptions, dtype=jnp.float32,
                       sensitivity: str = "euler", refine: int = 0):
    """Map reference YAML options onto engine structures
    (readYaml/initialize/setupDynamics, NMPC_solver.cpp:18-111, 332-339)."""
    cfg = engine.NmpcConfig(
        N=opts.horizon,
        sqp_max_iter=opts.sqp_max_loop,
        mu_barrier=opts.mu_barrier,
        theta_barrier=opts.theta_barrier,
        sensitivity=sensitivity,
        refine=refine,
    )
    params = srbd.SRBDParams.create(
        mass=15.0, inertia_diag=opts.lbody, dt=opts.dt_mpc, dtype=dtype
    )
    weights = engine.NmpcWeights.create(
        Q_diag=opts.Q, R_scalar=opts.R, Qf_diag=opts.Qf, N=opts.horizon,
        dtype=dtype,
    )
    return params, weights, cfg


def run_control_loop(opts: MpcOptions, batch: int = 1, dtype=jnp.float32,
                     sensitivity: str = "euler", refine: int = 0,
                     nrep: Optional[int] = None) -> dict:
    """Timed benchmark loop (controlLoop parity, NMPC_solver.cpp:353-380).

    As in the reference, the SQP state persists across repetitions (rep 0
    does the full SQP descent; later reps converge immediately), and each
    repetition re-runs setup + the solve.
    """
    nrep = opts.n_rep if nrep is None else nrep
    params, weights, cfg = build_from_options(opts, dtype, sensitivity, refine)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)

    state = sharded.broadcast_state(engine.NmpcState.initial(cfg.N, dtype), batch)
    x0s = jnp.broadcast_to(x0, (batch,) + x0.shape)
    solver = sharded.make_sharded_solver(cfg, donate_state=False)

    # cold solve from scratch (compiles + full descent)
    state_f, infos, summary = jax.block_until_ready(
        solver(params, weights, state, x0s, x_ref)
    )

    # timed reps, warm state persisting as in the reference benchmark
    res = benchmark(
        lambda s: solver(params, weights, s, x0s, x_ref)[0],
        state_f, reps=nrep,
    )

    # printOptimizationInfo analogue (NMPC_solver.cpp:113-141)
    print(infos.pretty())

    n_conv = int(summary.n_converged)
    out = dict(
        nrep=nrep,
        batch=batch,
        horizon=cfg.N,
        dt=opts.dt_mpc,
        converged=n_conv,
        avg_ms=res.avg_ms,
        p50_ms=res.p50_ms,
        p90_ms=res.p90_ms,
        solves_per_s=batch * 1e3 / res.p50_ms,
        mean_sqp_iters=float(summary.mean_iters),
    )
    print("-----------------------")
    print(f"Testing repetitions: {nrep}")
    print(f"NMPC horizon: {cfg.N}")
    print(f"NMPC dt: {opts.dt_mpc}")
    print(f"Scenario batch: {batch}  (converged: {n_conv}/{batch})")
    print(f"Average NMPC solution time = {res.avg_ms / 1.0:.4f}ms  "
          f"[warm-start reps; p50 {res.p50_ms:.4f} p90 {res.p90_ms:.4f}]")
    print(f"Throughput: {out['solves_per_s']:.1f} solves/s")
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="TPU-native SRBD NMPC benchmark")
    ap.add_argument("--config", default=None,
                    help="reference-format mpc_option.yaml (default: builtin)")
    ap.add_argument("--nrep", type=int, default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--sensitivity", choices=["euler", "exact"], default="euler")
    ap.add_argument("--refine", type=int, default=0)
    args = ap.parse_args(argv)

    opts = load_mpc_options(args.config) if args.config else MpcOptions.default()
    dtype = jnp.float32 if args.dtype == "f32" else jnp.float64
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    run_control_loop(opts, batch=args.batch, dtype=dtype,
                     sensitivity=args.sensitivity, refine=args.refine,
                     nrep=args.nrep)


if __name__ == "__main__":
    main()
