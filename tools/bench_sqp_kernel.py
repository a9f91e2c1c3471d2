"""A/B the fused SQP QP-solve kernels on the real chip: two-pass
(sqp_qp_solve: backward kernel -> HBM -> forward kernel) vs one-pass
(sqp_qp_solve_onepass: both phases in one kernel, stage tensors
VMEM-resident). Prints per-variant ms/call + parity.

Usage: timeout 900 python tools/bench_sqp_kernel.py [B] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = jnp.float32

    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.ops import sqp_pallas

    cfg = engine.NmpcConfig(N=N)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], N, dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.3, dtype)
    us = jnp.asarray(rng.normal(size=(N, 12, B)) * 30 + 80, dtype)
    xra = jnp.broadcast_to(x_ref[:, :, None], (N + 1, 12, B)).astype(dtype)
    dx0 = jnp.asarray(rng.normal(size=(12, B)) * 0.02, dtype)
    Ac, bc = srbd.constraint_matrix(params)

    args = (params, weights.Q, weights.Qf, weights.R, Ac, bc,
            xa, us, xra, dx0)

    # mu_b/theta_b/reg must stay static (Python floats) — traced scalars
    # would be captured constants inside the kernel trace
    REPS = 50
    with jax.default_matmul_precision("float32"):
        raw = {
            "twopass": lambda xa_in: sqp_pallas.sqp_qp_solve(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa_in, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=256),
            "onepass": lambda xa_in: sqp_pallas.sqp_qp_solve_onepass(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa_in, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=256),
        }
        outs = {}
        for name, f in raw.items():
            # fori_loop with the output perturbing the next call's
            # TRAJECTORY input: amortizes the remote-dispatch overhead
            # (sub-ms one-shot timings through the tunnel are meaningless)
            # and defeats DCE/hoisting. NOTE: an earlier version carried
            # only dx0 (which feeds just the forward phase) and printed
            # impossibly fast numbers (0.121 ms/call at B=4096, ~20x above
            # any VPU roofline; tools/profile_stages.py measures 11.2
            # ms/call at B=16384) — perturb the MAIN operand and
            # sanity-check against profile_stages.py.
            def body(_, acc, f=f):
                dx, _, _, _ = f(acc)
                return acc + 1e-20 * dx[1][None]

            looped = jax.jit(
                lambda xa_in, body=body: jax.lax.fori_loop(0, REPS, body, xa_in))
            t0 = time.perf_counter()
            jax.block_until_ready(looped(xa))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(looped(xa))
            per_call = (time.perf_counter() - t0) / REPS * 1e3
            print(f"{name}: {per_call:.3f} ms/call (compile {compile_s:.1f}s, "
                  f"B={B}, N={N}, {REPS} reps in-loop)")
            outs[name] = jax.block_until_ready(jax.jit(f)(xa))

    du_err = float(jnp.max(jnp.abs(outs["onepass"][1] - outs["twopass"][1])))
    dx_err = float(jnp.max(jnp.abs(outs["onepass"][0] - outs["twopass"][0])))
    print(f"parity: max|ddu|={du_err:.3e} max|ddx|={dx_err:.3e}")
    assert du_err < 1e-3 and dx_err < 1e-4, "onepass/twopass parity FAILED"
    print("OK")


if __name__ == "__main__":
    main()
