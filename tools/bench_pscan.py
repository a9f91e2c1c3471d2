"""Long-horizon Riccati crossover: sequential SoA scan vs associative scan.

Measures the batched QP solve (the engine's two interchangeable backends,
exactly as dispatched by NmpcConfig.qp_kernel) on the real chip across
horizons, to ground the pscan_min_N auto rule with data (verdict-r1 #9).

  sequential: ops.riccati_soa.lqr_solve        — O(N) depth, SoA lanes
  pscan:      ops.riccati_pscan.lqr_solve_pscan — O(log N) depth, AoS,
              vmapped over scenarios (includes the SoA<->AoS boundary
              transposes the engine pays)

The QP data is the REAL benchmark linearization (engine._linearize_soa on
the cold iterate) extended to horizon N, so conditioning and sparsity match
production, not a random QP.

Usage: python tools/bench_pscan.py [--batch 256] [--horizons 20,50,100,200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed_median(fn, reps=5):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--horizons", default="20,50,100,200")
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()
    B = args.batch

    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.ocpqp.data import OcpQp
    from srbd_nmpc_tpu.ops import riccati_soa
    from srbd_nmpc_tpu.ops.riccati_pscan import lqr_solve_pscan

    dtype = jnp.float32
    print(f"backend={jax.default_backend()} batch={B} dtype=f32")
    print(f"{'N':>5s} {'seq ms':>9s} {'pscan ms':>9s}  winner")

    for N in [int(s) for s in args.horizons.split(",")]:
        cfg = engine.NmpcConfig(N=N, sqp_max_iter=15)
        params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
        weights = engine.NmpcWeights.create(
            Q_diag=[0] * 11 + [10], R_scalar=1e-4,
            Qf_diag=[.5] * 3 + [.01] * 3 + [100.0] * 3 + [0, 0, 100.0],
            N=N, dtype=dtype)
        x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
        rng = np.random.default_rng(0)
        states = engine.NmpcState(
            x=jnp.asarray(rng.normal(size=(B, N + 1, 12)) * 0.1, dtype),
            u=jnp.asarray(rng.normal(size=(B, N, 12)) * 20 + 90, dtype),
            alpha=jnp.ones(B, dtype))
        x0s = jnp.asarray(
            np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 12)), dtype)

        with jax.default_matmul_precision("float32"):
            A, Bm, b, Q, S, R, q, r, _ = engine._linearize_soa(
                params, weights, cfg, states, x_ref)
        A, Bm, b, Q, S, R, q, r = jax.block_until_ready(
            (A, Bm, b, Q, S, R, q, r))
        dx0s = jnp.moveaxis(x0s - states.x[:, 0, :], 0, -1)

        @jax.jit
        def seq(b_in):
            with jax.default_matmul_precision("float32"):
                dx, du, _ = riccati_soa.lqr_solve(
                    A, Bm, b_in, Q, S, R, q, r, dx0s, reg=1e-9)
            return du

        @jax.jit
        def pscan(b_in):
            with jax.default_matmul_precision("float32"):
                f = lambda z: jnp.moveaxis(z, -1, 0)
                qp = OcpQp(A=f(A), B=f(Bm), b=f(b_in), Q=f(Q), S=f(S),
                           R=f(R), q=f(q), r=f(r))
                sol = jax.vmap(
                    lambda qq, d: lqr_solve_pscan(qq, d, reg=1e-9)
                )(qp, jnp.moveaxis(dx0s, -1, 0))
            return jnp.transpose(sol.u, (1, 2, 0))

        # parity first: a fast wrong kernel is not a winner
        du_s, du_p = seq(b), pscan(b)
        err = float(jnp.max(jnp.abs(du_s - du_p))
                    / (1e-9 + float(jnp.max(jnp.abs(du_s)))))
        assert err < 1e-2, f"N={N}: seq/pscan rel err {err}"

        t_seq = _timed_median(lambda: seq(b), args.reps)
        t_ps = _timed_median(lambda: pscan(b), args.reps)
        win = "pscan" if t_ps < t_seq else "seq"
        print(f"{N:5d} {t_seq*1e3:9.3f} {t_ps*1e3:9.3f}  {win}"
              f"  (rel err {err:.1e})")


if __name__ == "__main__":
    main()
