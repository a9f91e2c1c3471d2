"""Split the stage-plane kernel's time: planes phase + fold vs Riccati.

Times the production planes kernel (ops/sqp_planes) against a variant
whose backward-Riccati stage body is monkeypatched to a trivial
passthrough (data deps kept so nothing is DCE'd). The difference is the
Riccati share; decides whether the next lever is the backward stage
(e.g. the rank-6 B Woodbury reduction of the 12x12 G-solve) or the
plane phase. Run on the chip:

    python tools/probe_planes_split.py [--batch 16384]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--factor", action="store_true")
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()
    B, REPS = args.batch, args.reps

    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.ops import sqp_planes

    dtype = jnp.float32
    N = 20
    cfg = engine.NmpcConfig(N=N)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    w = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], N, dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.3, dtype)
    us = jnp.asarray(rng.normal(size=(N, 12, B)) * 30 + 80, dtype)
    xra = jnp.broadcast_to(x_ref[:, :, None], (N + 1, 12, B)).astype(dtype)
    x0s = jnp.asarray(np.asarray(x0)[:, None]
                      + 0.01 * rng.normal(size=(12, B)), dtype)
    dxc = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.05, dtype)
    duc = jnp.asarray(rng.normal(size=(N, 12, B)) * 2.0, dtype)
    alpha = jnp.asarray(0.5 * np.ones(B), dtype)
    Ac, bc = srbd.constraint_matrix(params)

    def stub_riccati(dt, m_inv, D1, D2, SF, Sr, Sl, Qw_b, Reff, reff, q, b,
                     P, p, reg, with_acl=True, return_factor=False):
        # trivial passthrough with live data deps (nothing DCE-able)
        K = jnp.broadcast_to(q[:, None], Reff.shape) * 1e-3
        if return_factor:
            return (P + 1e-6 * Reff, p + 1e-6 * q, K, q * 1e-3 + 1.0,
                    K, b)
        return P + 1e-6 * Reff, p + 1e-6 * q, None, K, None, b

    def timed(tag):
        @jax.jit
        def loop(xa, us):
            def body(i, carry):
                acc, xx = carry
                with jax.default_matmul_precision("float32"):
                    dx, du, dphi, aux = \
                        sqp_planes.sqp_qp_solve_onepass_planes(
                            params, w.Q, w.Qf, w.R, Ac, bc, xx, us, xra,
                            dxc, duc, alpha, x0s, cfg.mu_barrier,
                            cfg.theta_barrier, reg=1e-9, block=args.block,
                            factor=args.factor)
                return acc + dphi[0] * 1e-20, xx + dx * 1e-20
            return jax.lax.fori_loop(
                0, REPS, body, (jnp.asarray(0.0, dtype), xa))[0]

        t0 = time.perf_counter()
        float(loop(xa, us))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(xa, us))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{tag:22s} {dt*1e3:8.3f} ms/call  (compile {c:.1f}s)",
              flush=True)
        return dt

    t_full = timed("planes kernel (full)")
    orig = sqp_planes._riccati_stage_structured
    sqp_planes._riccati_stage_structured = stub_riccati
    try:
        t_stub = timed("riccati stubbed")
    finally:
        sqp_planes._riccati_stage_structured = orig
    print(f"=> riccati share ~ {(t_full - t_stub)*1e3:.3f} ms "
          f"({100*(t_full-t_stub)/t_full:.0f} %); planes+fold+IO ~ "
          f"{t_stub*1e3:.3f} ms")


if __name__ == "__main__":
    main()
