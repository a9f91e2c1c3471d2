"""Per-stage TPU timing breakdown of the batched NMPC hot path.

Times each pipeline stage (linearize, Riccati QP kernel, merit, full
sqp_step, full solve) at the benchmark shape, each wrapped in a jitted
fori_loop of REPS iterations so the remote-dispatch overhead amortizes
(CLAUDE.md: sub-ms one-shot timings through the tunnel are meaningless).

Usage: python tools/profile_stages.py [--batch 4096] [--reps 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, reps):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.3f} ms/call")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()
    B, reps = args.batch, args.reps

    from srbd_nmpc_tpu.models import srbd
    from srbd_nmpc_tpu.nmpc import engine
    from srbd_nmpc_tpu.ops import riccati_pallas
    from srbd_nmpc_tpu.models import merit_pallas

    dtype = jnp.float32
    cfg = engine.NmpcConfig(N=20, sqp_max_iter=15)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        Q_diag=[0] * 11 + [10], R_scalar=1e-4,
        Qf_diag=[.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100],
        N=cfg.N, dtype=dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 12)), dtype)
    state = engine.NmpcState(
        x=jnp.asarray(rng.normal(size=(B, cfg.N + 1, 12)) * 0.1, dtype),
        u=jnp.asarray(rng.normal(size=(B, cfg.N, 12)) * 20 + 90, dtype),
        alpha=jnp.ones(B, dtype))

    with jax.default_matmul_precision("float32"):
        A, Bm, b, Q, S, R, q, r, aux = engine._linearize_soa(
            params, weights, cfg, state, x_ref)
    A, Bm, b, Q, S, R, q, r = jax.block_until_ready((A, Bm, b, Q, S, R, q, r))
    dx0s = jnp.moveaxis(x0s - state.x[:, 0, :], 0, -1)

    # --- stage: linearize (incl. merit aux) ---
    @jax.jit
    def lin_loop(state, x_ref):
        def body(i, acc):
            with jax.default_matmul_precision("float32"):
                st = engine.NmpcState(x=state.x + acc * 0, u=state.u, alpha=state.alpha)
                out = engine._linearize_soa(params, weights, cfg, st, x_ref)
            return acc + out[2][0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    # --- stage: fused Pallas linearize (+merit partials) ---
    @jax.jit
    def lin_pallas_loop(state, x_ref):
        def body(i, acc):
            with jax.default_matmul_precision("float32"):
                st = engine.NmpcState(x=state.x + acc * 0, u=state.u, alpha=state.alpha)
                out = engine._linearize_pallas(params, weights, cfg, st, x_ref)
            return acc + out[2][0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    # --- stage: Riccati pallas (const-Q variant, the engine's path) ---
    @jax.jit
    def ric_loop(A, Bm, b, R, q, r, dx0s):
        def body(i, acc):
            with jax.default_matmul_precision("float32"):
                x_s, u_s = riccati_pallas.lqr_solve_pallas(
                    A, Bm, b + acc * 0, (weights.Q, weights.Qf), R, q, r,
                    dx0s, reg=1e-9, block=256)
            return acc + u_s[0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    # --- stage: merit pallas (line-search candidate eval) ---
    Ac, bc = srbd.constraint_matrix(params)
    xs_t = jnp.transpose(state.x, (1, 2, 0))
    us_t = jnp.transpose(state.u, (1, 2, 0))
    xr_t = jnp.broadcast_to(jnp.transpose(x_ref[None], (1, 2, 0)),
                            (cfg.N + 1, 12, B))

    @jax.jit
    def merit_loop(xs_t, us_t, xr_t):
        def body(i, acc):
            with jax.default_matmul_precision("float32"):
                th, ph, Jx, Ju, md, mc = merit_pallas.merit_pallas(
                    params, weights.Q, weights.Qf, weights.R, Ac, bc,
                    xs_t + acc * 0, us_t, xr_t, cfg.mu_barrier,
                    cfg.theta_barrier, block=256)
            return acc + th[0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    # --- stage: fused one-pass SQP QP kernel (the engine's round-3 path) ---
    from srbd_nmpc_tpu.ops import sqp_pallas
    dxs_t = jnp.zeros_like(xs_t)
    dus_t = jnp.zeros_like(us_t)
    alpha_b = jnp.ones((B,), dtype)

    @jax.jit
    def onepass_loop(xs_t, us_t, xr_t, dx0s):
        def body(i, acc):
            with jax.default_matmul_precision("float32"):
                dx, du, dphi, aux = sqp_pallas.sqp_qp_solve_onepass(
                    params, weights.Q, weights.Qf, weights.R, Ac, bc,
                    xs_t + acc * 0, us_t, xr_t, dx0s,
                    cfg.mu_barrier, cfg.theta_barrier, reg=1e-9, block=256)
            return acc + du[0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    # --- stage: alpha-folded line-search merit kernel ---
    @jax.jit
    def merit_alpha_loop(xs_t, us_t, xr_t, dxs_t, dus_t, alpha_b):
        def body(i, acc):
            with jax.default_matmul_precision("float32"):
                th, ph = merit_pallas.merit_alpha_pallas(
                    params, weights.Q, weights.Qf, weights.R, Ac, bc,
                    xs_t + acc * 0, us_t, xr_t, dxs_t, dus_t, alpha_b,
                    cfg.mu_barrier, cfg.theta_barrier, block=256)
            return acc + th[0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    # --- stage: plane-phase one-pass kernel (ops/sqp_planes, the
    # production path; alpha=0 bootstrap mode) ---
    from srbd_nmpc_tpu.ops import sqp_planes
    x0s_t = jnp.moveaxis(x0s, 0, -1)

    @jax.jit
    def planes_loop(xs_t, us_t, xr_t, x0s_t):
        zx = jnp.zeros_like(xs_t)
        zu = jnp.zeros_like(us_t)
        za = jnp.zeros((B,), dtype)

        def body(i, acc):
            with jax.default_matmul_precision("float32"):
                dx, du, dphi, aux = sqp_planes.sqp_qp_solve_onepass_planes(
                    params, weights.Q, weights.Qf, weights.R, Ac, bc,
                    xs_t + acc * 0, us_t, xr_t, zx, zu, za, x0s_t,
                    cfg.mu_barrier, cfg.theta_barrier, reg=1e-9, block=256)
            return acc + du[0, 0, 0] * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dtype))

    # --- stage: one full SoA sqp step (incl. line search + masking glue) ---
    act_b = jnp.ones((B,), bool)

    @jax.jit
    def step_soa_loop(xs_t, us_t, xr_t, x0s_t):
        def body(i, carry):
            xa, us, al = carry
            with jax.default_matmul_precision("float32"):
                xa2, us2, al2, _ = engine._sqp_step_soa(
                    params, weights, cfg, xa, us, al, x0s_t, xr_t, act_b)
            return (xa2, us2, al2)
        return jax.lax.fori_loop(0, reps, body, (xs_t, us_t, alpha_b))

    # --- stage: one full sqp_step ---
    @jax.jit
    def step_loop(state, x0s, x_ref):
        def body(i, carry):
            st, _ = engine.sqp_step(params, weights, cfg,
                                    engine.NmpcState(x=carry.x, u=carry.u,
                                                     alpha=carry.alpha),
                                    x0s, x_ref)
            return st
        return jax.lax.fori_loop(0, reps, body, state)

    # --- full solve ---
    @jax.jit
    def full_solve(x0s, x_ref):
        st = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                          engine.NmpcState.initial(cfg.N, dtype))
        return engine.solve(params, weights, cfg, st, x0s, x_ref)

    print(f"batch={B} reps={reps} backend={jax.default_backend()}")
    t_lin = timed("linearize_soa (+merit aux)", lambda: lin_loop(state, x_ref), reps)
    t_linp = timed("linearize_pallas (fused)", lambda: lin_pallas_loop(state, x_ref), reps)
    t_ric = timed("riccati lqr_solve_pallas", lambda: ric_loop(A, Bm, b, R, q, r, dx0s), reps)
    t_mer = timed("merit_pallas (line-search eval)", lambda: merit_loop(xs_t, us_t, xr_t), reps)
    t_one = timed("sqp_qp_solve_onepass (fused)",
                  lambda: onepass_loop(xs_t, us_t, xr_t, dx0s), reps)
    t_pln = timed("sqp_qp_solve_onepass_planes",
                  lambda: planes_loop(xs_t, us_t, xr_t, x0s_t), reps)
    t_mal = timed("merit_alpha_pallas (ls candidate)",
                  lambda: merit_alpha_loop(xs_t, us_t, xr_t, dxs_t, dus_t,
                                           alpha_b), reps)
    t_ssoa = timed("full SoA sqp step (fused+ls+glue)",
                   lambda: step_soa_loop(xs_t, us_t, xr_t, x0s_t), reps)
    t_stp = timed("full sqp_step", lambda: step_loop(state, x0s, x_ref), reps)
    t0 = time.perf_counter()
    jax.block_until_ready(full_solve(x0s, x_ref))
    compile_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(full_solve(x0s, x_ref))
    t_solve = time.perf_counter() - t0
    print(f"{'full cold solve (batch)':34s} {t_solve*1e3:9.3f} ms  "
          f"(compile+1st {compile_dt:.1f}s)")
    print(f"accounting: step={t_stp*1e3:.3f} ms =? lin {t_lin*1e3:.3f} + "
          f"ric {t_ric*1e3:.3f} + ~1.x * merit {t_mer*1e3:.3f}")


if __name__ == "__main__":
    main()
