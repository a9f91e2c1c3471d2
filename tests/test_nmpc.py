"""End-to-end NMPC engine tests on the reference benchmark scenario
(NMPC_solver.cpp:332-351: 15 kg stance, yaw 0.2 / forward 0.5 / height 1.0
reference, N=20, dt=0.015).

The reference's only correctness signal at this layer is its own
convergence print ("nmpc solve success!", NMPC_solver.cpp:267-271); these
tests assert the same convergence criteria numerically plus physical
sanity of the converged solution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine


def reference_setup(dtype=jnp.float64, **cfg_kw):
    cfg = engine.NmpcConfig(N=20, sqp_max_iter=15, mu_barrier=0.1,
                            theta_barrier=5.0, **cfg_kw)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        Q_diag=[0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10],
        R_scalar=0.0001,
        Qf_diag=[0.5, 0.5, 0.5, 0.01, 0.01, 0.01, 100, 100, 100, 0.0, 0.0, 100.0],
        N=cfg.N,
        dtype=dtype,
    )
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    state = engine.NmpcState.initial(cfg.N, dtype)
    return params, weights, cfg, state, x0, x_ref


class TestNmpcConvergence:
    def test_converges_on_reference_problem(self):
        params, weights, cfg, state, x0, x_ref = reference_setup()
        state_f, info = jax.jit(engine.solve, static_argnums=(2,))(
            params, weights, cfg, state, x0, x_ref
        )
        assert bool(info.converged), (
            f"theta={float(info.theta):.3e} dphi={float(info.dphi):.3e} "
            f"iters={int(info.sqp_iters)}"
        )
        # convergence thresholds (NMPC_solver.cpp:267)
        assert float(info.theta) < 1e-6
        assert float(info.dphi) > -1e-3

    def test_converged_solution_is_physical(self):
        params, weights, cfg, state, x0, x_ref = reference_setup()
        state_f, info = engine.solve(params, weights, cfg, state, x0, x_ref)
        x, u = np.asarray(state_f.x), np.asarray(state_f.u)

        # dynamics defects ~ 0 along the trajectory
        defects = jax.vmap(
            lambda xk, xk1, uk: srbd.shooting_defect(params, xk, xk1, uk)
        )(state_f.x[:-1], state_f.x[1:], state_f.u)
        assert float(jnp.max(jnp.abs(defects))) < 1e-3

        # initial state honored
        np.testing.assert_allclose(x[0], np.asarray(
            jnp.zeros(12).at[8].set(1.0)), atol=1e-6)

        # The RELAXED barrier (mu_b=0.1, theta_b=5) tolerates bounded
        # violations — the reference itself reports a "maximum friction
        # cone constraint violation (negative value)"
        # (NMPC_solver.cpp:121-122). Violations must stay bounded by the
        # relaxation scale, and normal forces inside [fmin, fmax].
        con = jax.vmap(lambda uu: srbd.constraint_values(params, uu))(state_f.u)
        assert float(jnp.min(con)) > -50.0
        fz = u[:, [2, 8]]
        assert np.all(fz > -1.0) and np.all(fz < 1000.0)

        # vertical force roughly supports the weight (sum Fz ~ m g at the
        # start of the horizon)
        fz_total = u[0, 2] + u[0, 8]
        assert 50.0 < fz_total < 500.0, fz_total

    def test_alpha_reset_mode_also_converges(self):
        params, weights, cfg, state, x0, x_ref = reference_setup(
            persistent_alpha=False
        )
        _, info = engine.solve(params, weights, cfg, state, x0, x_ref)
        assert bool(info.converged)

    def test_exact_sensitivity_converges(self):
        """Exact RK4 sensitivities (the idiomatic-JAX improvement over the
        reference's Euler ones) with per-iteration alpha reset. With the
        reference's *persistent* alpha quirk, exact mode crawls at
        alpha=0.5; with reset it converges and reaches a LOWER merit than
        euler mode (26.41 vs 26.77 measured)."""
        params, weights, cfg, state, x0, x_ref = reference_setup(
            sensitivity="exact", persistent_alpha=False
        )
        _, info = engine.solve(params, weights, cfg, state, x0, x_ref)
        assert bool(info.converged)

        p_e = reference_setup()
        _, info_e = engine.solve(*p_e[:3], *p_e[3:])
        assert float(info.phi) < float(info_e.phi) + 1e-6

    def test_warm_start_converges_immediately(self):
        """Second solve from a converged state must converge in 1 iteration
        (the reference benchmark's rep>0 behavior, NMPC_solver.cpp:359-375)."""
        params, weights, cfg, state, x0, x_ref = reference_setup()
        state_f, _ = engine.solve(params, weights, cfg, state, x0, x_ref)
        _, info2 = engine.solve(params, weights, cfg, state_f, x0, x_ref)
        assert bool(info2.converged)
        assert int(info2.sqp_iters) == 1


class TestNmpcBatched:
    def test_vmap_over_perturbed_x0(self):
        params, weights, cfg, state, x0, x_ref = reference_setup()
        rng = np.random.default_rng(3)
        x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(8, 12)))
        states = jax.tree.map(lambda a: jnp.broadcast_to(a, (8,) + a.shape), state)

        batched = jax.vmap(
            lambda st, xx: engine.solve(params, weights, cfg, st, xx, x_ref)
        )
        states_f, infos = batched(states, x0s)
        assert np.all(np.asarray(infos.converged)), np.asarray(infos.theta)

        # batched result matches a solo solve of the same scenario
        solo_state, solo_info = engine.solve(params, weights, cfg, state, x0s[2], x_ref)
        np.testing.assert_allclose(states_f.u[2], solo_state.u, atol=1e-8)

    def test_f32_converges(self):
        """The TPU dtype: f32 with one refinement pass must still converge
        (looser theta bar scaled to f32 conditioning)."""
        params, weights, cfg, state, x0, x_ref = reference_setup(
            dtype=jnp.float32, refine=1
        )
        state_f, info = engine.solve(params, weights, cfg, state, x0, x_ref)
        assert float(info.theta) < 1e-4, float(info.theta)
        assert float(info.max_defect) < 3e-2

    def test_f32_matches_f64_solution(self):
        """f32 converged controls must be within the <1e-4-grade parity bar
        of the f64 solution (relative to ~100 N force scale)."""
        p64 = reference_setup()
        s64, i64 = engine.solve(*p64[:3], *p64[3:])
        p32 = reference_setup(dtype=jnp.float32, refine=1)
        s32, i32 = engine.solve(*p32[:3], *p32[3:])
        assert bool(i64.converged)
        err = np.max(np.abs(np.asarray(s32.u, np.float64) - np.asarray(s64.u)))
        rel = err / 100.0  # force scale
        assert rel < 1e-3, (err, rel)


class TestLinearizeMeritFusion:
    def test_linearize_aux_matches_merit(self):
        """_linearize_soa's merit byproducts (theta, phi, max|defect|,
        min constraint) must equal the standalone merit(); its q/r outputs
        must equal the merit gradients (the fused SQP step relies on
        Jphi_x == q and Jphi_u == r_eff)."""
        params, weights, cfg, state, x0, x_ref = reference_setup()
        rng = np.random.default_rng(7)
        B = 6
        states = engine.NmpcState(
            x=jnp.asarray(rng.normal(size=(B, cfg.N + 1, 12)) * 0.3),
            u=jnp.asarray(rng.normal(size=(B, cfg.N, 12)) * 30 + 80),
            alpha=jnp.ones(B, jnp.float64),
        )
        *_, q, r, aux = engine._linearize_soa(params, weights, cfg, states, x_ref)
        theta, phi, md, mc = aux

        t_ref, p_ref, defects, con, Jx, Ju = engine.merit(
            params, weights, cfg, states.x, states.u, x_ref, with_grad=True
        )
        np.testing.assert_allclose(theta, t_ref, rtol=1e-12)
        np.testing.assert_allclose(phi, p_ref, rtol=1e-12)
        np.testing.assert_allclose(md, np.max(np.abs(defects), axis=(-2, -1)), rtol=1e-12)
        np.testing.assert_allclose(mc, np.min(np.asarray(con), axis=(-2, -1)), rtol=1e-12)
        np.testing.assert_allclose(jnp.moveaxis(q, -1, 0), Jx, atol=1e-11)
        np.testing.assert_allclose(jnp.moveaxis(r, -1, 0), Ju, atol=1e-11)


class TestFailureStatus:
    def test_success_status_on_reference_problem(self):
        params, weights, cfg, state, x0, x_ref = reference_setup()
        _, info = engine.solve(params, weights, cfg, state, x0, x_ref)
        assert int(info.status) == engine.STATUS_SUCCESS
        assert bool(info.converged)

    def test_nan_x0_reports_nan_detected(self):
        """A NaN initial state must surface as STATUS_NAN_DETECTED — not
        silently exhaust SQP iterations (the engine analogue of the
        reference's try/catch, NMPC_solver.cpp:383-392) — and the returned
        iterate must stay finite (frozen at the last good point)."""
        params, weights, cfg, state, x0, x_ref = reference_setup()
        x0_bad = x0.at[3].set(jnp.nan)
        state_f, info = jax.jit(engine.solve, static_argnums=(2,))(
            params, weights, cfg, state, x0_bad, x_ref
        )
        assert int(info.status) == engine.STATUS_NAN_DETECTED
        assert not bool(info.converged)
        # frozen after the first detection, no wasted iterations
        assert int(info.sqp_iters) == 1
        assert np.all(np.isfinite(np.asarray(state_f.x)))
        assert np.all(np.isfinite(np.asarray(state_f.u)))

    def test_batched_nan_scenario_does_not_poison_batch(self):
        """One NaN scenario in a batch: it is flagged and frozen, the rest
        converge exactly as they would alone."""
        params, weights, cfg, state, x0, x_ref = reference_setup()
        B = 4
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape).copy(), state
        )
        x0s = jnp.broadcast_to(x0, (B, 12)).at[1, 5].set(jnp.nan)
        states_f, infos = jax.jit(engine.solve, static_argnums=(2,))(
            params, weights, cfg, states, x0s, x_ref
        )
        stat = np.asarray(infos.status)
        assert stat[1] == engine.STATUS_NAN_DETECTED
        assert np.all(stat[[0, 2, 3]] == engine.STATUS_SUCCESS)
        assert np.all(np.isfinite(np.asarray(states_f.x)))
        # healthy scenarios match the clean single solve
        s_ref, _ = engine.solve(params, weights, cfg, state, x0, x_ref)
        np.testing.assert_allclose(states_f.u[0], s_ref.u, rtol=0, atol=1e-12)

    def test_pretty_report(self):
        params, weights, cfg, state, x0, x_ref = reference_setup()
        _, info = engine.solve(params, weights, cfg, state, x0, x_ref)
        rep = info.pretty()
        assert "SUCCESS" in rep and "theta" in rep and "sqp_loop" in rep
