"""SoA ("batch-in-lanes") constrained-IPM parity tests.

The TPU hot-path solver ocpqp.ipm_soa must reproduce ``vmap(ipm_solve)``
(the AoS f64 oracle, itself validated against the analytic Riccati, the
monolithic dense KKT solver, and the reference's OSQP goldens) to 1e-6 on
every problem class of tests/test_ipm.py: box+general constraints, masks,
soft constraints, warm start, and the unconstrained iter==0 contract.
Ref bar: d_ocp_qp_ipm_solve (ocp_qp_ipm_solver.cpp:334).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.ocpqp.data import OcpQp
from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
from srbd_nmpc_tpu.ocpqp.ipm_soa import ipm_solve_soa
from srbd_nmpc_tpu.ocpqp.settings import IpmMode, IpmSettings, IpmStatus

from test_ipm import constrained_random_qp
from test_ipm_soft import base_with_ubound, soften2
from test_riccati import numpy_riccati, random_qp


def batch_qp(qps):
    """Stack a list of same-shaped OcpQps into one batched OcpQp."""
    leaves = {}
    ref = qps[0]
    for f in dataclasses.fields(ref):
        vals = [getattr(q, f.name) for q in qps]
        if isinstance(vals[0], (jnp.ndarray, np.ndarray)):
            leaves[f.name] = jnp.stack(vals)
        else:
            leaves[f.name] = vals[0]
    return OcpQp(**leaves)


def assert_matches_vmapped_aos(qp, x0s, settings, atol=1e-6):
    """qp shared (unbatched leaves); x0s [B, nx]."""
    sol_soa, st_soa = jax.jit(ipm_solve_soa, static_argnums=2)(
        qp, x0s, settings)
    sol_aos, st_aos = jax.vmap(lambda z: ipm_solve(qp, z, settings))(x0s)
    np.testing.assert_allclose(sol_soa.x, sol_aos.x, atol=atol)
    np.testing.assert_allclose(sol_soa.u, sol_aos.u, atol=atol)
    np.testing.assert_allclose(sol_soa.pi, sol_aos.pi, atol=atol)
    # P/K are re-derived at the converged iterate whose slack weights are
    # W = lam/s with s ~ 1e-9: the ~1e-9 iterate differences between the
    # SoA rank-1 and AoS einsum arithmetic move W (and so the augmented P)
    # at O(1) relative scale — intrinsic sensitivity of the diagnostic
    # surface, not an algorithmic gap (primal/dual parity is 1e-6). The
    # gain K = -G^-1 H is ratio-like and stays comparable.
    np.testing.assert_allclose(sol_soa.K, sol_aos.K, atol=5e-3)
    P = np.asarray(sol_soa.P)
    assert np.all(np.isfinite(P))
    np.testing.assert_allclose(P, np.swapaxes(P, -1, -2), atol=1e-6 *
                               max(1.0, float(np.abs(P).max())))
    np.testing.assert_array_equal(np.asarray(st_soa.status),
                                  np.asarray(st_aos.status))
    return sol_soa, st_soa, sol_aos, st_aos


class TestUnconstrainedSoA:
    def test_matches_riccati_oracle_iter0(self):
        qp = random_qp(N=20)
        x0 = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=(3, 5)))
        sol, stats = ipm_solve_soa(qp, x0, IpmSettings())
        assert np.all(np.asarray(stats.iter) == 0)
        assert np.all(np.asarray(stats.status) == int(IpmStatus.SUCCESS))
        for i in range(3):
            x, u, pi, P, p, K, k = numpy_riccati(qp, np.asarray(x0[i]))
            np.testing.assert_allclose(sol.x[i], x, atol=1e-9)
            np.testing.assert_allclose(sol.u[i], u, atol=1e-9)
            np.testing.assert_allclose(sol.pi[i], pi, atol=1e-9)
            np.testing.assert_allclose(sol.K[i], K, atol=1e-9)


class TestConstrainedSoA:
    def test_shared_qp_batched_x0(self):
        """One shared constrained QP, a batch of initial states."""
        qp, x0 = constrained_random_qp()
        x0s = jnp.stack([x0 + 0.02 * i for i in range(4)])
        settings = IpmSettings(iter_max=30, mu0=1e1)
        _, st_soa, _, st_aos = assert_matches_vmapped_aos(qp, x0s, settings)
        assert np.all(np.asarray(st_soa.status) == int(IpmStatus.SUCCESS))
        # per-scenario iteration counts and residuals agree too
        np.testing.assert_array_equal(np.asarray(st_soa.iter),
                                      np.asarray(st_aos.iter))
        np.testing.assert_allclose(st_soa.max_res_comp, st_aos.max_res_comp,
                                   atol=1e-9)

    def test_fully_batched_qp_data(self):
        """Every scenario has its own QP (different seeds) — the general
        batched-data path."""
        qps, x0s = zip(*[constrained_random_qp(N=10, seed=100 + i)
                         for i in range(3)])
        qp_b = batch_qp(list(qps))
        x0s = jnp.stack(x0s)
        settings = IpmSettings(iter_max=30, mu0=1e1)
        sol_soa, st_soa = ipm_solve_soa(qp_b, x0s, settings)
        for i in range(3):
            sol_i, st_i = ipm_solve(qps[i], x0s[i], settings)
            np.testing.assert_allclose(sol_soa.x[i], sol_i.x, atol=1e-6)
            np.testing.assert_allclose(sol_soa.u[i], sol_i.u, atol=1e-6)
            assert int(st_soa.status[i]) == int(st_i.status)

    def test_per_scenario_iteration_freeze(self):
        """A batch mixing an easy and a hard scenario: the easy one's
        per-scenario history must stop changing at ITS convergence
        iteration, not the batch's."""
        qp, x0 = constrained_random_qp()
        x0s = jnp.stack([x0, x0 * 3.0])  # the scaled one works harder
        settings = IpmSettings(iter_max=40, mu0=1e1)
        _, st = ipm_solve_soa(qp, x0s, settings)
        it0, it1 = int(st.iter[0]), int(st.iter[1])
        mu_hist = np.asarray(st.mu)       # [B, iter_max+1]
        for b, itb in ((0, it0), (1, it1)):
            # rows past a scenario's own exit stay exactly zero
            assert np.all(mu_hist[b, itb + 1:] == 0.0), (b, itb)
            assert np.all(mu_hist[b, 1:itb + 1] > 0.0)

    def test_masks_and_one_sided_bounds(self):
        base = random_qp(N=8)
        N = 8
        ref = numpy_riccati(base, np.zeros(5))
        bound = float(ref[1][0, 0]) - 0.5

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

        x0s = jnp.zeros((2, 5))
        settings = IpmSettings(iter_max=30, mu0=1e0)
        sol_on, _ = ipm_solve_soa(make(1.0), x0s, settings)
        sol_off, _ = ipm_solve_soa(make(0.0), x0s, settings)
        assert float(sol_on.u[0, 0, 0]) <= bound + 1e-6
        np.testing.assert_allclose(sol_off.u[0], ref[1], atol=1e-6)

    def test_warm_start(self):
        qp, x0 = constrained_random_qp(N=10, seed=321)
        cold = IpmSettings(iter_max=40, mu0=1e1)
        x0s = jnp.stack([x0, x0 + 0.01])
        sol, st = ipm_solve_soa(qp, x0s, cold)
        assert np.all(np.asarray(st.status) == int(IpmStatus.SUCCESS))
        # warm-start the PERTURBED problems from the base solutions (the
        # AoS test's pattern: an exact restart is degenerate for IPMs —
        # active slacks sit on the floor and the first step blows up)
        x0p = x0s + 0.001
        warm = dataclasses.replace(cold, warm_start=True, mu0=1e-2)
        sol_w, st_w = ipm_solve_soa(qp, x0p, warm, warm_start=sol)
        sol_c, st_c = ipm_solve_soa(qp, x0p, cold)
        assert np.all(np.asarray(st_w.status) == int(IpmStatus.SUCCESS))
        np.testing.assert_allclose(sol_w.u, sol_c.u, atol=1e-5)

    def test_speed_abs_mode(self):
        qp, x0 = constrained_random_qp()
        common = dict(iter_max=40, mu0=1e1, tol_comp=1e-3,
                      tol_stat=1e-14, tol_eq=1e-14, tol_ineq=1e-14)
        s_abs = IpmSettings(mode=IpmMode.SPEED_ABS, **common)
        s_rel = IpmSettings(mode=IpmMode.SPEED, **common)
        x0s = x0[None]
        _, st_a = ipm_solve_soa(qp, x0s, s_abs)
        _, st_r = ipm_solve_soa(qp, x0s, s_rel)
        assert int(st_a.status[0]) == int(IpmStatus.SUCCESS)
        assert int(st_a.iter[0]) < int(st_r.iter[0])


class TestSoftSoA:
    def test_soft_matches_aos(self):
        qp, _ = base_with_ubound()
        soft = soften2(qp, Zu=2.0 * jnp.ones((qp.dims.N + 1, 1)),
                       Zl=2.0 * jnp.ones((qp.dims.N + 1, 1)),
                       zu=0.1 * jnp.ones((qp.dims.N + 1, 1)),
                       zl=0.1 * jnp.ones((qp.dims.N + 1, 1)))
        settings = IpmSettings(iter_max=50, mu0=1e1, tol_stat=1e-9,
                               tol_eq=1e-9, tol_ineq=1e-9, tol_comp=1e-9)
        x0s = jnp.stack([jnp.zeros(5), 0.1 * jnp.ones(5)])
        assert_matches_vmapped_aos(soft, x0s, settings)

    def test_large_Z_matches_hard(self):
        qp, _ = base_with_ubound()
        N = qp.dims.N
        settings = IpmSettings(iter_max=50, mu0=1e1, tol_stat=1e-9,
                               tol_eq=1e-9, tol_ineq=1e-9, tol_comp=1e-9)
        x0s = jnp.zeros((1, 5))
        hard, st_h = ipm_solve_soa(qp, x0s, settings)
        soft = soften2(qp, Zl=1e8 * jnp.ones((N + 1, 1)),
                       Zu=1e8 * jnp.ones((N + 1, 1)))
        soft_sol, st_s = ipm_solve_soa(soft, x0s, settings)
        assert int(st_h.status[0]) == 0 and int(st_s.status[0]) == 0
        np.testing.assert_allclose(soft_sol.u, hard.u, atol=1e-4)
