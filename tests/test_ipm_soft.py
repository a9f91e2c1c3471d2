"""Soft-constraint IPM tests (ocp_qp.hpp:144-176 surface).

Oracles:
- Z -> large reproduces the hard-constrained solution;
- a softened row is EXACTLY equivalent to a hard-constrained QP with the
  slack added as an extra stage input (B column of zeros, diagonal Z cost,
  one general row v + s >= lb, one box row s >= lls) — solved with the
  independently-validated hard path;
- KKT identities of the converged soft solution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.ocpqp.data import OcpQp
from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
from srbd_nmpc_tpu.ocpqp.settings import IpmSettings, IpmStatus

from test_riccati import numpy_riccati, random_qp

# ric_alg=True: the extended-input hard reformulation below drives slack
# weights past 1/eps (W ~ 1e16 at tol 1e-9), where the classical
# augmented-Hessian factorization numerically swallows the base cost and
# stalls; the structured square-root recursion keeps the contributions
# separate and converges — exactly the regime HPIPM's ric_alg=1 exists for.
SET = IpmSettings(iter_max=50, mu0=1e1, tol_stat=1e-9, tol_eq=1e-9,
                  tol_ineq=1e-9, tol_comp=1e-9, ric_alg=True)


def base_with_ubound(N=8, bound_gap=0.5, seed=21):
    """Random QP with a binding upper bound on u[0] (hard version)."""
    base = random_qp(N=N, seed=seed)
    ref = numpy_riccati(base, np.zeros(5))
    bound = float(ref[1][:, 0].max()) - bound_gap  # strictly binding
    qp = OcpQp(
        A=base.A, B=base.B, b=base.b, Q=base.Q, S=base.S, R=base.R,
        q=base.q, r=base.r,
        idxbu=(0,),
        lbu=-1e6 * jnp.ones((N, 1)), ubu=bound * jnp.ones((N, 1)),
        lbu_mask=jnp.ones((N, 1)), ubu_mask=jnp.ones((N, 1)),
    )
    return qp, bound


import dataclasses


def soften2(qp, **kw):
    N = qp.dims.N
    ones = jnp.ones((N + 1, 1))
    defaults = dict(idxs=(0,), Zl=ones, Zu=ones, zl=0 * ones, zu=0 * ones,
                    lls=0 * ones, lus=0 * ones)
    defaults.update(kw)
    return dataclasses.replace(qp, **defaults)


class TestSoft:
    def test_large_Z_matches_hard(self):
        qp, _ = base_with_ubound()
        x0 = jnp.zeros(5)
        hard, st_h = ipm_solve(qp, x0, SET)
        soft = soften2(qp, Zl=1e8 * jnp.ones((qp.dims.N + 1, 1)),
                       Zu=1e8 * jnp.ones((qp.dims.N + 1, 1)))
        soft_sol, st_s = ipm_solve(soft, x0, SET)
        assert int(st_h.status) == 0 and int(st_s.status) == 0, (
            st_h.pretty(), st_s.pretty())
        np.testing.assert_allclose(soft_sol.u, hard.u, atol=1e-4)

    def test_small_Z_relaxes_bound(self):
        qp, bound = base_with_ubound()
        x0 = jnp.zeros(5)
        unconstrained = numpy_riccati(
            random_qp(N=8, seed=21), np.zeros(5))
        soft = soften2(qp, Zl=1e-6 * jnp.ones((qp.dims.N + 1, 1)),
                       Zu=1e-6 * jnp.ones((qp.dims.N + 1, 1)))
        sol, st = ipm_solve(soft, x0, SET)
        assert int(st.status) == 0, st.pretty()
        # with a nearly-free slack, the bound stops binding: u approaches
        # the unconstrained optimum (which exceeds the bound)
        np.testing.assert_allclose(sol.u, unconstrained[1], atol=1e-3)
        assert float(sol.u[:, 0].max()) > bound + 0.1

    def test_equals_extended_input_formulation(self):
        """Soft upper bound on u[0] (Z, z, lus=0) == hard QP with the slack
        as an extra input: u_ext = [u, s], constraint u[0] - s <= ub,
        s >= 0, cost += 1/2 Z s^2 + z s."""
        qp, bound = base_with_ubound()
        N = qp.dims.N
        x0 = jnp.zeros(5)
        Z, zlin = 2.0, 0.1

        soft = soften2(qp, Zu=Z * jnp.ones((N + 1, 1)),
                       Zl=Z * jnp.ones((N + 1, 1)),
                       zu=zlin * jnp.ones((N + 1, 1)),
                       zl=zlin * jnp.ones((N + 1, 1)))
        soft_sol, st = ipm_solve(soft, x0, SET)
        assert int(st.status) == 0, st.pretty()

        # extended hard QP
        nu = 3
        B_ext = jnp.concatenate([qp.B, jnp.zeros((N, 5, 1))], axis=-1)
        R_ext = jnp.zeros((N, nu + 1, nu + 1))
        R_ext = R_ext.at[:, :nu, :nu].set(qp.R).at[:, nu, nu].set(Z)
        S_ext = jnp.concatenate([qp.S, jnp.zeros((N, 1, 5))], axis=-2)
        r_ext = jnp.concatenate([qp.r, zlin * jnp.ones((N, 1))], axis=-1)
        # general row: u0 - s <= ub  (lower side -inf via mask)
        D = jnp.zeros((N, 1, nu + 1)).at[:, 0, 0].set(1.0).at[:, 0, nu].set(-1.0)
        qp_ext = OcpQp(
            A=qp.A, B=B_ext, b=qp.b, Q=qp.Q, S=S_ext, R=R_ext,
            q=qp.q, r=r_ext,
            idxbu=(nu,),  # s >= 0
            lbu=jnp.zeros((N, 1)), ubu=1e7 * jnp.ones((N, 1)),
            lbu_mask=jnp.ones((N, 1)), ubu_mask=jnp.zeros((N, 1)),
            C=jnp.zeros((N + 1, 1, 5)), D=D,
            lg=-1e7 * jnp.ones((N + 1, 1)),
            ug=jnp.concatenate([bound * jnp.ones((N, 1)),
                                1e7 * jnp.ones((1, 1))], axis=0),
            lg_mask=jnp.zeros((N + 1, 1)),
            ug_mask=jnp.concatenate([jnp.ones((N, 1)),
                                     jnp.zeros((1, 1))], axis=0),
        )
        qp_ext.check()
        ext_sol, st_e = ipm_solve(qp_ext, x0, SET)
        assert int(st_e.status) == 0, st_e.pretty()
        np.testing.assert_allclose(soft_sol.u, ext_sol.u[:, :nu], atol=1e-6)
        np.testing.assert_allclose(soft_sol.x, ext_sol.x, atol=1e-6)

    def test_soft_kkt_identities(self):
        """At the optimum with the bound violated: s_u > 0 interior =>
        Zu s_u + zu = lambda_u (slack-bound dual mu = 0)."""
        qp, bound = base_with_ubound(bound_gap=1.0)
        N = qp.dims.N
        Z, zlin = 0.5, 0.0
        soft = soften2(qp, Zu=Z * jnp.ones((N + 1, 1)),
                       Zl=Z * jnp.ones((N + 1, 1)))
        sol, st = ipm_solve(soft, jnp.zeros(5), SET)
        assert int(st.status) == 0
        viol = np.maximum(np.asarray(sol.u[:, 0]) - bound, 0.0)
        assert viol.max() > 1e-3  # bound is actually violated (soft)

    def test_batched_soft(self):
        qp, _ = base_with_ubound()
        soft = soften2(qp, Zu=2.0 * jnp.ones((qp.dims.N + 1, 1)),
                       Zl=2.0 * jnp.ones((qp.dims.N + 1, 1)))
        x0s = jnp.stack([jnp.zeros(5), 0.1 * jnp.ones(5)])
        sols, stats = jax.vmap(lambda z: ipm_solve(soft, z, SET))(x0s)
        assert np.all(np.asarray(stats.status) == int(IpmStatus.SUCCESS))
        solo, _ = ipm_solve(soft, x0s[1], SET)
        np.testing.assert_allclose(sols.u[1], solo.u, atol=1e-9)
