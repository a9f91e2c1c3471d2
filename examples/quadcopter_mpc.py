"""Closed-loop quadcopter MPC demo: box constraints, one-sided masks,
warm start.

Parity with the reference example
(/root/reference/hpipm-cpp/examples/example_mpc.cpp): the OSQP-example
quadcopter climbs to a 1 m hover under rotor-thrust box bounds and
roll/pitch limits, re-solving the same QP each control step (receding
horizon) with warm starting.

Run:  python examples/quadcopter_mpc.py
"""

import jax
import jax.numpy as jnp

from srbd_nmpc_tpu.models import quadcopter
from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
from srbd_nmpc_tpu.ocpqp.settings import IpmSettings, IpmStatus


def main() -> None:
    N = 10
    qp = quadcopter.build_mpc_qp(N=N, dtype=jnp.float64)
    A, B = quadcopter.dynamics(jnp.float64)
    settings = IpmSettings(iter_max=30, mu0=1e2, tol_stat=1e-8, tol_eq=1e-8,
                           tol_ineq=1e-8, tol_comp=1e-8, warm_start=True,
                           split_step=True)
    solver = jax.jit(lambda x0, warm: ipm_solve(qp, x0, settings, warm_start=warm))

    x = jnp.zeros(12, jnp.float64)
    sol = None
    print(f"{'t':>3} {'z [m]':>8} {'u0..u3 [N] (rel hover)':>34}  iters")
    for t in range(50):
        sol, stats = solver(x, sol)
        assert int(stats.status) == int(IpmStatus.SUCCESS), stats.pretty()
        u0 = sol.u[0]
        print(f"{t:3d} {float(x[2]):8.4f} "
              f"[{float(u0[0]):7.4f} {float(u0[1]):7.4f} "
              f"{float(u0[2]):7.4f} {float(u0[3]):7.4f}]  {int(stats.iter):2d}")
        x = A @ x + B @ u0
    print(f"final height: {float(x[2]):.4f} m (target 1.0)")


if __name__ == "__main__":
    main()
