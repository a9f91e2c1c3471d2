"""Double-integrator OCP-QP demo.

Parity with the reference example
(/root/reference/hpipm-cpp/examples/example_ocp_qp.cpp): build a tiny
2-state/1-input OCP-QP, solve it, print the state/input trajectory and the
solver statistics — exercising the same public API surface (OcpQp data,
IpmSettings, IpmStatistics pretty-print).

Run:  python examples/double_integrator.py
"""

import jax.numpy as jnp

from srbd_nmpc_tpu.ocpqp.data import unconstrained_qp
from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
from srbd_nmpc_tpu.ocpqp.settings import IpmSettings, IpmStatus


def main() -> None:
    N = 20
    dt = 0.1
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.5 * dt * dt], [dt]])
    b = jnp.zeros(2)

    Q = jnp.diag(jnp.asarray([10.0, 1.0]))
    R = jnp.asarray([[0.1]])
    S = jnp.zeros((1, 2))
    q = jnp.zeros(2)
    r = jnp.zeros(1)

    tile = lambda a, n: jnp.broadcast_to(a, (n,) + a.shape)
    qp = unconstrained_qp(
        A=tile(A, N), B=tile(B, N), b=tile(b, N),
        Q=tile(Q, N + 1), S=tile(S, N), R=tile(R, N),
        q=tile(q, N + 1), r=tile(r, N),
    )

    x0 = jnp.asarray([1.0, 0.5])  # start at 1 m, 0.5 m/s; drive to origin
    sol, stats = ipm_solve(qp, x0, IpmSettings())
    assert int(stats.status) == int(IpmStatus.SUCCESS)

    print("double integrator OCP-QP, N =", N)
    print(f"{'k':>3} {'pos':>9} {'vel':>9} {'u':>9}")
    for k in range(N + 1):
        u_str = f"{float(sol.u[k, 0]):9.4f}" if k < N else "        -"
        print(f"{k:3d} {float(sol.x[k, 0]):9.4f} {float(sol.x[k, 1]):9.4f} {u_str}")
    print()
    print(stats.pretty())


if __name__ == "__main__":
    main()
