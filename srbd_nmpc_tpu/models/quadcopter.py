"""Quadcopter linear-MPC benchmark problem (box constraints + masks).

The 12-state / 4-rotor discretized quadcopter from the public OSQP MPC
example, which the reference uses for its closed-loop example and golden
cross-solver test (/root/reference/hpipm-cpp/examples/example_mpc.cpp:14-96
and hpipm-cpp/test/ocp_qp_ipm_solver.cpp:170-314). Problem DATA only —
the solver path here is this package's own IPM.

State: [roll, pitch, yaw(?), x, y, z, angular rates, velocities] per the
OSQP example's discretization (dt = 0.1 s); input: 4 rotor thrusts around
hover u0 = 10.5916.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.ocpqp.data import OcpQp

NX = 12
NU = 4
HOVER_THRUST = 10.5916


def dynamics(dtype=jnp.float64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(A [12,12], B [12,4]) — OSQP example discretization."""
    A = np.array([
        [1., 0., 0., 0., 0., 0., 0.1, 0., 0., 0., 0., 0.],
        [0., 1., 0., 0., 0., 0., 0., 0.1, 0., 0., 0., 0.],
        [0., 0., 1., 0., 0., 0., 0., 0., 0.1, 0., 0., 0.],
        [0.0488, 0., 0., 1., 0., 0., 0.0016, 0., 0., 0.0992, 0., 0.],
        [0., -0.0488, 0., 0., 1., 0., 0., -0.0016, 0., 0., 0.0992, 0.],
        [0., 0., 0., 0., 0., 1., 0., 0., 0., 0., 0., 0.0992],
        [0., 0., 0., 0., 0., 0., 1., 0., 0., 0., 0., 0.],
        [0., 0., 0., 0., 0., 0., 0., 1., 0., 0., 0., 0.],
        [0., 0., 0., 0., 0., 0., 0., 0., 1., 0., 0., 0.],
        [0.9734, 0., 0., 0., 0., 0., 0.0488, 0., 0., 0.9846, 0., 0.],
        [0., -0.9734, 0., 0., 0., 0., 0., -0.0488, 0., 0., 0.9846, 0.],
        [0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.9846],
    ])
    B = np.array([
        [0., -0.0726, 0., 0.0726],
        [-0.0726, 0., 0.0726, 0.],
        [-0.0152, 0.0152, -0.0152, 0.0152],
        [-0., -0.0006, -0., 0.0006],
        [0.0006, 0., -0.0006, 0.0000],
        [0.0106, 0.0106, 0.0106, 0.0106],
        [0, -1.4512, 0., 1.4512],
        [-1.4512, 0., 1.4512, 0.],
        [-0.3049, 0.3049, -0.3049, 0.3049],
        [-0., -0.0236, 0., 0.0236],
        [0.0236, 0., -0.0236, 0.],
        [0.2107, 0.2107, 0.2107, 0.2107],
    ])
    return jnp.asarray(A, dtype), jnp.asarray(B, dtype)


def build_mpc_qp(N: int = 10, dtype=jnp.float64,
                 use_mask_for_one_sided: bool = True) -> OcpQp:
    """The closed-loop MPC QP of the reference golden test
    (ocp_qp_ipm_solver.cpp:200-240): tracking cost to a 1 m hover, thrust
    box bounds, roll/pitch/z box bounds with the z upper bound DISABLED
    via a mask (the one-sided-constraint mask pattern)."""
    A, B = dynamics(dtype)
    b = jnp.zeros((N, NX), dtype)

    Q = jnp.diag(jnp.asarray(
        [0, 0, 10., 10., 10., 10., 0, 0, 0, 5., 5., 5.], dtype))
    R = jnp.diag(jnp.asarray([0.1] * 4, dtype))
    x_ref = jnp.asarray([0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype)
    q = -Q @ x_ref

    soft_inf = 1.0e10
    idxbx = (0, 1, 5)
    lbx = jnp.broadcast_to(
        jnp.asarray([-np.pi / 6, -np.pi / 6, -1.0], dtype), (N + 1, 3))
    ubx = jnp.broadcast_to(
        jnp.asarray([np.pi / 6, np.pi / 6, soft_inf], dtype), (N + 1, 3))
    ubx_mask = jnp.broadcast_to(
        jnp.asarray([1.0, 1.0, 0.0 if use_mask_for_one_sided else 1.0], dtype),
        (N + 1, 3))

    idxbu = (0, 1, 2, 3)
    lbu = jnp.full((N, 4), 9.6 - HOVER_THRUST, dtype)
    ubu = jnp.full((N, 4), 13.0 - HOVER_THRUST, dtype)

    qp = OcpQp(
        A=jnp.broadcast_to(A, (N, NX, NX)),
        B=jnp.broadcast_to(B, (N, NX, NU)),
        b=b,
        Q=jnp.broadcast_to(Q, (N + 1, NX, NX)),
        S=jnp.zeros((N, NU, NX), dtype),
        R=jnp.broadcast_to(R, (N, NU, NU)),
        q=jnp.broadcast_to(q, (N + 1, NX)),
        r=jnp.zeros((N, NU), dtype),
        idxbx=idxbx, lbx=lbx, ubx=ubx,
        lbx_mask=jnp.ones((N + 1, 3), dtype), ubx_mask=ubx_mask,
        idxbu=idxbu, lbu=lbu, ubu=ubu,
        lbu_mask=jnp.ones((N, 4), dtype), ubu_mask=jnp.ones((N, 4), dtype),
    )
    qp.check()
    return qp
