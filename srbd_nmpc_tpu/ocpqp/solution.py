"""OCP-QP solution pytree.

Parity with ``hpipm::OcpQpSolution``
(/root/reference/hpipm-cpp/include/hpipm-cpp/ocp_qp_solution.hpp:12-48):
primal trajectories, costates, and the full Riccati surface (value-function
matrix P, vector p, feedback gain K, feedforward k) — including stage 0,
which the reference has to reconstruct separately
(ocp_qp_ipm_solver.cpp:347-373) because HPIPM eliminates the initial state;
our Riccati recursion produces stage 0 directly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OcpQpSolution:
    """Stacked solution over the horizon (leading batch dims broadcast).

    Shapes: x,pi,p [N+1,nx]; u,k [N,nu]; P [N+1,nx,nx]; K [N,nu,nx].

    Sign conventions match the reference exactly: ``pi_i = P_i x_i + p_i``
    (the test oracle's ``s`` satisfies ``p = -s``,
    hpipm-cpp/test/ocp_qp_ipm_solver.cpp:87-105), and ``u_i = K_i x_i + k_i``.
    """

    x: jnp.ndarray
    u: jnp.ndarray
    pi: jnp.ndarray
    P: jnp.ndarray
    p: jnp.ndarray
    K: jnp.ndarray
    k: jnp.ndarray
