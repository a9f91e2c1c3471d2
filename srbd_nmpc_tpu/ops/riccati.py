"""Backward-Riccati factorization + forward rollout for OCP-QPs, as `lax.scan`.

This is the TPU-native replacement for the hot kernel of the reference stack:
HPIPM's Riccati-based OCP-QP solve (`d_ocp_qp_ipm_solve`, reached via
/root/reference/hpipm-cpp/src/ocp_qp_ipm_solver.cpp:334). The recursion
implemented here is exactly the textbook one the reference validates against
in its own oracle test (hpipm-cpp/test/ocp_qp_ipm_solver.cpp:61-91), with the
sign convention ``p = -s``:

    P_N = Q_N,  p_N = q_N
    G = R + B' P' B  (+ reg I)          H = S + B' P' A
    K = -G^{-1} H                       k = -G^{-1} (B'(P' b + p') + r)
    P = Q + A' P' A + H' K              p = q + A'(p' + P' b) + H' k
    forward: u = K x + k,  x' = A x + B u + b,  pi = P x + p

Design (TPU-first):
- one `lax.scan` over the horizon per direction; `vmap` over scenario
  batches turns every small matrix op into a batched op XLA can fuse;
- Cholesky-based solves (G is SPD by construction in all call sites:
  barrier/slack-augmented R, plus ``reg``);
- everything is shape-static; no data-dependent control flow;
- optional iterative refinement (`refine > 0`) re-solves the same KKT
  system on the residuals — this is how f32 TPU solves reach the accuracy
  the f64 reference gets natively (SURVEY.md 'hard parts').

Unlike HPIPM there is no stage-0 elimination: the recursion yields K_0, P_0,
p_0 directly, which the reference must reconstruct by hand
(ocp_qp_ipm_solver.cpp:347-373).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from srbd_nmpc_tpu.ocpqp.data import OcpQp
from srbd_nmpc_tpu.ocpqp.solution import OcpQpSolution


def _chol_solve(L: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L') X = rhs with a lower Cholesky factor L."""
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def lqr_backward(
    qp: OcpQp, reg: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backward Riccati sweep. Returns (P [N+1,nx,nx], p [N+1,nx],
    K [N,nu,nx], k [N,nu])."""
    nu = qp.B.shape[-1]
    dtype = qp.A.dtype
    reg_eye = jnp.asarray(reg, dtype) * jnp.eye(nu, dtype=dtype)

    P_N = qp.Q[-1]
    p_N = qp.q[-1]

    def step(carry, stage):
        P_next, p_next = carry
        A, B, b, Q, S, R, q, r = stage
        PA = P_next @ A
        PB = P_next @ B
        Pb_p = P_next @ b + p_next
        G = R + B.T @ PB + reg_eye
        G = 0.5 * (G + G.T)
        H = S + B.T @ PA
        L = jnp.linalg.cholesky(G)
        # one triangular solve for both gain and feedforward
        rhs = jnp.concatenate([H, (B.T @ Pb_p + r)[:, None]], axis=1)
        Kk = -_chol_solve(L, rhs)
        K, k = Kk[:, :-1], Kk[:, -1]
        P = Q + A.T @ PA + H.T @ K
        P = 0.5 * (P + P.T)
        p = q + A.T @ Pb_p + H.T @ k
        return (P, p), (P, p, K, k)

    stages = (qp.A, qp.B, qp.b, qp.Q[:-1], qp.S, qp.R, qp.q[:-1], qp.r)
    (_, _), (P_rest, p_rest, K, k) = lax.scan(step, (P_N, p_N), stages, reverse=True)
    P = jnp.concatenate([P_rest, P_N[None]], axis=0)
    p = jnp.concatenate([p_rest, p_N[None]], axis=0)
    return P, p, K, k


def lqr_forward(
    qp: OcpQp, x0: jnp.ndarray, K: jnp.ndarray, k: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-loop forward rollout. Returns (x [N+1,nx], u [N,nu])."""

    def step(x, stage):
        K_i, k_i, A, B, b = stage
        u = K_i @ x + k_i
        x_next = A @ x + B @ u + b
        return x_next, (x, u)

    x_N, (x_rest, u) = lax.scan(step, x0, (K, k, qp.A, qp.B, qp.b))
    x = jnp.concatenate([x_rest, x_N[None]], axis=0)
    return x, u


def kkt_residuals(
    qp: OcpQp, x: jnp.ndarray, u: jnp.ndarray, pi: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """KKT residuals of an (unconstrained) OCP-QP solution.

    Returns (r_dyn [N,nx], r_sx [N+1,nx], r_su [N,nu]):
      r_dyn_i = A x_i + B u_i + b_i - x_{i+1}
      r_sx_i  = Q x_i + q_i + S' u_i + A' pi_{i+1} - pi_i   (i < N)
      r_sx_N  = Q_N x_N + q_N - pi_N
      r_su_i  = R u_i + r_i + S x_i + B' pi_{i+1}
    """
    Ax = jnp.einsum("nij,nj->ni", qp.A, x[:-1])
    Bu = jnp.einsum("nij,nj->ni", qp.B, u)
    r_dyn = Ax + Bu + qp.b - x[1:]

    Qx = jnp.einsum("nij,nj->ni", qp.Q, x)
    Stu = jnp.einsum("nji,nj->ni", qp.S, u)  # S' u  (S is [nu,nx])
    Atpi = jnp.einsum("nji,nj->ni", qp.A, pi[1:])
    r_sx = Qx + qp.q - pi
    r_sx = r_sx.at[:-1].add(Stu + Atpi)

    Ru = jnp.einsum("nij,nj->ni", qp.R, u)
    Sx = jnp.einsum("nij,nj->ni", qp.S, x[:-1])
    Btpi = jnp.einsum("nji,nj->ni", qp.B, pi[1:])
    r_su = Ru + qp.r + Sx + Btpi
    return r_dyn, r_sx, r_su


def lqr_solve(
    qp: OcpQp, x0: jnp.ndarray, reg: float = 0.0, refine: int = 0
) -> OcpQpSolution:
    """Solve an equality-constrained OCP-QP exactly (one factorize + solve).

    ``refine`` extra passes re-solve the identical KKT system with the
    current residuals as right-hand side and add the correction — a
    standard iterative-refinement loop that recovers ~f64-grade accuracy
    from f32 factorizations (each pass costs one more backward+forward
    scan). ``refine=0`` matches the reference single-solve semantics.
    """
    P, p, K, k = lqr_backward(qp, reg=reg)
    x, u = lqr_forward(qp, x0, K, k)
    pi = jnp.einsum("nij,nj->ni", P, x) + p

    for _ in range(refine):
        r_dyn, r_sx, r_su = kkt_residuals(qp, x, u, pi)
        qp_cor = OcpQp(
            A=qp.A, B=qp.B, b=r_dyn,
            Q=qp.Q, S=qp.S, R=qp.R, q=r_sx, r=r_su,
        )
        # error system shares the factorization structure; re-deriving
        # (P, K) in it is pure overhead but keeps the code single-path —
        # the refinement passes are off the default path.
        Pe, pe, Ke, ke = lqr_backward(qp_cor, reg=reg)
        ex, eu = lqr_forward(qp_cor, jnp.zeros_like(x0), Ke, ke)
        epi = jnp.einsum("nij,nj->ni", Pe, ex) + pe
        x = x + ex
        u = u + eu
        pi = pi + epi

    return OcpQpSolution(x=x, u=u, pi=pi, P=P, p=p, K=K, k=k)
