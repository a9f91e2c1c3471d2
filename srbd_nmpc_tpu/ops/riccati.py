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

import dataclasses
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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RiccatiFactors:
    """Matrix part of the Riccati recursion, reusable across right-hand
    sides (predictor/corrector steps of the IPM share one factorization,
    as HPIPM does; iterative refinement reuses it too).

    P [N+1,nx,nx] value Hessians; K [N,nu,nx] gains; L [N,nu,nu] lower
    Cholesky factors of G = R + B'P'B (+reg); H [N,nu,nx] = S + B'P'A.
    """

    P: jnp.ndarray
    K: jnp.ndarray
    L: jnp.ndarray
    H: jnp.ndarray


def riccati_factorize(
    A: jnp.ndarray, B: jnp.ndarray, Q: jnp.ndarray, S: jnp.ndarray,
    R: jnp.ndarray, reg: float = 0.0,
) -> RiccatiFactors:
    """Backward matrix recursion (cost-to-go Hessians + gains)."""
    nu = B.shape[-1]
    dtype = A.dtype
    reg_eye = jnp.asarray(reg, dtype) * jnp.eye(nu, dtype=dtype)

    def step(P_next, stage):
        A_i, B_i, Q_i, S_i, R_i = stage
        PA = P_next @ A_i
        G = R_i + B_i.T @ (P_next @ B_i) + reg_eye
        G = 0.5 * (G + G.T)
        H = S_i + B_i.T @ PA
        L = jnp.linalg.cholesky(G)
        K = -_chol_solve(L, H)
        P = Q_i + A_i.T @ PA + H.T @ K
        P = 0.5 * (P + P.T)
        return P, (P, K, L, H)

    _, (P_rest, K, L, H) = lax.scan(
        step, Q[-1], (A, B, Q[:-1], S, R), reverse=True
    )
    P = jnp.concatenate([P_rest, Q[-1][None]], axis=0)
    return RiccatiFactors(P=P, K=K, L=L, H=H)


def riccati_solve_vectors(
    fac: RiccatiFactors,
    A: jnp.ndarray, B: jnp.ndarray, b: jnp.ndarray,
    q: jnp.ndarray, r: jnp.ndarray, x0: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backward vector recursion + forward rollout for one rhs.

    Returns (x [N+1,nx], u [N,nu], pi [N+1,nx], p [N+1,nx], k [N,nu]).
    """

    def back(p_next, stage):
        A_i, B_i, b_i, q_i, r_i, P_next, L_i, H_i = stage
        Pb_p = P_next @ b_i + p_next
        k = -_chol_solve(L_i, B_i.T @ Pb_p + r_i)
        p = q_i + A_i.T @ Pb_p + H_i.T @ k
        return p, (p, k)

    _, (p_rest, k) = lax.scan(
        back, q[-1], (A, B, b, q[:-1], r, fac.P[1:], fac.L, fac.H), reverse=True
    )
    p = jnp.concatenate([p_rest, q[-1][None]], axis=0)

    def fwd(x, stage):
        K_i, k_i, A_i, B_i, b_i = stage
        u = K_i @ x + k_i
        x_next = A_i @ x + B_i @ u + b_i
        return x_next, (x, u)

    x_N, (x_rest, u) = lax.scan(fwd, x0, (fac.K, k, A, B, b))
    x = jnp.concatenate([x_rest, x_N[None]], axis=0)
    pi = jnp.einsum("nij,nj->ni", fac.P, x) + p
    return x, u, pi, p, k


def riccati_factorize_sqrt(
    A: jnp.ndarray, B: jnp.ndarray, Q: jnp.ndarray, S: jnp.ndarray,
    R: jnp.ndarray, reg: float = 0.0,
) -> RiccatiFactors:
    """Square-root (array) Riccati factorization — HPIPM's ``ric_alg=1``
    (ocp_qp_ipm_solver_settings.hpp:79-81).

    Instead of forming P = F - H'G^-1 H (which can lose positive
    definiteness to cancellation in low precision), propagate a Cholesky
    factor of P through one QR triangularization per stage:

        pre-array M = [ Lr'        Lr^-1 S ]      R = Lr Lr'
                      [ Lp' B      Lp' A   ]      P_next = Lp Lp'
                      [ 0          Lq'     ]      Q - S'R^-1 S = Lq Lq'

        M = Z T (QR)  =>  T'T = [[G, H], [H', F]],  and
        T11 = chol(G)', K = -T11^-1 T12, P = T22' T22 exactly.

    Returns the same ``RiccatiFactors`` surface as the classical
    ``riccati_factorize`` (identical downstream vector recursion). Uses
    XLA's batched QR — preferred for f64/CPU accuracy studies; the TPU SoA
    fast path keeps the classical recursion + iterative refinement.
    """
    nx, nu = A.shape[-1], B.shape[-1]
    dtype = A.dtype
    reg_eye_u = jnp.asarray(reg, dtype) * jnp.eye(nu, dtype=dtype)
    reg_eye_x = jnp.asarray(reg, dtype) * jnp.eye(nx, dtype=dtype)

    eps = jnp.finfo(dtype).eps

    def step(Lp_next, stage):
        A_i, B_i, Q_i, S_i, R_i = stage
        Lr = jnp.linalg.cholesky(R_i + reg_eye_u)
        Sw = jax.scipy.linalg.solve_triangular(Lr, S_i, lower=True)
        Qbar = Q_i - Sw.T @ Sw
        Qbar = 0.5 * (Qbar + Qbar.T) + reg_eye_x
        # The Schur complement is PSD in exact arithmetic but can go
        # (slightly) indefinite to cancellation when S couples huge
        # IPM-augmentation weights (w ~ lam/s -> 1e12 near convergence),
        # which NaNs the Cholesky. Keep the exact factor when it is
        # finite; otherwise retry once with a relative-scale jitter —
        # the accuracy loss (~eps * ||S'R^-1 S||) is already intrinsic
        # to the Schur form at that conditioning.
        Lq0 = jnp.linalg.cholesky(Qbar)
        scale = jnp.maximum(jnp.max(jnp.abs(Qbar)), 1.0)
        Lq1 = jnp.linalg.cholesky(
            Qbar + (1024.0 * eps * scale) * jnp.eye(nx, dtype=dtype))
        Lq = jnp.where(jnp.all(jnp.isfinite(Lq0)), Lq0, Lq1)
        LptB = Lp_next.T @ B_i
        LptA = Lp_next.T @ A_i
        M = jnp.block([
            [Lr.T, Sw],
            [LptB, LptA],
            [jnp.zeros((nx, nu), dtype), Lq.T],
        ])
        T = jnp.linalg.qr(M, mode="r")
        T11 = T[:nu, :nu]
        T12 = T[:nu, nu:]
        T22 = T[nu:, nu:]
        # orient signs so diag(T11) > 0 -> T11' is a valid lower Cholesky
        sgn = jnp.sign(jnp.diagonal(T11))
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        T11 = sgn[:, None] * T11
        T12 = sgn[:, None] * T12
        K = -jax.scipy.linalg.solve_triangular(T11, T12, lower=False)
        P = T22.T @ T22
        P = 0.5 * (P + P.T)
        L_G = T11.T
        H = T11.T @ T12
        Lp = jnp.linalg.cholesky(P + reg_eye_x)
        return Lp, (P, K, L_G, H)

    Q_N = 0.5 * (Q[-1] + Q[-1].T)
    Lp_N = jnp.linalg.cholesky(Q_N + reg_eye_x)
    _, (P_rest, K, L, H) = lax.scan(
        step, Lp_N, (A, B, Q[:-1], S, R), reverse=True
    )
    P = jnp.concatenate([P_rest, Q_N[None]], axis=0)
    return RiccatiFactors(P=P, K=K, L=L, H=H)


def riccati_factorize_sqrt_con(
    A: jnp.ndarray, B: jnp.ndarray, Q: jnp.ndarray, S: jnp.ndarray,
    R: jnp.ndarray, Gx: jnp.ndarray, Gu: jnp.ndarray, W: jnp.ndarray,
    reg: float = 0.0,
) -> RiccatiFactors:
    """Structured square-root Riccati for IPM-augmented Hessians.

    The IPM stage Hessian is the base cost plus a slack-elimination term:
    ``[[R,S],[S',Q]] + [Gu Gx]' diag(W) [Gu Gx]`` with W = lam/s growing
    like 1/mu near convergence (1e12+). Factorizing the *formed* augmented
    Hessian with the generic ``riccati_factorize_sqrt`` requires the Schur
    complement Q_aug - S_aug' R_aug^-1 S_aug, which catastrophically
    cancels at that conditioning (observed NaN at the converged iterate).
    This variant never forms the augmentation: the QR pre-array stacks

        [ Lj'            ]   Lj = chol of the base [[R,S],[S',Q]] (+reg)
        [ sqrt(W)[Gu Gx] ]   constraint rows, one per inequality
        [ Lp'[B  A]      ]   cost-to-go rows

    — every row block contributes a PSD term, so T'T = [[G,H],[H',F]]
    holds without any subtraction, and P propagates as its triangular
    factor T22. This is the numerically robust backbone of IpmMode.ROBUST
    (HPIPM's ric_alg=1 square-root recursion, ocp_qp_ipm_solver_settings
    .hpp:79-81, built for the slack-augmented KKT systems it actually
    factorizes).

    Shapes: Gx [N+1,m,nx], Gu [N+1,m,nu] (terminal u rows must be zero),
    W [N+1,m] >= 0. Returns the standard ``RiccatiFactors``.
    """
    nx, nu = A.shape[-1], B.shape[-1]
    dtype = A.dtype
    reg_eye_j = jnp.asarray(reg, dtype) * jnp.eye(nu + nx, dtype=dtype)
    reg_eye_x = jnp.asarray(reg, dtype) * jnp.eye(nx, dtype=dtype)
    m = Gx.shape[-2]

    def step(Lp_next, stage):
        A_i, B_i, Q_i, S_i, R_i, Gx_i, Gu_i, W_i = stage
        J = jnp.block([[R_i, S_i], [S_i.T, Q_i]])
        J = 0.5 * (J + J.T) + reg_eye_j
        Lj = jnp.linalg.cholesky(J)
        sqw = jnp.sqrt(jnp.maximum(W_i, 0.0))[:, None]
        M = jnp.concatenate([
            Lj.T,
            jnp.concatenate([sqw * Gu_i, sqw * Gx_i], axis=1),
            jnp.concatenate([Lp_next.T @ B_i, Lp_next.T @ A_i], axis=1),
        ], axis=0)
        T = jnp.linalg.qr(M, mode="r")
        T11 = T[:nu, :nu]
        T12 = T[:nu, nu:]
        T22 = T[nu:, nu:]
        # row signs from QR are arbitrary but cancel in every derived
        # quantity: K = -T11^-1 T12, G = T11'T11, H = T11'T12, P = T22'T22
        K = -jax.scipy.linalg.solve_triangular(T11, T12, lower=False)
        P = T22.T @ T22
        return T22.T, (P, K, T11.T, T11.T @ T12)

    # terminal: P_N = Q_N + Gx_N' W_N Gx_N — a sum of PSD terms
    sqwN = jnp.sqrt(jnp.maximum(W[-1], 0.0))[:, None]
    GN = sqwN * Gx[-1]
    P_N = 0.5 * (Q[-1] + Q[-1].T) + GN.T @ GN
    Lp_N = jnp.linalg.cholesky(P_N + reg_eye_x)
    _, (P_rest, K, L, H) = lax.scan(
        step, Lp_N, (A, B, Q[:-1], S, R, Gx[:-1], Gu[:-1], W[:-1]),
        reverse=True,
    )
    P = jnp.concatenate([P_rest, P_N[None]], axis=0)
    return RiccatiFactors(P=P, K=K, L=L, H=H)


def lqr_backward(
    qp: OcpQp, reg: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backward Riccati sweep. Returns (P [N+1,nx,nx], p [N+1,nx],
    K [N,nu,nx], k [N,nu])."""
    fac = riccati_factorize(qp.A, qp.B, qp.Q, qp.S, qp.R, reg)

    def back(p_next, stage):
        A_i, B_i, b_i, q_i, r_i, P_next, L_i, H_i = stage
        Pb_p = P_next @ b_i + p_next
        k = -_chol_solve(L_i, B_i.T @ Pb_p + r_i)
        p = q_i + A_i.T @ Pb_p + H_i.T @ k
        return p, (p, k)

    _, (p_rest, k) = lax.scan(
        back, qp.q[-1],
        (qp.A, qp.B, qp.b, qp.q[:-1], qp.r, fac.P[1:], fac.L, fac.H),
        reverse=True,
    )
    p = jnp.concatenate([p_rest, qp.q[-1][None]], axis=0)
    return fac.P, p, fac.K, k


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
    qp: OcpQp, x0: jnp.ndarray, reg: float = 0.0, refine: int = 0,
    sqrt: bool = False,
) -> OcpQpSolution:
    """Solve an equality-constrained OCP-QP exactly (one factorize + solve).

    ``refine`` extra passes re-solve the identical KKT system with the
    current residuals as right-hand side (reusing the factorization) and
    add the correction — standard iterative refinement that recovers
    ~f64-grade accuracy from f32 factorizations. ``refine=0`` matches the
    reference single-solve semantics. ``sqrt`` selects the square-root
    (array) factorization — HPIPM's ``ric_alg``.
    """
    factorize = riccati_factorize_sqrt if sqrt else riccati_factorize
    fac = factorize(qp.A, qp.B, qp.Q, qp.S, qp.R, reg)
    x, u, pi, p, k = riccati_solve_vectors(fac, qp.A, qp.B, qp.b, qp.q, qp.r, x0)

    for _ in range(refine):
        r_dyn, r_sx, r_su = kkt_residuals(qp, x, u, pi)
        ex, eu, epi, _, _ = riccati_solve_vectors(
            fac, qp.A, qp.B, r_dyn, r_sx, r_su, jnp.zeros_like(x0)
        )
        x = x + ex
        u = u + eu
        pi = pi + epi

    return OcpQpSolution(x=x, u=u, pi=pi, P=fac.P, p=p, K=fac.K, k=k)
