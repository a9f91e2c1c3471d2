"""Batched Riccati recursion in SoA ("batch-in-lanes") layout.

Performance-critical twin of ``ops.riccati``: mathematically identical
recursion (validated against it bit-for-bit-ish in tests), but all stage
matrices are stored ``[N, n, m, B]`` with the scenario batch in the
trailing lane dimension and every product expanded through
``ops.smallmat``. This is the TPU answer to BLASFEO's panel-major layout
(SURVEY.md 'hard parts': 12x12 ops map terribly onto 128x128 MXU tiles;
batch-blocking scenarios into the lane dimension is the fix) — measured
~50x faster per matmul than the vmapped AoS path at B=4096.

API mirrors ops.riccati: factorize (matrix recursion) / solve_vectors
(vector recursion + rollout) / lqr_solve with iterative refinement.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from srbd_nmpc_tpu.ops import smallmat as sm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RiccatiFactorsSoA:
    """P [N+1,nx,nx,B]; K [N,nu,nx,B]; L (chol of G) [N,nu,nu,B];
    dinv [N,nu,B]; H [N,nu,nx,B]."""

    P: jnp.ndarray
    K: jnp.ndarray
    L: jnp.ndarray
    dinv: jnp.ndarray
    H: jnp.ndarray


def factorize(A, B, Q, S, R, reg: float = 0.0) -> RiccatiFactorsSoA:
    """Backward matrix recursion. Inputs SoA: A [N,nx,nx,B], Q [N+1,nx,nx,B],
    S [N,nu,nx,B], R [N,nu,nu,B]."""

    def step(P_next, stage):
        A_i, B_i, Q_i, S_i, R_i = stage
        PA = sm.mm(P_next, A_i)
        PB = sm.mm(P_next, B_i)
        G = sm.add_diag(sm.sym(R_i + sm.mtm(B_i, PB)), reg)
        H = S_i + sm.mtm(B_i, PA)
        L, dinv = sm.cholesky(G)
        K = -sm.chol_solve(L, dinv, H)
        P = sm.sym(Q_i + sm.mtm(A_i, PA) + sm.mtm(H, K))
        return P, (P, K, L, dinv, H)

    _, (P_rest, K, L, dinv, H) = lax.scan(
        step, Q[-1], (A, B, Q[:-1], S, R), reverse=True
    )
    P = jnp.concatenate([P_rest, Q[-1][None]], axis=0)
    return RiccatiFactorsSoA(P=P, K=K, L=L, dinv=dinv, H=H)


def solve_vectors(fac: RiccatiFactorsSoA, A, B, b, q, r, x0):
    """Backward vector recursion + forward rollout for one rhs.

    SoA shapes: b [N,nx,B], q [N+1,nx,B], r [N,nu,B], x0 [nx,B].
    Returns (x [N+1,nx,B], u [N,nu,B], pi [N+1,nx,B], p, k).
    """

    def back(p_next, stage):
        A_i, B_i, b_i, q_i, r_i, P_next, L_i, dinv_i, H_i = stage
        Pb_p = sm.mv(P_next, b_i) + p_next
        k = -sm.chol_solve_vec(L_i, dinv_i, sm.mtv(B_i, Pb_p) + r_i)
        p = q_i + sm.mtv(A_i, Pb_p) + sm.mtv(H_i, k)
        return p, (p, k)

    _, (p_rest, k) = lax.scan(
        back, q[-1], (A, B, b, q[:-1], r, fac.P[1:], fac.L, fac.dinv, fac.H),
        reverse=True,
    )
    p = jnp.concatenate([p_rest, q[-1][None]], axis=0)

    def fwd(x, stage):
        K_i, k_i, A_i, B_i, b_i = stage
        u = sm.mv(K_i, x) + k_i
        x_next = sm.mv(A_i, x) + sm.mv(B_i, u) + b_i
        return x_next, (x, u)

    x_N, (x_rest, u) = lax.scan(fwd, x0, (fac.K, k, A, B, b))
    x = jnp.concatenate([x_rest, x_N[None]], axis=0)
    # pi[t] = P[t] x[t] + p[t] over all stages at once
    pi = jax.vmap(sm.mv)(fac.P, x) + p
    return x, u, pi, p, k


def kkt_residuals_soa(A, B, b, Q, S, R, q, r, x, u, pi):
    """SoA version of ops.riccati.kkt_residuals (same conventions)."""
    vmv = jax.vmap(sm.mv)
    vmtv = jax.vmap(sm.mtv)
    r_dyn = vmv(A, x[:-1]) + vmv(B, u) + b - x[1:]
    r_sx = vmv(Q, x) + q - pi
    r_sx = r_sx.at[:-1].add(vmtv(S, u) + vmtv(A, pi[1:]))
    r_su = vmv(R, u) + r + vmv(S, x[:-1]) + vmtv(B, pi[1:])
    return r_dyn, r_sx, r_su


def lqr_solve(A, B, b, Q, S, R, q, r, x0, reg: float = 0.0, refine: int = 0
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve the equality-constrained OCP-QP in SoA layout.

    Returns (x, u, pi) in SoA. See ops.riccati.lqr_solve for semantics;
    refinement reuses the factorization.
    """
    fac = factorize(A, B, Q, S, R, reg)
    x, u, pi, _, _ = solve_vectors(fac, A, B, b, q, r, x0)
    for _ in range(refine):
        rd, rx, ru = kkt_residuals_soa(A, B, b, Q, S, R, q, r, x, u, pi)
        ex, eu, epi, _, _ = solve_vectors(fac, A, B, rd, rx, ru, jnp.zeros_like(x0))
        x, u, pi = x + ex, u + eu, pi + epi
    return x, u, pi
