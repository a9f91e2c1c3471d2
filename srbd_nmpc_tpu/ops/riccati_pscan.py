"""Stage-parallel Riccati via `jax.lax.associative_scan`.

The classical backward Riccati recursion is sequential in the horizon
(O(N) depth). This module implements the parallel-in-time formulation of
Särkkä & García-Fernández, "Temporal Parallelization of Bayesian Smoothers"
/ "The Parallelization of Riccati Recursion" (arXiv:1809.06360, referenced
by SURVEY.md §5 as the long-horizon axis): value functions are represented
by five-tuples (A, b, C, eta, J) that compose ASSOCIATIVELY, so the whole
backward pass becomes an `associative_scan` of depth O(log N) — and, under
a mesh with a "stage" axis, XLA partitions it across chips (the
sequence-parallel analogue for this workload).

Composition rule (elements e1 before e2 in time; arXiv:1809.06360 eqs for
the LQT dual functions):

    M  = (I + C1 J2)^-1
    A3 = A2 M A1
    b3 = A2 M (b1 + C1 eta2) + b2
    C3 = A2 M C1 A2' + C2
    eta3 = A1' (I + J2 C1)^-1 (eta2 - J2 b1) + eta1
    J3 = A1' (I + J2 C1)^-1 J2 A1 + J1

Stage leaf (cost 1/2 x'Qx + q'x + 1/2 u'Ru + r'u + u'Sx, dynamics
x' = Ax + Bu + b; the S/r terms are folded by the standard pre-elimination
u -> u + R^-1(Sx + r)):

    At = A - B R^-1 S        bt = b - B R^-1 r      C = B R^-1 B'
    Jt = Q - S' R^-1 S       eta = -(q - S' R^-1 r)

Terminal leaf: (0, 0, 0, -q_N, Q_N). A reverse scan then yields
(J_k, eta_k) = (P_k, -p_k) for every k at once. Gains are recovered
stage-parallel from (P_{k+1}, p_{k+1}), and the forward rollout is a second
associative scan over affine maps.

At N=20 the sequential `lax.scan` is faster on one chip (fewer flops); this
path exists for long horizons and stage-axis sharding. Identical outputs
are tested against ops.riccati.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from srbd_nmpc_tpu.ocpqp.data import OcpQp
from srbd_nmpc_tpu.ocpqp.solution import OcpQpSolution


def _combine(e1, e2):
    """Associative composition of value-function elements (e1 earlier)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)
    # M = (I + C1 J2)^-1 ; applied from the left via linear solves
    IC = I + C1 @ J2
    M_A1 = jnp.linalg.solve(IC, A1)
    M_bCeta = jnp.linalg.solve(
        IC, (b1 + jnp.einsum("...ij,...j->...i", C1, eta2))[..., None]
    )[..., 0]
    M_C1 = jnp.linalg.solve(IC, C1)
    A3 = A2 @ M_A1
    b3 = jnp.einsum("...ij,...j->...i", A2, M_bCeta) + b2
    C3 = A2 @ M_C1 @ jnp.swapaxes(A2, -1, -2) + C2
    C3 = 0.5 * (C3 + jnp.swapaxes(C3, -1, -2))
    IJ = I + J2 @ C1
    N_eta = jnp.linalg.solve(
        IJ, (eta2 - jnp.einsum("...ij,...j->...i", J2, b1))[..., None]
    )[..., 0]
    N_J2A1 = jnp.linalg.solve(IJ, J2 @ A1)
    eta3 = jnp.einsum("...ji,...j->...i", A1, N_eta) + eta1
    J3 = jnp.swapaxes(A1, -1, -2) @ N_J2A1 + J1
    J3 = 0.5 * (J3 + jnp.swapaxes(J3, -1, -2))
    return (A3, b3, C3, eta3, J3)


def _leaf_elements(qp: OcpQp, reg: float):
    """Build per-stage elements [N+1, ...] (terminal last)."""
    nx, nu = qp.A.shape[-1], qp.B.shape[-1]
    dtype = qp.A.dtype
    Rr = qp.R + jnp.asarray(reg, dtype) * jnp.eye(nu, dtype=dtype)
    Rinv_S = jnp.linalg.solve(Rr, qp.S)                      # [N,nu,nx]
    Rinv_r = jnp.linalg.solve(Rr, qp.r[..., None])[..., 0]   # [N,nu]
    Rinv_Bt = jnp.linalg.solve(Rr, jnp.swapaxes(qp.B, -1, -2))
    At = qp.A - qp.B @ Rinv_S
    bt = qp.b - jnp.einsum("nij,nj->ni", qp.B, Rinv_r)
    C = qp.B @ Rinv_Bt
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    Jt = qp.Q[:-1] - jnp.swapaxes(qp.S, -1, -2) @ Rinv_S
    Jt = 0.5 * (Jt + jnp.swapaxes(Jt, -1, -2))
    eta = -(qp.q[:-1] - jnp.einsum("nji,nj->ni", qp.S, Rinv_r))

    zero_m = jnp.zeros((1, nx, nx), dtype)
    zero_v = jnp.zeros((1, nx), dtype)
    A_el = jnp.concatenate([At, zero_m], axis=0)
    b_el = jnp.concatenate([bt, zero_v], axis=0)
    C_el = jnp.concatenate([C, zero_m], axis=0)
    eta_el = jnp.concatenate([eta, -qp.q[-1:]], axis=0)
    J_el = jnp.concatenate([Jt, qp.Q[-1:]], axis=0)
    return (A_el, b_el, C_el, eta_el, J_el)


def lqr_backward_pscan(
    qp: OcpQp, reg: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """O(log N)-depth backward pass. Returns (P [N+1], p [N+1], K [N], k [N])
    — same contract as ops.riccati.lqr_backward."""
    elems = _leaf_elements(qp, reg)
    # reverse=True folds with the accumulator on the LATER side, i.e. the
    # operator receives (later, earlier) — flip to keep _combine's
    # (earlier, later) convention.
    suffix = lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True, axis=0
    )
    P = suffix[4]
    p = -suffix[3]

    # gains, all stages in parallel from (P', p')
    nu = qp.B.shape[-1]
    dtype = qp.A.dtype
    P_next = P[1:]
    p_next = p[1:]
    PB = P_next @ qp.B
    G = qp.R + jnp.swapaxes(qp.B, -1, -2) @ PB
    G = 0.5 * (G + jnp.swapaxes(G, -1, -2)) + jnp.asarray(reg, dtype) * jnp.eye(nu, dtype=dtype)
    H = qp.S + jnp.swapaxes(qp.B, -1, -2) @ (P_next @ qp.A)
    rhs_k = jnp.einsum("nji,nj->ni", qp.B,
                       jnp.einsum("nij,nj->ni", P_next, qp.b) + p_next) + qp.r
    L = jnp.linalg.cholesky(G)
    Kk = -jax.scipy.linalg.cho_solve(
        (L, True), jnp.concatenate([H, rhs_k[..., None]], axis=-1))
    K, k = Kk[..., :-1], Kk[..., -1]
    return P, p, K, k


def lqr_forward_pscan(
    qp: OcpQp, x0: jnp.ndarray, K: jnp.ndarray, k: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(log N)-depth closed-loop rollout: the affine recursion
    x' = (A + B K) x + (B k + b) composed by associative scan."""
    M = qp.A + qp.B @ K
    v = jnp.einsum("nij,nj->ni", qp.B, k) + qp.b

    def comp(c1, c2):
        M1, v1 = c1
        M2, v2 = c2
        return (M2 @ M1, jnp.einsum("...ij,...j->...i", M2, v1) + v2)

    Ms, vs = lax.associative_scan(comp, (M, v), axis=0)
    x_rest = jnp.einsum("nij,j->ni", Ms, x0) + vs
    x = jnp.concatenate([x0[None], x_rest], axis=0)
    u = jnp.einsum("nij,nj->ni", K, x[:-1]) + k
    return x, u


def lqr_solve_pscan(qp: OcpQp, x0: jnp.ndarray, reg: float = 0.0) -> OcpQpSolution:
    """Full stage-parallel LQR solve (same contract as ops.riccati.lqr_solve)."""
    P, p, K, k = lqr_backward_pscan(qp, reg)
    x, u = lqr_forward_pscan(qp, x0, K, k)
    pi = jnp.einsum("nij,nj->ni", P, x) + p
    return OcpQpSolution(x=x, u=u, pi=pi, P=P, p=p, K=K, k=k)
