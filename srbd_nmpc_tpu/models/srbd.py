"""Single-rigid-body-dynamics (SRBD) model for bipedal locomotion.

TPU-native re-design of ``SRBDModel`` (/root/reference/dynamics/SRBD_model.{h,cpp}):
pure functions over a parameter pytree instead of a stateful class. Every
function is NATIVELY BATCHED over arbitrary leading axes (scenario batch,
stages, line-search candidates) — matrices are assembled by concatenation
of 3x3 blocks rather than `.at[].set` scatter, which measures ~10x faster
on TPU (scatter-assembled [M,12,12] updates defeat XLA fusion).

State  x  = [r (axis-angle, 3), l (angular momentum, 3), p (CoM pos, 3),
             v (CoM vel, 3)]                               (SRBD_model.cpp:77-80)
Input  u  = [F_right (3), tau_right (3), F_left (3), tau_left (3)]
             (SRBD_model.cpp:92-98)

Continuous dynamics (SRBD_model.cpp:75-99):
    r_dot = Jl(r)^-1 w          with w = R I^-1 R^T l,  R = expm(r)
    l_dot = tau_r + tau_l + (p_fr - p) x F_r + (p_fl - p) x F_l
    p_dot = v
    v_dot = (F_r + F_l)/m + g
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from srbd_nmpc_tpu.ops import so3

NX = 12  # state dim  (SRBD_model.cpp:21)
NU = 12  # input dim  (SRBD_model.cpp:22)
NG = 24  # constraint rows (SRBD_model.cpp:23)
GRAVITY = -9.8  # m/s^2  (SRBD_model.cpp:98)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SRBDParams:
    """Model parameters (pytree).

    ``inertia_inv`` stores the body-frame inverse inertia, exactly as the
    reference setter does (``SetInertia`` stores ``L.inverse()``,
    SRBD_model.cpp:46-49).
    """

    mass: jnp.ndarray           # []
    inertia_inv: jnp.ndarray    # [3,3]
    foot_pos: jnp.ndarray       # [2,3]  (right, left)  — ``SetFoot``
    foot_rot: jnp.ndarray       # [2,3,3]
    dt: jnp.ndarray             # []    — MPC step
    mu: jnp.ndarray             # []    friction coefficient  (default .5)
    lfx: jnp.ndarray            # []    foot half-length x    (default .05)
    lfz: jnp.ndarray            # []    yaw lever             (default .05)
    fmax: jnp.ndarray           # []    max normal force      (default 1000)
    fmin: jnp.ndarray           # []    min normal force      (default 0)

    @staticmethod
    def create(
        mass: float = 15.0,
        inertia_diag=(0.541667, 0.516667, 1.0416667),
        foot_right=(0.0, -0.1, 0.0),
        foot_left=(0.0, 0.1, 0.0),
        dt: float = 0.015,
        mu: float = 0.5,
        lfx: float = 0.05,
        lfz: float = 0.05,
        fmax: float = 1000.0,
        fmin: float = 0.0,
        dtype=jnp.float32,
    ) -> "SRBDParams":
        """Defaults follow the reference ctor (SRBD_model.cpp:5-24) and the
        benchmark setup (NMPC_solver.cpp:332-339, config/mpc_option.yaml)."""
        inertia = jnp.diag(jnp.asarray(inertia_diag, dtype))
        return SRBDParams(
            mass=jnp.asarray(mass, dtype),
            inertia_inv=jnp.linalg.inv(inertia),
            foot_pos=jnp.asarray([foot_right, foot_left], dtype),
            foot_rot=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (2, 3, 3)),
            dt=jnp.asarray(dt, dtype),
            mu=jnp.asarray(mu, dtype),
            lfx=jnp.asarray(lfx, dtype),
            lfz=jnp.asarray(lfz, dtype),
            fmax=jnp.asarray(fmax, dtype),
            fmin=jnp.asarray(fmin, dtype),
        )


def _mv(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 matrix @ 3-vector on trailing axes."""
    return jnp.einsum("...ij,...j->...i", M, v)


def continuous_dynamics(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """dx/dt = f(x, u); batched over leading axes.
    Ref: GetContinuousDynamic value path (SRBD_model.cpp:87-99)."""
    r, l, p, v = x[..., 0:3], x[..., 3:6], x[..., 6:9], x[..., 9:12]
    R = so3.expm(r)
    RIRt = R @ params.inertia_inv @ jnp.swapaxes(R, -1, -2)
    w = _mv(RIRt, l)
    r_dot = _mv(so3.jl_inv(r), w)
    l_dot = (u[..., 3:6] + u[..., 9:12]
             + jnp.cross(params.foot_pos[0] - p, u[..., 0:3])
             + jnp.cross(params.foot_pos[1] - p, u[..., 6:9]))
    p_dot = v
    g = jnp.zeros(3, x.dtype).at[2].set(jnp.asarray(GRAVITY, x.dtype))
    v_dot = (u[..., 0:3] + u[..., 6:9]) / params.mass + g
    return jnp.concatenate([r_dot, l_dot, p_dot, v_dot], axis=-1)


def continuous_jacobians(
    params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form (J_fx, J_fu) of the continuous dynamics, batched.

    Ref: GetContinuousDynamic jacobian path (SRBD_model.cpp:105-140).
    Assembled with a 4x4 grid of 3x3 block concatenations (fusion-friendly
    on TPU; bit-identical to the scatter version).
    """
    dtype = x.dtype
    r, l, p = x[..., 0:3], x[..., 3:6], x[..., 6:9]
    R = so3.expm(r)
    RIRt = R @ params.inertia_inv @ jnp.swapaxes(R, -1, -2)
    w = _mv(RIRt, l)
    Jlt = so3.jl_inv(r)
    Jl = so3.jl(r)
    # djlt_w[..., :, a] = (d jl_inv / d r_a) @ w   (SRBD_model.cpp:105-113)
    djlt_w = jnp.einsum("...aij,...j->...ia", so3.djl_inv(r), w)

    D1 = djlt_w + Jlt @ (RIRt @ so3.skew(l) - so3.skew(w)) @ Jl
    D2 = Jlt @ RIRt
    SF = so3.skew(u[..., 0:3] + u[..., 6:9])
    Z = jnp.zeros_like(D1)
    I = jnp.broadcast_to(jnp.eye(3, dtype=dtype), D1.shape)

    def row(*blocks):
        return jnp.concatenate(blocks, axis=-1)

    J_fx = jnp.concatenate(
        [row(D1, D2, Z, Z), row(Z, Z, SF, Z), row(Z, Z, Z, I), row(Z, Z, Z, Z)],
        axis=-2,
    )

    Sr = so3.skew(params.foot_pos[0] - p)
    Sl = so3.skew(params.foot_pos[1] - p)
    Im = I / params.mass
    J_fu = jnp.concatenate(
        [row(Z, Z, Z, Z), row(Sr, I, Sl, I), row(Z, Z, Z, Z), row(Im, Z, Im, Z)],
        axis=-2,
    )
    return J_fx, J_fu


def rk4_step(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Classical RK4 integration of the SRBD ODE over ``params.dt``, batched.

    Ref: the k1..k4 staging in GetShootingDynamic (SRBD_model.cpp:174-179).
    """
    dt = params.dt
    k1 = continuous_dynamics(params, x, u)
    k2 = continuous_dynamics(params, x + 0.5 * dt * k1, u)
    k3 = continuous_dynamics(params, x + 0.5 * dt * k2, u)
    k4 = continuous_dynamics(params, x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def shooting_defect(
    params: SRBDParams, x: jnp.ndarray, x_next: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """Multiple-shooting defect ``f = x_next - RK4(x, u)``, batched.

    Ref: SRBD_model.cpp:189-197. The orientation rows use plain subtraction
    (not ``logm(Rk Rg^T)``) exactly as the reference does (:194) — valid for
    the small per-step rotation increments of a dt=15 ms horizon.
    """
    return x_next - rk4_step(params, x, u)


def linearize_shooting(
    params: SRBDParams,
    x: jnp.ndarray,
    x_next: jnp.ndarray,
    u: jnp.ndarray,
    sensitivity: str = "euler",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Linearized shooting: returns (A, B, b, f) with ``b = -f``; batched.

    ``sensitivity='euler'`` reproduces the reference exactly: the state is
    integrated with RK4 but the sensitivities are first-order,
    ``A = I + dt J_fx(x,u)``, ``B = dt J_fu(x,u)`` (SRBD_model.cpp:180-181 —
    the full RK4 chain is computed there but discarded).
    ``sensitivity='exact'`` differentiates the RK4 map with ``jacfwd`` — the
    idiomatic JAX improvement (SURVEY.md quirk list): better SQP
    contraction per iteration at higher per-iteration cost.
    """
    f = shooting_defect(params, x, x_next, u)
    if sensitivity == "euler":
        J_fx, J_fu = continuous_jacobians(params, x, u)
        A = jnp.eye(NX, dtype=x.dtype) + params.dt * J_fx
        B = params.dt * J_fu
    elif sensitivity == "exact":
        step = lambda xx, uu: rk4_step(params, xx, uu)
        jac = jax.jacfwd(step, argnums=(0, 1))
        for _ in range(x.ndim - 1):
            jac = jax.vmap(jac)
        A, B = jac(x, u)
    else:
        raise ValueError(f"unknown sensitivity mode: {sensitivity!r}")
    return A, B, -f, f


def constraint_matrix(params: SRBDParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Friction-cone / torque constraint rows: feasible iff ``Ac @ u + bc >= 0``.

    Ref: GetConstrain (SRBD_model.cpp:237-260). Per leg (12 rows over that
    leg's [F; tau] block): friction pyramid |Fx|,|Fy| <= mu Fz; normal force
    fmin <= Fz <= fmax; ZMP |Ry.tau| <= Lfx Rz.F; yaw |Rz.tau| <= Lfz Rz.F;
    roll torque Rx.tau == 0 (pair of opposing rows).
    ``Ac`` is constant given the params — built once per solve, broadcast
    over stages and batch.
    """
    dtype = params.foot_rot.dtype
    mu, lfx, lfz = params.mu, params.lfx, params.lfz
    z3 = jnp.zeros(3, dtype)

    def leg_rows(R):
        rx, ry, rz = R[:, 0], R[:, 1], R[:, 2]
        e = jnp.eye(3, dtype=dtype)
        rows_F = jnp.stack([
            -e[0] + mu * e[2],
            -e[1] + mu * e[2],
            e[0] + mu * e[2],
            e[1] + mu * e[2],
            -e[2],
            e[2],
            lfx * rz,
            lfx * rz,
            lfz * rz,
            lfz * rz,
            z3,
            z3,
        ])
        rows_tau = jnp.stack([
            z3, z3, z3, z3, z3, z3,
            -ry, ry, -rz, rz, -rx, rx,
        ])
        return jnp.concatenate([rows_F, rows_tau], axis=1)  # [12, 6]

    blocks = jax.vmap(leg_rows)(params.foot_rot)  # [2, 12, 6]
    Ac = jnp.zeros((NG, NU), dtype)
    Ac = Ac.at[0:12, 0:6].set(blocks[0])
    Ac = Ac.at[12:24, 6:12].set(blocks[1])
    bc = jnp.zeros(NG, dtype)
    bc = bc.at[4].set(params.fmax).at[5].set(-params.fmin)
    bc = bc.at[16].set(params.fmax).at[17].set(-params.fmin)
    return Ac, bc


def constraint_values(params: SRBDParams, u: jnp.ndarray) -> jnp.ndarray:
    """``f = Ac @ u + bc`` (>= 0 when feasible), batched.
    Ref: SRBD_model.cpp:259."""
    Ac, bc = constraint_matrix(params)
    return _mv(Ac, u) + bc
