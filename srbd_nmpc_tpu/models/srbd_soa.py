"""SRBD dynamics in SoA ("batch-in-lanes") layout.

Performance twin of ``models.srbd`` for the batched NMPC hot path: all
vectors are ``[d, ...]`` and matrices ``[d, e, ...]`` with the flattened
scenario*stage batch in TRAILING axes, so every 3x3/12x12 product is a
handful of wide VPU ops instead of lane-starved [B,N,3,3] tensors (3 of
128 lanes used). Mathematically identical to models.srbd (tested).

The reference formulas are the same as models.srbd cites
(/root/reference/dynamics/SRBD_model.cpp:75-181, orientation_tool.h).
One extra trick: products with constant basis skews E_a (in the djl
closed form, orientation_tool.h:192-198) are expanded into row/column
shuffles with sign flips — zero multiplies.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from srbd_nmpc_tpu.models.srbd import GRAVITY, NX, SRBDParams
from srbd_nmpc_tpu.ops import smallmat as sm
from srbd_nmpc_tpu.ops.so3 import _theta_min


def _safe_theta(r: jnp.ndarray) -> jnp.ndarray:
    h = _theta_min(r.dtype)
    sq = jnp.sum(r * r, axis=0)
    return jnp.sqrt(jnp.maximum(sq, jnp.asarray(h * h, sq.dtype)))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[3, ...] -> [3, 3, ...]. (Slice-based indexing: Mosaic-safe.)"""
    v0, v1, v2 = sm.row(v, 0), sm.row(v, 1), sm.row(v, 2)
    z = jnp.zeros_like(v0)
    return jnp.stack([
        jnp.stack([z, -v2, v1]),
        jnp.stack([v2, z, -v0]),
        jnp.stack([-v1, v0, z]),
    ])


def _g_vec(nb, dtype):
    """Gravity vector [3, *nb] without scatter ops (Mosaic-safe)."""
    return jnp.concatenate([
        jnp.zeros((2,) + nb, dtype),
        jnp.full((1,) + nb, GRAVITY, dtype),
    ])


def _eye3(batch_like: jnp.ndarray) -> jnp.ndarray:
    """3x3 identity broadcastable against [3, 3, *batch_like.shape]."""
    shape = (3, 3) + (1,) * batch_like.ndim
    return jnp.eye(3, dtype=batch_like.dtype).reshape(shape)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a0, a1, a2 = sm.row(a, 0), sm.row(a, 1), sm.row(a, 2)
    b0, b1, b2 = sm.row(b, 0), sm.row(b, 1), sm.row(b, 2)
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0])


def so3_chain(r: jnp.ndarray):
    """All SO(3) quantities the dynamics needs, sharing subexpressions.

    Returns dict with R (expm), Jl, Jlt (inverse left Jacobian), and
    djlt stacked [3,3,3,...] (axis 0 = d/dr_a). Formulas:
    orientation_tool.h:76-227.
    """
    t = _safe_theta(r)
    st, ct = jnp.sin(t), jnp.cos(t)
    t2 = t * t
    t3 = t2 * t
    inv_t = 1.0 / t
    W = skew(r)                      # un-normalized
    WW = sm.mm(W, W)
    I = _eye3(sm.row(r, 0))

    sinc = st * inv_t
    R = I + sinc * W + ((1.0 - ct) / t2) * WW

    V = W * inv_t
    VV = WW * (inv_t * inv_t)
    Jl = sinc * I + (1.0 - sinc) * (VV + I) + ((1.0 - ct) * inv_t) * V
    half_t = 0.5 * t
    hc = half_t * (jnp.cos(half_t) / jnp.sin(half_t))
    Jlt = hc * I + (1.0 - hc) * (VV + I) - half_t * V

    # djl per axis (orientation_tool.h:190-202)
    base = ((t * st + 2.0 * (ct - 1.0)) / t3) * V + (
        -(2.0 * t - 3.0 * st + t * ct) / t3
    ) * VV
    c1 = (t - st) / t3
    c2 = (1.0 - ct) / t2

    E = [None] * 3
    e3 = jnp.eye(3, dtype=r.dtype)
    for a in range(3):
        ea = sm.row(e3, a).reshape((3,) + (1,) * (r.ndim - 1))
        E[a] = skew(jnp.broadcast_to(ea, r.shape))
    # anticommutator E_a W + W E_a; E_a is a 0/±1 constant, XLA folds the
    # zero terms out of the expanded products.
    djl = jnp.stack([
        c1 * (sm.mm(E[a], W) + sm.mm(W, E[a])) + c2 * E[a] + sm.row(r, a) * base
        for a in range(3)
    ])
    # djlt_a = -Jlt djl_a Jlt  (orientation_tool.h:223-225)
    djlt = jnp.stack([-sm.mm(Jlt, sm.mm(sm.row(djl, a), Jlt)) for a in range(3)])
    return dict(R=R, Jl=Jl, Jlt=Jlt, djlt=djlt)


def dynamics(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """dx/dt, SoA: x [12, ...], u [12, ...] -> [12, ...].
    Ref: SRBD_model.cpp:87-99."""
    r, l, p, v = x[0:3], x[3:6], x[6:9], x[9:12]
    t = _safe_theta(r)
    st, ct = jnp.sin(t), jnp.cos(t)
    inv_t = 1.0 / t
    W = skew(r)
    WW = sm.mm(W, W)
    I = _eye3(sm.row(r, 0))
    sinc = st * inv_t
    R = I + sinc * W + ((1.0 - ct) * inv_t * inv_t) * WW
    VV = WW * (inv_t * inv_t)
    half_t = 0.5 * t
    hc = half_t * (jnp.cos(half_t) / jnp.sin(half_t))
    Jlt = hc * I + (1.0 - hc) * (VV + I) - half_t * (W * inv_t)

    batch = r.shape[1:]
    nb = (1,) * (r.ndim - 1)
    Iinv = jnp.broadcast_to(
        params.inertia_inv.reshape((3, 3) + nb), (3, 3) + batch)
    RIRt = sm.mm(sm.mm(R, Iinv), sm.transpose(R))
    w = sm.mv(RIRt, l)
    r_dot = sm.mv(Jlt, w)

    pf0 = jnp.broadcast_to(sm.row(params.foot_pos, 0).reshape((3,) + nb),
                           (3,) + batch)
    pf1 = jnp.broadcast_to(sm.row(params.foot_pos, 1).reshape((3,) + nb),
                           (3,) + batch)
    l_dot = u[3:6] + u[9:12] + cross(pf0 - p, u[0:3]) + cross(pf1 - p, u[6:9])
    p_dot = v
    v_dot = (u[0:3] + u[6:9]) / params.mass + _g_vec(nb, x.dtype)
    return jnp.concatenate([r_dot, l_dot, p_dot, v_dot], axis=0)


def jacobian_blocks(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, ...]:
    """The five nonzero 3x3 blocks of the SRBD Jacobians, SoA.

    J_fx = [[D1, D2, 0, 0],    J_fu = [[0,  0, 0,  0],
            [0,  0, SF, 0],            [Sr, I, Sl, I],
            [0,  0, 0,  I],            [0,  0, 0,  0],
            [0,  0, 0,  0]]            [I/m,0, I/m,0]]

    (state = [r, l, p, v]; SRBD_model.cpp:105-140). The structured
    Riccati products in ops/sqp_pallas exploit exactly this sparsity —
    the dense products waste ~2x FLOPs on structural zeros."""
    r, l, p = x[0:3], x[3:6], x[6:9]
    ch = so3_chain(r)
    R, Jl, Jlt, djlt = ch["R"], ch["Jl"], ch["Jlt"], ch["djlt"]

    nb = (1,) * (r.ndim - 1)
    Iinv = jnp.broadcast_to(params.inertia_inv.reshape((3, 3) + nb),
                            (3, 3) + r.shape[1:])
    RIRt = sm.mm(sm.mm(R, Iinv), sm.transpose(R))
    w = sm.mv(RIRt, l)
    # djlt_w[:, a, ...] = djlt[a] @ w
    djlt_w = jnp.stack([sm.mv(sm.row(djlt, a), w) for a in range(3)], axis=1)

    D1 = djlt_w + sm.mm(sm.mm(Jlt, sm.mm(RIRt, skew(l)) - skew(w)), Jl)
    D2 = sm.mm(Jlt, RIRt)
    SF = skew(u[0:3] + u[6:9])
    batch = D1.shape[2:]
    pf0 = sm.row(params.foot_pos, 0).reshape((3,) + nb)
    pf1 = sm.row(params.foot_pos, 1).reshape((3,) + nb)
    Sr = skew(jnp.broadcast_to(pf0, (3,) + batch) - p)
    Sl = skew(jnp.broadcast_to(pf1, (3,) + batch) - p)
    return D1, D2, SF, Sr, Sl


def linearize_stage(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, ...]:
    """(D1, D2, SF, Sr, Sl, x_next_rk4): Jacobian blocks AND the RK4 step
    in one pass, sharing the SO(3) chain, R I^-1 R', and w at the stage
    point — ``jacobian_blocks`` + ``rk4`` called separately recompute all
    three for RK4's first dynamics eval (~1 of its ~5
    transcendental-heavy chain evaluations). Used by the fused SQP
    kernels where the stage linearization dominates (tools/
    profile_stages.py: the in-kernel linearize phase is ~60 % of the
    one-pass kernel). k1 here uses the shared so3_chain quantities, so
    it differs from ``rk4``'s first eval only in rounding (same formulas,
    chain's (1-ct)/t^2 vs dynamics' (1-ct)*inv_t*inv_t)."""
    r, l, p, v = x[0:3], x[3:6], x[6:9], x[9:12]
    ch = so3_chain(r)
    R, Jl, Jlt, djlt = ch["R"], ch["Jl"], ch["Jlt"], ch["djlt"]

    nb = (1,) * (r.ndim - 1)
    batch = r.shape[1:]
    Iinv = jnp.broadcast_to(params.inertia_inv.reshape((3, 3) + nb),
                            (3, 3) + batch)
    RIRt = sm.mm(sm.mm(R, Iinv), sm.transpose(R))
    w = sm.mv(RIRt, l)

    # ---- Jacobian blocks (shared chain; same math as jacobian_blocks) ----
    djlt_w = jnp.stack([sm.mv(sm.row(djlt, a), w) for a in range(3)], axis=1)
    D1 = djlt_w + sm.mm(sm.mm(Jlt, sm.mm(RIRt, skew(l)) - skew(w)), Jl)
    D2 = sm.mm(Jlt, RIRt)
    SF = skew(u[0:3] + u[6:9])
    pf0 = jnp.broadcast_to(sm.row(params.foot_pos, 0).reshape((3,) + nb),
                           (3,) + batch)
    pf1 = jnp.broadcast_to(sm.row(params.foot_pos, 1).reshape((3,) + nb),
                           (3,) + batch)
    Sr = skew(pf0 - p)
    Sl = skew(pf1 - p)

    # ---- RK4 with k1 from the shared chain -------------------------------
    f01 = u[0:3]
    f02 = u[6:9]
    l_dot = (u[3:6] + u[9:12] + cross(pf0 - p, f01) + cross(pf1 - p, f02))
    g = _g_vec(nb, x.dtype)
    v_dot = (f01 + f02) / params.mass + g
    k1 = jnp.concatenate([sm.mv(Jlt, w), l_dot, v, v_dot], axis=0)

    dt = params.dt
    k2 = dynamics(params, x + 0.5 * dt * k1, u)
    k3 = dynamics(params, x + 0.5 * dt * k2, u)
    k4 = dynamics(params, x + dt * k3, u)
    x_next = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return D1, D2, SF, Sr, Sl, x_next


def jacobians(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(J_fx, J_fu) [12,12,...], SoA. Ref: SRBD_model.cpp:105-140."""
    dtype = x.dtype
    D1, D2, SF, Sr, Sl = jacobian_blocks(params, x, u)
    batch = D1.shape[2:]
    nb = (1,) * (x.ndim - 1)
    Z = jnp.zeros((3, 3) + batch, dtype)
    I = jnp.broadcast_to(jnp.eye(3, dtype=dtype).reshape((3, 3) + nb), (3, 3) + batch)

    def grid(rows):
        return jnp.concatenate(
            [jnp.concatenate(row, axis=1) for row in rows], axis=0
        )

    J_fx = grid([[D1, D2, Z, Z], [Z, Z, SF, Z], [Z, Z, Z, I], [Z, Z, Z, Z]])
    Im = I / params.mass
    J_fu = grid([[Z, Z, Z, Z], [Sr, I, Sl, I], [Z, Z, Z, Z], [Im, Z, Im, Z]])
    return J_fx, J_fu


def rk4(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """RK4 step, SoA. Ref: SRBD_model.cpp:174-179."""
    dt = params.dt
    k1 = dynamics(params, x, u)
    k2 = dynamics(params, x + 0.5 * dt * k1, u)
    k3 = dynamics(params, x + 0.5 * dt * k2, u)
    k4 = dynamics(params, x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def euler_AB(params: SRBDParams, x: jnp.ndarray, u: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Euler-sensitivity (A, B) = (I + dt J_fx, dt J_fu), SoA.
    Ref: SRBD_model.cpp:180-181."""
    J_fx, J_fu = jacobians(params, x, u)
    nb = (1,) * (x.ndim - 1)
    I12 = jnp.eye(NX, dtype=x.dtype).reshape((NX, NX) + nb)
    return I12 + params.dt * J_fx, params.dt * J_fu
