"""Fused Pallas kernel for the NMPC merit function.

Evaluates theta (shooting-defect norm), phi (tracking + barrier + input
cost) and their gradients for a whole scenario block in one pass over the
horizon: a sequential stage grid accumulates the per-scenario sums in VMEM
scratch, so the RK4 defect chain (the dominant line-search FLOPs,
linearSearch at NMPC_solver.cpp:152-233) never round-trips HBM.

Outputs per scenario: theta [B], phi [B], and per-stage gradients
Jphi_x [N+1,12,B], Jphi_u [N,12,B] (checkConvergence's dphi inputs,
NMPC_solver.cpp:191-198), plus the diagnostics max|defect| and min(con).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srbd_nmpc_tpu.models import srbd_soa
from srbd_nmpc_tpu.models.srbd import NG, NU, NX, SRBDParams
from srbd_nmpc_tpu.ops import smallmat as sm
from srbd_nmpc_tpu.ops.barrier import relaxed_log_barrier

_NPARAM = 8


def _kernel(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref, Qw_ref,
            Qf_ref, x_ref, xn_ref, u_ref, xr_ref, xrN_ref,
            theta_ref, phi_ref, Jx_ref, Ju_ref, maxdef_ref, mincon_ref,
            acc_scr, mu_b: float, theta_b: float, N: int):
    _merit_stage(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref,
                 Qw_ref, Qf_ref, x_ref, xn_ref, u_ref, xr_ref, xrN_ref,
                 theta_ref, phi_ref, Jx_ref, Ju_ref, maxdef_ref, mincon_ref,
                 acc_scr, mu_b, theta_b, N)


def _kernel_nograd(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref,
                   Qw_ref, Qf_ref, x_ref, xn_ref, u_ref, xr_ref, xrN_ref,
                   theta_ref, phi_ref, maxdef_ref, mincon_ref,
                   acc_scr, mu_b: float, theta_b: float, N: int):
    """Line-search variant: merits/diagnostics only — the per-stage
    gradient tensors (8 MB per call at B=4096) are neither computed nor
    written. The line search never uses gradients (dphi comes from the
    linearization byproducts of the PREVIOUS point)."""
    _merit_stage(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref,
                 Qw_ref, Qf_ref, x_ref, xn_ref, u_ref, xr_ref, xrN_ref,
                 theta_ref, phi_ref, None, None, maxdef_ref, mincon_ref,
                 acc_scr, mu_b, theta_b, N)


def _merit_stage(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref, Qw_ref,
                 Qf_ref, x_ref, xn_ref, u_ref, xr_ref, xrN_ref,
                 theta_ref, phi_ref, Jx_ref, Ju_ref, maxdef_ref, mincon_ref,
                 acc_scr, mu_b: float, theta_b: float, N: int):
    g = pl.program_id(1)
    dtype = x_ref.dtype
    block = x_ref.shape[-1]

    def widen(c):
        # lane-only broadcast; Mosaic rejects sublane+lane double broadcasts
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    x = jnp.squeeze(x_ref[...], 0)       # [12, block] — stage g state
    xn = jnp.squeeze(xn_ref[...], 0)     # stage g+1 state
    u = jnp.squeeze(u_ref[...], 0)
    xr = jnp.squeeze(xr_ref[...], 0)

    params = SRBDParams(
        mass=sm._at(scal_ref[...], 0, 0),
        inertia_inv=iinv_ref[...],
        foot_pos=foot_ref[...],
        foot_rot=jnp.zeros((2, 3, 3), dtype),
        dt=sm._at(scal_ref[...], 1, 0),
        mu=sm._at(scal_ref[...], 2, 0),
        lfx=sm._at(scal_ref[...], 3, 0),
        lfz=sm._at(scal_ref[...], 4, 0),
        fmax=sm._at(scal_ref[...], 5, 0),
        fmin=sm._at(scal_ref[...], 6, 0),
    )

    @pl.when(g == 0)
    def _():
        # rows: [theta, phi, max|defect|, min(con)]
        acc_scr[...] = jnp.concatenate([
            jnp.zeros((3,) + acc_scr.shape[1:], dtype),
            jnp.full((1,) + acc_scr.shape[1:], 1e30, dtype),
        ])

    defect = xn - srbd_soa.rk4(params, x, u)          # [12, block]
    theta_part = 0.5 * jnp.sum(defect * defect, axis=0)

    ex = x - xr
    Qx = sm.mv(widen(Qw_ref[...]), ex)                # [12, block]
    phi_x = 0.5 * jnp.sum(ex * Qx, axis=0)

    Ac_b = widen(Ac_ref[...])
    con = sm.mv(Ac_b, u) + bc_ref[...]                # [24, block]
    b_bar, db, _ = relaxed_log_barrier(con, mu_b, theta_b)
    Ru = sm.mv(widen(Rw_ref[...]), u)
    phi_u = jnp.sum(b_bar, axis=0) + 0.5 * jnp.sum(u * Ru, axis=0)

    acc = acc_scr[...]
    th = sm.row(acc, 0) + theta_part
    ph = sm.row(acc, 1) + phi_x + phi_u
    md = jnp.maximum(sm.row(acc, 2), jnp.max(jnp.abs(defect), axis=0))
    mc = jnp.minimum(sm.row(acc, 3), jnp.min(con, axis=0))
    acc_scr[...] = jnp.stack([th, ph, md, mc])

    if Jx_ref is not None:
        Jx_ref[...] = Qx[None]
        Ju_ref[...] = (sm.mtv(Ac_b, db) + Ru)[None]

    @pl.when(g == N - 1)
    def _():
        # terminal stage: phi += 1/2 e_N' Qf e_N ; Jx[N] = Qf e_N
        eN = xn - jnp.squeeze(xrN_ref[...], 0)
        QfeN = sm.mv(widen(Qf_ref[...]), eN)
        acc2 = acc_scr[...]
        theta_ref[...] = sm.row(acc2, 0)[None]
        phi_ref[...] = (sm.row(acc2, 1) + 0.5 * jnp.sum(eN * QfeN, axis=0))[None]
        maxdef_ref[...] = sm.row(acc2, 2)[None]
        mincon_ref[...] = sm.row(acc2, 3)[None]
        del QfeN  # terminal gradient row is assembled by the wrapper


def _kernel_alpha(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref,
                  Qw_ref, Qf_ref, x_ref, xn_ref, dx_ref, dxn_ref, u_ref,
                  du_ref, xr_ref, xrN_ref, alpha_ref,
                  theta_ref, phi_ref, acc_scr,
                  mu_b: float, theta_b: float, N: int):
    """Line-search candidate variant: evaluates the merit at the trial
    point (x + alpha dx, u + alpha du) with a per-scenario alpha, so the
    backtracking loop never materializes candidate trajectories in HBM
    (the reference evaluates each candidate the same way in-place,
    NMPC_solver.cpp:200-233)."""
    g = pl.program_id(1)
    dtype = x_ref.dtype
    block = x_ref.shape[-1]

    def widen(c):
        # lane-only broadcast; Mosaic rejects sublane+lane double broadcasts
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    a = alpha_ref[...]                   # [1, block] — sublane-broadcasts
    x = jnp.squeeze(x_ref[...], 0) + a * jnp.squeeze(dx_ref[...], 0)
    xn = jnp.squeeze(xn_ref[...], 0) + a * jnp.squeeze(dxn_ref[...], 0)
    u = jnp.squeeze(u_ref[...], 0) + a * jnp.squeeze(du_ref[...], 0)
    xr = jnp.squeeze(xr_ref[...], 0)

    params = SRBDParams(
        mass=sm._at(scal_ref[...], 0, 0),
        inertia_inv=iinv_ref[...],
        foot_pos=foot_ref[...],
        foot_rot=jnp.zeros((2, 3, 3), dtype),
        dt=sm._at(scal_ref[...], 1, 0),
        mu=sm._at(scal_ref[...], 2, 0),
        lfx=sm._at(scal_ref[...], 3, 0),
        lfz=sm._at(scal_ref[...], 4, 0),
        fmax=sm._at(scal_ref[...], 5, 0),
        fmin=sm._at(scal_ref[...], 6, 0),
    )

    defect = xn - srbd_soa.rk4(params, x, u)
    theta_part = 0.5 * jnp.sum(defect * defect, axis=0)

    ex = x - xr
    Qx = sm.mv(widen(Qw_ref[...]), ex)
    phi_x = 0.5 * jnp.sum(ex * Qx, axis=0)

    Ac_b = widen(Ac_ref[...])
    con = sm.mv(Ac_b, u) + bc_ref[...]
    b_bar, _, _ = relaxed_log_barrier(con, mu_b, theta_b)
    Ru = sm.mv(widen(Rw_ref[...]), u)
    phi_u = jnp.sum(b_bar, axis=0) + 0.5 * jnp.sum(u * Ru, axis=0)

    is_first = g == 0
    acc = acc_scr[...]                   # garbage at g == 0; select discards
    zero = jnp.zeros((), dtype)
    th = jnp.where(is_first, zero, sm.row(acc, 0)) + theta_part
    ph = jnp.where(is_first, zero, sm.row(acc, 1)) + phi_x + phi_u
    acc_scr[...] = jnp.stack([th, ph])

    @pl.when(g == N - 1)
    def _():
        eN = xn - jnp.squeeze(xrN_ref[...], 0)   # xn here IS candidate x_N
        QfeN = sm.mv(widen(Qf_ref[...]), eN)
        theta_ref[...] = th[None]
        phi_ref[...] = (ph + 0.5 * jnp.sum(eN * QfeN, axis=0))[None]


def merit_alpha_pallas(
    params: SRBDParams, Q_w: jnp.ndarray, Qf_w: jnp.ndarray, R_w: jnp.ndarray,
    Ac: jnp.ndarray, bc: jnp.ndarray,
    x: jnp.ndarray, u: jnp.ndarray, xr: jnp.ndarray,
    dx: jnp.ndarray, du: jnp.ndarray, alpha: jnp.ndarray,
    mu_b: float, theta_b: float, block: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merit (theta, phi) at the candidate (x + alpha dx, u + alpha du).

    Stage-major SoA inputs: x/xr/dx [N+1,12,Bt], u/du [N,12,Bt],
    alpha [Bt] per scenario. Returns (theta [Bt], phi [Bt])."""
    Np1, _, Bt = x.shape
    N = Np1 - 1
    assert Bt % block == 0
    dtype = x.dtype

    scal = jnp.stack([
        params.mass, params.dt, params.mu, params.lfx, params.lfz,
        params.fmax, params.fmin, jnp.asarray(0.0, dtype),
    ]).reshape(_NPARAM, 1)

    const = lambda *shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    sv_ = lambda i, g: (g, 0, i)
    sv1_ = lambda i, g: (g + 1, 0, i)
    lane_ = lambda i, g: (0, i)

    in_specs = [
        const(_NPARAM, 1), const(3, 3), const(2, 3),
        const(NG, NU), pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),
        const(NU, NU), const(NX, NX), const(NX, NX),
        pl.BlockSpec((1, NX, block), sv_),    # x_g
        pl.BlockSpec((1, NX, block), sv1_),   # x_{g+1}
        pl.BlockSpec((1, NX, block), sv_),    # dx_g
        pl.BlockSpec((1, NX, block), sv1_),   # dx_{g+1}
        pl.BlockSpec((1, NU, block), sv_),    # u_g
        pl.BlockSpec((1, NU, block), sv_),    # du_g
        pl.BlockSpec((1, NX, block), sv_),    # xr_g
        pl.BlockSpec((1, NX, block), lambda i, g: (N, 0, i)),  # xr_N
        pl.BlockSpec((1, block), lane_),      # alpha
    ]
    theta, phi = pl.pallas_call(
        functools.partial(_kernel_alpha, mu_b=mu_b, theta_b=theta_b, N=N),
        grid=(Bt // block, N),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, block), lane_),
                   pl.BlockSpec((1, block), lane_)],
        out_shape=[jax.ShapeDtypeStruct((1, Bt), dtype),
                   jax.ShapeDtypeStruct((1, Bt), dtype)],
        scratch_shapes=[pltpu.VMEM((2, block), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Q_w.astype(dtype), Qf_w.astype(dtype),
      x, x, dx, dx, u, du, xr, xr, alpha.reshape(1, Bt))
    return jnp.squeeze(theta, 0), jnp.squeeze(phi, 0)


def merit_pallas(
    params: SRBDParams, Q_w: jnp.ndarray, Qf_w: jnp.ndarray, R_w: jnp.ndarray,
    Ac: jnp.ndarray, bc: jnp.ndarray,
    x: jnp.ndarray, u: jnp.ndarray, xr: jnp.ndarray,
    mu_b: float, theta_b: float, block: int = 256, with_grad: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Fused merit. Stage-major SoA inputs: x [N+1,12,Bt], u [N,12,Bt],
    xr [N+1,12,Bt]. Returns (theta [Bt], phi [Bt], Jphi_x [N+1,12,Bt],
    Jphi_u [N,12,Bt], max_defect [Bt], min_con [Bt]); with
    ``with_grad=False`` the gradient outputs are skipped entirely
    (returned as None) — the line-search fast path."""
    Np1, _, Bt = x.shape
    N = Np1 - 1
    assert Bt % block == 0
    dtype = x.dtype

    scal = jnp.stack([
        params.mass, params.dt, params.mu, params.lfx, params.lfz,
        params.fmax, params.fmin, jnp.asarray(0.0, dtype),
    ]).reshape(_NPARAM, 1)

    const = lambda *shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    sv_ = lambda i, g: (g, 0, i)
    sv1_ = lambda i, g: (g + 1, 0, i)
    bv_ = lambda i, g: (0, i)

    in_specs = [
        const(_NPARAM, 1), const(3, 3), const(2, 3),
        const(NG, NU), pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),
        const(NU, NU), const(NX, NX), const(NX, NX),
        pl.BlockSpec((1, NX, block), sv_),    # x_g
        pl.BlockSpec((1, NX, block), sv1_),   # x_{g+1}
        pl.BlockSpec((1, NU, block), sv_),    # u_g
        pl.BlockSpec((1, NX, block), sv_),    # xr_g
        pl.BlockSpec((1, NX, block), lambda i, g: (N, 0, i)),  # xr_N
    ]
    scalar_spec = pl.BlockSpec((1, block), lambda i, g: (0, i))
    grad_specs = [
        pl.BlockSpec((1, NX, block), sv_),
        pl.BlockSpec((1, NU, block), sv_),
    ] if with_grad else []
    grad_shapes = [
        jax.ShapeDtypeStruct((N, NX, Bt), dtype),   # running-stage grads
        jax.ShapeDtypeStruct((N, NU, Bt), dtype),
    ] if with_grad else []
    out_specs = ([scalar_spec, scalar_spec] + grad_specs
                 + [scalar_spec, scalar_spec])
    out_shape = ([jax.ShapeDtypeStruct((1, Bt), dtype)] * 2 + grad_shapes
                 + [jax.ShapeDtypeStruct((1, Bt), dtype)] * 2)
    kernel = _kernel if with_grad else _kernel_nograd
    outs = pl.pallas_call(
        functools.partial(kernel, mu_b=mu_b, theta_b=theta_b, N=N),
        grid=(Bt // block, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((4, block), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Q_w.astype(dtype), Qf_w.astype(dtype),
      x, x, u, xr, xr)

    sq = lambda z: jnp.squeeze(z, 0)
    if not with_grad:
        theta, phi, maxdef, mincon = outs
        return sq(theta), sq(phi), None, None, sq(maxdef), sq(mincon)
    theta, phi, Jx_run, Ju, maxdef, mincon = outs

    # terminal gradient row (tiny; XLA)
    eN = x[-1] - xr[-1]
    JxN = sm.mv(Qf_w[..., None], eN)
    Jx = jnp.concatenate([Jx_run, JxN[None]], axis=0)
    return sq(theta), sq(phi), Jx, Ju, sq(maxdef), sq(mincon)
