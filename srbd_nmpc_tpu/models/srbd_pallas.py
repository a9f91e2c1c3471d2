"""Fused Pallas kernel for the SRBD linearization stage.

One kernel evaluates, per (scenario-block, stage) grid step, the ENTIRE
prepareQpStructures stage math (NMPC_solver.cpp:276-314): RK4 shooting
defect, Euler-sensitivity (A, B) via the SO(3) Jacobian chain
(SRBD_model.cpp:75-181), and the barrier-augmented input cost
(R_eff, r_eff) plus the tracking gradient q — with all SO(3)/3x3
temporaries living in VMEM. Both grid dimensions are parallel (stages are
independent in the linearization, unlike the Riccati recursion).

Reuses models.srbd_soa for the math (its SoA formulation plus
ops.smallmat's slice-based indexing trace cleanly under Mosaic) and
ops.riccati_pallas's layout conventions. Model parameters arrive as small
VMEM operands and are reassembled into an SRBDParams pytree inside the
kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from srbd_nmpc_tpu.models import srbd_soa
from srbd_nmpc_tpu.models.srbd import NG, NU, NX, SRBDParams
from srbd_nmpc_tpu.ops import smallmat as sm
from srbd_nmpc_tpu.ops.barrier import relaxed_log_barrier

_NPARAM = 8  # mass, dt, mu, lfx, lfz, fmax, fmin, pad


def _kernel(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref, Qw_ref,
            x_ref, xn_ref, u_ref, xr_ref,
            A_ref, B_ref, b_ref, Reff_ref, reff_ref, q_ref, mer_ref,
            mu_b: float, theta_b: float):
    dtype = x_ref.dtype
    block = x_ref.shape[-1]

    def widen(c):
        # constants must reach full lane width in ONE (lane-only) broadcast:
        # Mosaic can't broadcast a single operand in both sublanes and lanes
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    x = jnp.squeeze(x_ref[...], 0)     # [12, block]
    xn = jnp.squeeze(xn_ref[...], 0)
    u = jnp.squeeze(u_ref[...], 0)
    xr = jnp.squeeze(xr_ref[...], 0)

    params = SRBDParams(
        mass=sm._at(scal_ref[...], 0, 0),
        inertia_inv=iinv_ref[...],
        foot_pos=foot_ref[...],
        foot_rot=jnp.zeros((2, 3, 3), dtype),  # unused by dynamics/jacobians
        dt=sm._at(scal_ref[...], 1, 0),
        mu=sm._at(scal_ref[...], 2, 0),
        lfx=sm._at(scal_ref[...], 3, 0),
        lfz=sm._at(scal_ref[...], 4, 0),
        fmax=sm._at(scal_ref[...], 5, 0),
        fmin=sm._at(scal_ref[...], 6, 0),
    )

    A, B = srbd_soa.euler_AB(params, x, u)               # [12,12,block]
    b = srbd_soa.rk4(params, x, u) - xn                   # = -defect

    Ac_b = widen(Ac_ref[...])                             # [24, 12, block]
    con = sm.mv(Ac_b, u) + bc_ref[...]                    # [24, block]
    b_bar, db, ddb = relaxed_log_barrier(con, mu_b, theta_b)
    Rw = widen(Rw_ref[...])
    Reff = Rw + sm.mtm(Ac_b, Ac_b * ddb[:, None])
    Ru = sm.mv(Rw, u)
    reff = Ru + sm.mtv(Ac_b, db)
    q = sm.mv(widen(Qw_ref[...]), x - xr)

    A_ref[...] = A[None]
    B_ref[...] = B[None]
    b_ref[...] = b[None]
    Reff_ref[...] = Reff[None]
    reff_ref[...] = reff[None]
    q_ref[...] = q[None]
    # per-stage merit partials — byproducts of tensors already in VMEM
    # (the reference re-evaluates all of these in linearSearch,
    # NMPC_solver.cpp:152-189; here the current-point merit is free):
    # rows: 0 theta part = 1/2 sum f^2 (f = -b); 1 barrier value sum;
    # 2 min constraint; 3 max |defect|; 4 input cost 1/2 u'Ru;
    # 5 tracking cost 1/2 ex'Q ex = 1/2 ex.q; 6-7 padding.
    zero = jnp.zeros((1, block), dtype)
    mer = jnp.concatenate([
        0.5 * jnp.sum(b * b, axis=0, keepdims=True),
        jnp.sum(b_bar, axis=0, keepdims=True),
        jnp.min(con, axis=0, keepdims=True),
        jnp.max(jnp.abs(b), axis=0, keepdims=True),
        0.5 * jnp.sum(u * Ru, axis=0, keepdims=True),
        0.5 * jnp.sum((x - xr) * q, axis=0, keepdims=True),
        zero, zero,
    ], axis=0)                                            # [8, block]
    mer_ref[...] = mer[None]


def linearize_pallas(
    params: SRBDParams, Q_w: jnp.ndarray, R_w: jnp.ndarray,
    Ac: jnp.ndarray, bc: jnp.ndarray,
    xs: jnp.ndarray, xn: jnp.ndarray, us: jnp.ndarray, xr: jnp.ndarray,
    mu_b: float, theta_b: float, block: int = 256,
) -> Tuple[jnp.ndarray, ...]:
    """Fused stage linearization.

    Inputs stage-major SoA: xs/xn/us/xr [N,12,Bt] (current state, next
    state, input, reference per stage). Returns
    (A, B [N,12,12,Bt], b, q, r_eff [N,12,Bt], R_eff [N,12,12,Bt],
    mer [N,8,Bt]) where ``mer`` carries per-stage merit partials (see
    ``_kernel``): summing/reducing over stages outside the kernel yields
    the current-point merit (theta, phi_running, max|defect|, min con)
    with no separate merit sweep.
    """
    N, _, Bt = xs.shape
    assert Bt % block == 0, (Bt, block)
    dtype = xs.dtype

    scal = jnp.stack([
        params.mass, params.dt, params.mu, params.lfx, params.lfz,
        params.fmax, params.fmin, jnp.asarray(0.0, dtype),
    ]).reshape(_NPARAM, 1)

    const = lambda *shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    sv_ = lambda i, g: (g, 0, i)
    sm_ = lambda i, g: (g, 0, 0, i)

    in_specs = [
        const(_NPARAM, 1),          # scalars
        const(3, 3),                # inertia_inv
        const(2, 3),                # foot_pos
        const(NG, NU),              # Ac
        pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),   # bc [24,1]
        const(NU, NU),              # R weight
        const(NX, NX),              # Q weight
        pl.BlockSpec((1, NX, block), sv_),            # x
        pl.BlockSpec((1, NX, block), sv_),            # x_next
        pl.BlockSpec((1, NU, block), sv_),            # u
        pl.BlockSpec((1, NX, block), sv_),            # x_ref
    ]
    out_specs = [
        pl.BlockSpec((1, NX, NX, block), sm_),
        pl.BlockSpec((1, NX, NU, block), sm_),
        pl.BlockSpec((1, NX, block), sv_),
        pl.BlockSpec((1, NU, NU, block), sm_),
        pl.BlockSpec((1, NU, block), sv_),
        pl.BlockSpec((1, NX, block), sv_),
        pl.BlockSpec((1, 8, block), sv_),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, NX, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, NX, NU, Bt), dtype),
        jax.ShapeDtypeStruct((N, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, NU, NU, Bt), dtype),
        jax.ShapeDtypeStruct((N, NU, Bt), dtype),
        jax.ShapeDtypeStruct((N, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, 8, Bt), dtype),
    ]
    A, B, b, Reff, reff, q, mer = pl.pallas_call(
        functools.partial(_kernel, mu_b=mu_b, theta_b=theta_b),
        grid=(Bt // block, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Q_w.astype(dtype), xs, xn, us, xr)
    return A, B, b, q, reff, Reff, mer
