"""One-pass fused SQP kernel with a STAGE-PLANE linearization phase.

Variant of ``ops.sqp_pallas.sqp_qp_solve_onepass_cand`` that restructures
the kernel's dominant cost. Profiling (tools/profile_stages.py) put the
in-kernel linearization (RK4 defect + SO(3) chain + Jacobian blocks +
barrier) at ~60 % of the one-pass kernel, and tools/probe_pack.py showed
why: its per-stage scalars are [block]-rows (1/8 sublane occupancy) and
its [3,3,block] products run ~5x below the VPU's wide-op rate. The
stages are INDEPENDENT in the linearization — only the Riccati recursion
is sequential — so this kernel:

- grid step g == 0 ("plane phase"): linearizes ALL N stages at once as
  entry-wise algebra over [N, block] planes (models.srbd_planes — 83 %
  sublane occupancy incl. every transcendental), evaluates the barrier
  on the [NG, N, block] constraint stack, reduces the merit quantities
  (theta, phi, max|defect|, min con) across stages in-register, and
  parks a compact structured linearization pack (C = 87 channels: D1,
  D2, the skew generator vectors of SF/Sr/Sl, defect b, cost gradients
  q/r_eff, barrier curvature ddb) in VMEM scratch [N, C, block] — one
  leading<->second-minor swapaxes, the probe-measured cheap relayout.
- grid steps g = 1..N: backward Riccati stage k = N-g reading stage
  blocks from the pack (leading-dim slices, free) and running the same
  structured stage body as the dense-layout kernel
  (sqp_pallas._riccati_stage_structured), parking only (K, k) — the
  forward rollout (the unrolled epilogue of g == N) re-applies the
  structured A/B from the pack (dx + dt (Jx dx + Ju du) + b) instead of
  a parked Acl/bcl, saving 3.2 MB of VMEM and the A + BK assembly.

The candidate fold (x + alpha dx with per-scenario alpha) is applied to
the planes at load time, so this single kernel serves BOTH the bootstrap
(alpha = 0) and the speculative line-search trips — no separate plain
variant.

Ref: the fused stage math mirrors prepareQpStructures + the Riccati
sweep HPIPM runs per SQP iteration
(/root/reference/NMPC_solver.cpp:276-314, hpipm-cpp
src/ocp_qp_ipm_solver.cpp:334); reference formulas cited in
models/srbd_planes.py and models/srbd_soa.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srbd_nmpc_tpu.models import srbd_planes as spl
from srbd_nmpc_tpu.models import srbd_soa
from srbd_nmpc_tpu.models.srbd import NG, NU, NX, SRBDParams
from srbd_nmpc_tpu.ops import smallmat as sm
from srbd_nmpc_tpu.ops.barrier import relaxed_log_barrier
from srbd_nmpc_tpu.ops.sqp_pallas import (_NPARAM, _riccati_stage_structured,
                                          _split_leg_blocks)

# pack channel layout (C rows per stage)
_D1 = 0          # 9: D1 row-major
_D2 = 9          # 9: D2 row-major
_SF = 18         # 3: generator of SF = skew(f01 + f02)
_SR = 21         # 3: generator of Sr = skew(pf0 - p)
_SL = 24         # 3: generator of Sl = skew(pf1 - p)
_B = 27          # 12: defect b = rk4(x, u) - x_next
_Q = 39          # 12: q = Qw (x - xr)
_RF = 51         # 12: r_eff = Rw u + Ac' db
_DDB = 63        # 24: barrier curvature ddb
_C = 87


def _planes_phase(scal_ref, iinv_ref, foot_ref, ac1_ref, ac2_ref, bc_ref,
                  Rw_ref, Qw_ref, Qf_ref, xa_ref, u_ref, xr_ref,
                  dxc_ref, duc_ref, alpha_ref,
                  theta_ref, phi_ref, maxdef_ref, mincon_ref,
                  P_scr, p_scr, qN_scr, pack_scr,
                  mu_b: float, theta_b: float, N: int):
    """g == 0: linearize all stages on [N, block] planes, emit merit
    outputs, park the structured pack."""
    dtype = xa_ref.dtype
    block = xa_ref.shape[-1]

    def widen(c):
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    arow = jnp.squeeze(alpha_ref[...], 0)                  # [block]
    xa = xa_ref[...]                                       # [N+1, NX, block]
    xr = xr_ref[...]
    dxc = dxc_ref[...]
    # stage-plane views: [NX, N, block] with stage in the second-minor
    # (sublane) dim — leading-dim slices then one swapaxes each (the
    # probe-validated leading<->second-minor relayout)
    xT = jnp.swapaxes(jax.lax.slice_in_dim(xa, 0, N, axis=0), 0, 1)
    xnT = jnp.swapaxes(jax.lax.slice_in_dim(xa, 1, N + 1, axis=0), 0, 1)
    dxT = jnp.swapaxes(jax.lax.slice_in_dim(dxc, 0, N, axis=0), 0, 1)
    dxnT = jnp.swapaxes(jax.lax.slice_in_dim(dxc, 1, N + 1, axis=0), 0, 1)
    uT = jnp.swapaxes(u_ref[...], 0, 1)
    duT = jnp.swapaxes(duc_ref[...], 0, 1)
    xrT = jnp.swapaxes(jax.lax.slice_in_dim(xr, 0, N, axis=0), 0, 1)

    x_p = tuple(sm.row(xT, e) + arow * sm.row(dxT, e) for e in range(NX))
    xn_p = tuple(sm.row(xnT, e) + arow * sm.row(dxnT, e) for e in range(NX))
    u_p = tuple(sm.row(uT, e) + arow * sm.row(duT, e) for e in range(NU))
    e_p = tuple(x_p[e] - sm.row(xrT, e) for e in range(NX))

    scal = scal_ref[...]
    mass = sm._at(scal, 0, 0)
    dt = sm._at(scal, 1, 0)
    iv = iinv_ref[...]
    Iinv = tuple(tuple(sm._at(iv, i, j) for j in range(3)) for i in range(3))
    ft = foot_ref[...]
    pf0 = tuple(sm._at(ft, 0, j) for j in range(3))
    pf1 = tuple(sm._at(ft, 1, j) for j in range(3))

    D1, D2, sF, sr, sl, x_next = spl.linearize_stage(
        mass, dt, Iinv, pf0, pf1, x_p, u_p)
    b_p = tuple(x_next[e] - xn_p[e] for e in range(NX))

    # ---- constraints + barrier on the [NG, N, block] stack ---------------
    a1 = ac1_ref[...]                                      # [12, 6]
    a2 = ac2_ref[...]
    bcv = bc_ref[...]                                      # [NG, 1]
    con_p = [spl._addn(*(sm._at(a1, g, j) * u_p[j] for j in range(6)),
                       sm._at(bcv, g, 0)) for g in range(12)]
    con_p += [spl._addn(*(sm._at(a2, g, j) * u_p[6 + j] for j in range(6)),
                        sm._at(bcv, 12 + g, 0)) for g in range(12)]
    CON = jnp.stack(con_p)                                 # [NG, N, block]
    b_bar, db, ddb = relaxed_log_barrier(CON, mu_b, theta_b)
    db_p = tuple(sm.row(db, g) for g in range(NG))

    Qw = Qw_ref[...]
    Rw = Rw_ref[...]
    q_p = tuple(spl._addn(*(sm._at(Qw, i, j) * e_p[j] for j in range(NX)))
                for i in range(NX))
    Ru_p = tuple(spl._addn(*(sm._at(Rw, i, j) * u_p[j] for j in range(NU)))
                 for i in range(NU))
    reff_p = [Ru_p[i] + spl._addn(*(sm._at(a1, g, i) * db_p[g]
                                    for g in range(12)))
              for i in range(6)]
    reff_p += [Ru_p[6 + i] + spl._addn(*(sm._at(a2, g, i) * db_p[12 + g]
                                         for g in range(12)))
               for i in range(6)]

    # ---- terminal stage + Riccati seed -----------------------------------
    aN = alpha_ref[...]                                    # [1, block]
    xNv = (jnp.squeeze(jax.lax.slice_in_dim(xa, N, N + 1, axis=0), 0)
           + aN * jnp.squeeze(jax.lax.slice_in_dim(dxc, N, N + 1, axis=0), 0))
    xrN = jnp.squeeze(jax.lax.slice_in_dim(xr, N, N + 1, axis=0), 0)
    eN = xNv - xrN
    Qf_b = widen(Qf_ref[...])
    qN = sm.mv(Qf_b, eN)
    P_scr[...] = Qf_b
    p_scr[...] = qN
    qN_scr[...] = qN

    # ---- merit reductions across stages (register-resident) --------------
    theta = 0.5 * spl._addn(*(jnp.sum(b_p[e] * b_p[e], axis=0)
                              for e in range(NX)))
    maxdef = functools.reduce(
        jnp.maximum, (jnp.max(jnp.abs(b_p[e]), axis=0) for e in range(NX)))
    phiN = 0.5 * jnp.sum(eN * qN, axis=0)
    phi = (jnp.sum(b_bar, axis=(0, 1))
           + 0.5 * spl._addn(*(jnp.sum(u_p[i] * Ru_p[i], axis=0)
                               for i in range(NU)))
           + 0.5 * spl._addn(*(jnp.sum(e_p[i] * q_p[i], axis=0)
                               for i in range(NX)))
           + phiN)
    mincon = jnp.min(CON, axis=(0, 1))
    theta_ref[...] = theta[None]
    phi_ref[...] = phi[None]
    maxdef_ref[...] = maxdef[None]
    mincon_ref[...] = mincon[None]

    # ---- park the structured pack [N, C, block] --------------------------
    def plane(v):
        if isinstance(v, (int, float)):
            return jnp.full((N, block), v, dtype)
        return v

    planes = ([plane(D1[i][j]) for i in range(3) for j in range(3)]
              + [plane(D2[i][j]) for i in range(3) for j in range(3)]
              + [plane(v) for v in sF] + [plane(v) for v in sr]
              + [plane(v) for v in sl]
              + [plane(v) for v in b_p] + [plane(v) for v in q_p]
              + [plane(v) for v in reff_p])
    PACK = jnp.concatenate([jnp.stack(planes), ddb], axis=0)  # [C, N, block]
    pack_scr[...] = jnp.swapaxes(PACK, 0, 1)


def _onepass_planes_kernel(scal_ref, iinv_ref, foot_ref, ac1_ref, ac2_ref,
                           bc_ref, Rw_ref, Qw_ref, Qf_ref, xa_ref, u_ref,
                           xr_ref, dxc_ref, duc_ref, alpha_ref, dx0_ref,
                           dx_ref, du_ref, dphi_ref,
                           theta_ref, phi_ref, maxdef_ref, mincon_ref,
                           P_scr, p_scr, qN_scr, pack_scr, K_scr, kv_scr,
                           mu_b: float, theta_b: float, reg: float, N: int):
    g = pl.program_id(1)
    dtype = xa_ref.dtype
    block = xa_ref.shape[-1]

    def widen(c):
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    @pl.when(g == 0)
    def _planes():
        _planes_phase(scal_ref, iinv_ref, foot_ref, ac1_ref, ac2_ref,
                      bc_ref, Rw_ref, Qw_ref, Qf_ref, xa_ref, u_ref,
                      xr_ref, dxc_ref, duc_ref, alpha_ref,
                      theta_ref, phi_ref, maxdef_ref, mincon_ref,
                      P_scr, p_scr, qN_scr, pack_scr,
                      mu_b=mu_b, theta_b=theta_b, N=N)

    @pl.when(g > 0)
    def _backward():
        scal = scal_ref[...]
        dt = sm._at(scal, 1, 0)
        m_inv = 1.0 / sm._at(scal, 0, 0)
        k = N - g
        pk = jnp.squeeze(pack_scr[pl.ds(k, 1)], 0)         # [C, block]

        def rows(lo, hi):
            return jax.lax.slice_in_dim(pk, lo, hi, axis=0)

        D1 = jnp.stack([rows(_D1, _D1 + 3), rows(_D1 + 3, _D1 + 6),
                        rows(_D1 + 6, _D1 + 9)])
        D2 = jnp.stack([rows(_D2, _D2 + 3), rows(_D2 + 3, _D2 + 6),
                        rows(_D2 + 6, _D2 + 9)])
        SF = srbd_soa.skew(rows(_SF, _SF + 3))
        Sr = srbd_soa.skew(rows(_SR, _SR + 3))
        Sl = srbd_soa.skew(rows(_SL, _SL + 3))
        b = rows(_B, _B + 12)
        q = rows(_Q, _Q + 12)
        reff = rows(_RF, _RF + 12)
        ddb = rows(_DDB, _DDB + 24)

        Ac1 = widen(ac1_ref[...])
        Ac2 = widen(ac2_ref[...])
        ddb1 = jax.lax.slice_in_dim(ddb, 0, 12, axis=0)
        ddb2 = jax.lax.slice_in_dim(ddb, 12, 24, axis=0)
        C11 = sm.mtm(Ac1, Ac1 * ddb1[:, None])
        C22 = sm.mtm(Ac2, Ac2 * ddb2[:, None])
        z66 = jnp.zeros((6, 6, block), dtype)
        Reff = widen(Rw_ref[...]) + jnp.concatenate([
            jnp.concatenate([C11, z66], axis=1),
            jnp.concatenate([z66, C22], axis=1)], axis=0)

        P_new, p_new, _, K, _, kv = _riccati_stage_structured(
            dt, m_inv, D1, D2, SF, Sr, Sl, widen(Qw_ref[...]), Reff,
            reff, q, b, P_scr[...], p_scr[...], reg, with_acl=False)
        P_scr[...] = P_new
        p_scr[...] = p_new
        K_scr[pl.ds(k, 1)] = K[None]
        kv_scr[pl.ds(k, 1)] = kv[None]

        @pl.when(g == N)
        def _fold():
            # forward rollout + dphi, unrolled (static stage index).
            # Instead of parking Acl/bcl (3.2 MB VMEM + the A + BK
            # assembly per stage), roll forward with the structured
            # blocks straight from the pack:
            #   dx_{k+1} = Acl dx + bcl = A dx + B du + b
            #           = dx + dt (Jx dx + Ju du) + b
            # with Jx dx / Ju du applied block-wise (skews as crosses).
            dt_s = sm._at(scal_ref[...], 1, 0)
            mi_s = 1.0 / sm._at(scal_ref[...], 0, 0)
            dx = dx0_ref[...]
            tot = None
            for kk in range(N):
                Kk = jnp.squeeze(K_scr[pl.ds(kk, 1)], 0)
                du = sm.mv(Kk, dx) + jnp.squeeze(kv_scr[pl.ds(kk, 1)], 0)
                pkk = jnp.squeeze(pack_scr[pl.ds(kk, 1)], 0)

                def prow(lo, hi, pkk=pkk):
                    return jax.lax.slice_in_dim(pkk, lo, hi, axis=0)

                D1k = jnp.stack([prow(_D1, _D1 + 3), prow(_D1 + 3, _D1 + 6),
                                 prow(_D1 + 6, _D1 + 9)])
                D2k = jnp.stack([prow(_D2, _D2 + 3), prow(_D2 + 3, _D2 + 6),
                                 prow(_D2 + 6, _D2 + 9)])
                sFk = prow(_SF, _SF + 3)
                srk = prow(_SR, _SR + 3)
                slk = prow(_SL, _SL + 3)
                bk = prow(_B, _B + 12)
                qk = prow(_Q, _Q + 12)
                rk = prow(_RF, _RF + 12)

                d0 = jax.lax.slice_in_dim(dx, 0, 3, axis=0)
                d1 = jax.lax.slice_in_dim(dx, 3, 6, axis=0)
                d2 = jax.lax.slice_in_dim(dx, 6, 9, axis=0)
                d3 = jax.lax.slice_in_dim(dx, 9, 12, axis=0)
                u0 = jax.lax.slice_in_dim(du, 0, 3, axis=0)
                u1 = jax.lax.slice_in_dim(du, 3, 6, axis=0)
                u2 = jax.lax.slice_in_dim(du, 6, 9, axis=0)
                u3 = jax.lax.slice_in_dim(du, 9, 12, axis=0)
                dxn = dx + bk + dt_s * jnp.concatenate([
                    sm.mv(D1k, d0) + sm.mv(D2k, d1),
                    srbd_soa.cross(sFk, d2) + srbd_soa.cross(srk, u0) + u1
                    + srbd_soa.cross(slk, u2) + u3,
                    d3,
                    mi_s * (u0 + u2)], axis=0)

                part = (jnp.sum(dx * qk, axis=0) + jnp.sum(du * rk, axis=0))
                tot = part if tot is None else tot + part
                du_ref[pl.ds(kk, 1)] = du[None]
                dx_ref[pl.ds(kk, 1)] = dxn[None]
                dx = dxn
            dphi_ref[...] = (tot + jnp.sum(dx * qN_scr[...], axis=0))[None]


def sqp_qp_solve_onepass_planes(
    params: SRBDParams, Q_w: jnp.ndarray, Qf_w: jnp.ndarray, R_w: jnp.ndarray,
    Ac: jnp.ndarray, bc: jnp.ndarray,
    xa: jnp.ndarray, us: jnp.ndarray, xra: jnp.ndarray,
    dxc: jnp.ndarray, duc: jnp.ndarray, alpha: jnp.ndarray,
    x0s: jnp.ndarray,
    mu_b: float, theta_b: float, reg: float = 0.0, block: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Fused SQP QP solve AT THE CANDIDATE (xa + alpha dxc, us + alpha duc)
    with the plane-phase linearization (module docstring). Same contract
    as ``sqp_pallas.sqp_qp_solve_onepass_cand``; the bootstrap call is
    this with alpha = 0 (then dxc/duc are ignored by value).

    REQUIRES ``Ac`` leg-block-diagonal (checked when concrete, see
    sqp_pallas._split_leg_blocks)."""
    N = us.shape[0]
    Bt = xa.shape[-1]
    assert Bt % block == 0, (Bt, block)
    dtype = xa.dtype

    scal = jnp.stack([
        params.mass, params.dt, params.mu, params.lfx, params.lfz,
        params.fmax, params.fmin, jnp.asarray(0.0, dtype),
    ]).reshape(_NPARAM, 1)
    dx0 = x0s - (xa[0] + alpha[None, :] * dxc[0])
    Ac1, Ac2 = _split_leg_blocks(Ac)

    const = lambda *shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    lane_ = lambda i, g: (0, i)
    full3 = lambda d0, d1: pl.BlockSpec((d0, d1, block), lambda i, g: (0, 0, i))

    in_specs = [
        const(_NPARAM, 1), const(3, 3), const(2, 3),
        const(NX, 6), const(NX, 6),
        pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),
        const(NU, NU), const(NX, NX), const(NX, NX),
        full3(N + 1, NX),                      # xa (whole trajectory)
        full3(N, NU),                          # u
        full3(N + 1, NX),                      # xr
        full3(N + 1, NX),                      # dxc
        full3(N, NU),                          # duc
        pl.BlockSpec((1, block), lane_),       # alpha
        pl.BlockSpec((NX, block), lane_),      # dx0
    ]
    out_specs = [
        full3(N, NX),                          # dx_{k+1}
        full3(N, NU),                          # du_k
        pl.BlockSpec((1, block), lane_),       # dphi
        pl.BlockSpec((1, block), lane_),       # theta
        pl.BlockSpec((1, block), lane_),       # phi
        pl.BlockSpec((1, block), lane_),       # max |defect|
        pl.BlockSpec((1, block), lane_),       # min constraint
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, NU, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
    ]
    outs = pl.pallas_call(
        functools.partial(_onepass_planes_kernel, mu_b=mu_b,
                          theta_b=theta_b, reg=reg, N=N),
        grid=(Bt // block, N + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, NX, block), dtype),      # P carry
            pltpu.VMEM((NX, block), dtype),          # p carry
            pltpu.VMEM((NX, block), dtype),          # q_N
            pltpu.VMEM((N, _C, block), dtype),       # linearization pack
            pltpu.VMEM((N, NU, NX, block), dtype),   # K, all stages
            pltpu.VMEM((N, NU, block), dtype),       # k
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac1.astype(dtype), Ac2.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Q_w.astype(dtype), Qf_w.astype(dtype),
      xa, us, xra, dxc, duc, alpha.reshape(1, Bt), dx0)
    dx_rest, du, dphi, theta, phi, maxdef, mincon = outs
    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    aux = (jnp.squeeze(theta, 0), jnp.squeeze(phi, 0),
           jnp.squeeze(maxdef, 0), jnp.squeeze(mincon, 0))
    return dx, du, jnp.squeeze(dphi, 0), aux
