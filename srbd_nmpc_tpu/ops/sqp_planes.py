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


def _rb(M, i):
    """Row-block i (rows 3i:3i+3) of a [12, ..., B] SoA array."""
    return jax.lax.slice_in_dim(M, 3 * i, 3 * i + 3, axis=0)


def _riccati_stage_rank6(dt, m_inv, D1, D2, SF, Sr, Sl, Qw_b, R1h, R2h,
                         reff, q, b, P, p):
    """Structured backward-Riccati stage exploiting rank(B) = 6.

    The SRBD control Jacobian Ju has only 6 nonzero rows (row-blocks 1
    and 3: W = [[Sr, I, Sl, I], [I/m, 0, I/m, 0]], SRBD_model.cpp:
    121-140), so B = dt Ju = dt S W with S a row selector and
    G = R^ + dt^2 W' Pss W, where R^ = Reff + reg I is leg-BLOCK-DIAGONAL
    (R1h/R2h [6,6,block], requires block-diagonal R weights — checked
    host-side) and Pss = P[(3:6,9:12),(3:6,9:12)] is just a [6,6]
    subblock of P. The 12x12 Cholesky + 13-rhs solve of the dense stage
    becomes 6x6 factorizations via the push-through identity

        G^-1 W' = R^-1 W' M6^-1,   M6 = I + dt^2 Pss T,  T = W R^-1 W',

    with M6 solved SYMMETRICALLY: T = Lt Lt', w = (I + dt^2 Lt'Pss Lt)^-1
    Lt'y, x = y - dt^2 Pss Lt w (all SPD 6x6 — no pivoting needed; M6
    itself is nonsymmetric). Returns (P_new, p_new, K, kv) — bit-level
    different rounding from the 12x12 path but the same linear algebra;
    validated at f64 in tests/test_sqp_planes.py.
    """
    dtype = P.dtype
    block = P.shape[-1]
    dt2 = dt * dt

    # Jx' row recipes (identical to _riccati_stage_structured)
    def JxT(Mat):
        M0, M1, M2 = _rb(Mat, 0), _rb(Mat, 1), _rb(Mat, 2)
        return jnp.concatenate([sm.mtm(D1, M0), sm.mtm(D2, M0),
                                sm.mtm(SF, M1), M2], axis=0)

    def JxTv(v):
        v0, v1, v2 = _rb(v, 0), _rb(v, 1), _rb(v, 2)
        return jnp.concatenate([sm.mtv(D1, v0), sm.mtv(D2, v0),
                                sm.mtv(SF, v1), v2], axis=0)

    V = JxT(P)                                         # Jx' P
    M = jnp.swapaxes(V, 0, 1)                          # P Jx  (P = P')
    PA = P + dt * M

    def srows(X):
        return jnp.concatenate(
            [jax.lax.slice_in_dim(X, 3, 6, axis=0),
             jax.lax.slice_in_dim(X, 9, 12, axis=0)], axis=0)

    Y = srows(PA)                                      # [6, 12, block]
    Pb_p = sm.mv(P, b) + p
    ys = srows(Pb_p)                                   # [6, block]
    Ps = srows(P)                                      # [6, 12, block]
    Pss = jnp.concatenate(
        [jax.lax.slice_in_dim(Ps, 3, 6, axis=1),
         jax.lax.slice_in_dim(Ps, 9, 12, axis=1)], axis=1)  # [6, 6, block]

    # W' column blocks: C1 = [[Sr', I/m], [I, 0]], C2 = [[Sl', I/m], [I, 0]]
    z3 = jnp.zeros((3, 3, block), dtype)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, block))
    Im3 = m_inv * I3
    C1 = jnp.concatenate([
        jnp.concatenate([jnp.swapaxes(Sr, 0, 1), Im3], axis=1),
        jnp.concatenate([I3, z3], axis=1)], axis=0)
    C2 = jnp.concatenate([
        jnp.concatenate([jnp.swapaxes(Sl, 0, 1), Im3], axis=1),
        jnp.concatenate([I3, z3], axis=1)], axis=0)

    L1, d1 = sm.cholesky(R1h)
    L2, d2 = sm.cholesky(R2h)
    E1 = sm.chol_solve(L1, d1, C1)                     # R^-1 W' top
    E2 = sm.chol_solve(L2, d2, C2)                     # R^-1 W' bottom
    T = sm.mtm(C1, E1) + sm.mtm(C2, E2)                # W R^-1 W'  [6,6]
    Lt, dt6 = sm.cholesky(T)
    PssLt = sm.mm(Pss, Lt)
    Ms = sm.add_diag(dt2 * sm.mtm(Lt, PssLt), 1.0)     # I + dt^2 Lt'Pss Lt
    Lm, dm = sm.cholesky(Ms)

    # r~ = R^-1 reff (block-diagonal solve), w_r = W r~
    r1 = jax.lax.slice_in_dim(reff, 0, 6, axis=0)
    r2 = jax.lax.slice_in_dim(reff, 6, 12, axis=0)
    rt1 = sm.chol_solve_vec(L1, d1, r1)
    rt2 = sm.chol_solve_vec(L2, d2, r2)
    w_r = sm.mtv(C1, rt1) + sm.mtv(C2, rt2)            # W r~ = C1' rt1 + ...
    zvec = dt * ys - dt2 * sm.mv(Pss, w_r)

    # M6^-1 applied to [Y | zvec] via the symmetric inner system
    RHS = jnp.concatenate([Y, zvec[:, None, :]], axis=1)   # [6, 13, block]
    w = sm.chol_solve(Lm, dm, sm.mtm(Lt, RHS))
    X = RHS - dt2 * sm.mm(Pss, sm.mm(Lt, w))
    Yh = jax.lax.slice_in_dim(X, 0, 12, axis=1)        # M6^-1 Y
    zh = jnp.squeeze(jax.lax.slice_in_dim(X, 12, 13, axis=1), 1)

    # K = -dt R^-1 W' Yh = -dt [E1 Yh; E2 Yh]; kv = -(r~ + R^-1 W' zh)
    K = -dt * jnp.concatenate([sm.mm(E1, Yh), sm.mm(E2, Yh)], axis=0)
    kv = -jnp.concatenate([rt1 + sm.mv(E1, zh), rt2 + sm.mv(E2, zh)], axis=0)

    # H'K = dt Y'(W K) with W K = -dt T Yh; H'kv = dt Y'(W kv),
    # W kv = -(w_r + T zh)
    WK = -dt * sm.mm(T, Yh)
    HtK = dt * sm.mtm(Y, WK)
    Wkv = -(w_r + sm.mv(T, zh))
    Htkv = dt * sm.mtv(Y, Wkv)

    P_new = Qw_b + P + dt * (M + V) + dt2 * JxT(M) + HtK
    P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
    p_new = q + Pb_p + dt * JxTv(Pb_p) + Htkv
    return P_new, p_new, K, kv


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
                           bc_ref, Rw_ref, rw11_ref, rw22_ref, Qw_ref,
                           Qf_ref, xa_ref, u_ref,
                           xr_ref, dxc_ref, duc_ref, alpha_ref, dx0_ref,
                           dx_ref, du_ref, dphi_ref,
                           theta_ref, phi_ref, maxdef_ref, mincon_ref,
                           P_scr, p_scr, qN_scr, pack_scr, *park,
                           mu_b: float, theta_b: float, reg: float, N: int,
                           rank6: bool, factor: bool):
    # park = (Yh, yv, L, dinv) scratch when ``factor`` (the gain-free
    # parking: du is back-substituted lazily in the epilogue), else the
    # classic (K, kv) scratch
    if factor:
        Yh_scr, yv_scr, L_scr, dinv_scr = park
    else:
        K_scr, kv_scr = park
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
        if rank6:
            R1h = sm.add_diag(widen(rw11_ref[...]) + C11, reg)
            R2h = sm.add_diag(widen(rw22_ref[...]) + C22, reg)
            P_new, p_new, K, kv = _riccati_stage_rank6(
                dt, m_inv, D1, D2, SF, Sr, Sl, widen(Qw_ref[...]),
                R1h, R2h, reff, q, b, P_scr[...], p_scr[...])
        else:
            z66 = jnp.zeros((6, 6, block), dtype)
            Reff = widen(Rw_ref[...]) + jnp.concatenate([
                jnp.concatenate([C11, z66], axis=1),
                jnp.concatenate([z66, C22], axis=1)], axis=0)
            if factor:
                P_new, p_new, L, dinv, Yh, yv = _riccati_stage_structured(
                    dt, m_inv, D1, D2, SF, Sr, Sl, widen(Qw_ref[...]),
                    Reff, reff, q, b, P_scr[...], p_scr[...], reg,
                    with_acl=False, return_factor=True)
            else:
                P_new, p_new, _, K, _, kv = _riccati_stage_structured(
                    dt, m_inv, D1, D2, SF, Sr, Sl, widen(Qw_ref[...]),
                    Reff, reff, q, b, P_scr[...], p_scr[...], reg,
                    with_acl=False)
        P_scr[...] = P_new
        p_scr[...] = p_new
        if factor:
            Yh_scr[pl.ds(k, 1)] = Yh[None]
            yv_scr[pl.ds(k, 1)] = yv[None]
            L_scr[pl.ds(k, 1)] = L[None]
            dinv_scr[pl.ds(k, 1)] = dinv[None]
        else:
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
                if factor:
                    Yk = jnp.squeeze(Yh_scr[pl.ds(kk, 1)], 0)
                    yvk = jnp.squeeze(yv_scr[pl.ds(kk, 1)], 0)
                    Lk = jnp.squeeze(L_scr[pl.ds(kk, 1)], 0)
                    dk = jnp.squeeze(dinv_scr[pl.ds(kk, 1)], 0)
                    t = sm.mv(Yk, dx) + yvk
                    du = -jnp.squeeze(
                        sm.bwd_subst(Lk, dk, t[:, None, :]), 1)
                else:
                    Kk = jnp.squeeze(K_scr[pl.ds(kk, 1)], 0)
                    du = (sm.mv(Kk, dx)
                          + jnp.squeeze(kv_scr[pl.ds(kk, 1)], 0))
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
    rank6: bool = False, factor: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Fused SQP QP solve AT THE CANDIDATE (xa + alpha dxc, us + alpha duc)
    with the plane-phase linearization (module docstring). Same contract
    as ``sqp_pallas.sqp_qp_solve_onepass_cand``; the bootstrap call is
    this with alpha = 0 (then dxc/duc are ignored by value).

    ``rank6`` uses the rank-6 backward stage (_riccati_stage_rank6:
    6x6 factorizations instead of the 12x12 Cholesky); it requires R_w
    leg-block-diagonal — when R_w is concrete and has nonzero off-blocks
    the flag silently falls back to the 12x12 path. Default OFF: despite
    ~27 % fewer Riccati FLOPs it measured 4 % SLOWER on chip (6.26 vs
    6.00 ms/launch at B=16384) — four 6x6 Cholesky dependency chains
    (R1, R2, T, Ms) serialize deeper than one 12x12; the factorization
    is latency-bound, not FLOP-bound. Kept as a validated reference
    (tests/test_sqp_planes.py::test_rank6_matches_dense_stage).

    ``factor`` parks the backward stage's Cholesky factor (L, dinv) and
    forward-substituted half (Yh, yv) instead of the gains (K, kv), and
    the forward epilogue back-substitutes du = -L'^-1 (Yh dx + yv) per
    stage — this deletes the 13-rhs backward substitution from every
    backward stage (~13 % of its FMAs) for one 1-rhs substitution per
    epilogue stage, at +2 scratch buffers ([N,12,block] + [N,12,12,block]
    VMEM). Same linear algebra as the K-form to rounding.

    REQUIRES ``Ac`` leg-block-diagonal (checked when concrete, see
    sqp_pallas._split_leg_blocks)."""
    import numpy as np

    if factor and rank6:
        raise ValueError("factor=True is not implemented for the rank-6 "
                         "stage (rank6=True)")
    if factor and block > 128:
        # the two extra [N,12,12,block]/[N,12,block] parks exceed the
        # 16 MB VMEM limit at block 256 (measured: 16.46M, over by
        # 472K) — fail fast host-side instead of an opaque remote
        # Mosaic compile failure
        raise ValueError(
            f"factor=True requires block <= 128 (got {block}): the "
            "factor parks (L, dinv, Yh, yv) overflow VMEM at larger "
            "lane blocks")
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
    if rank6:
        if isinstance(R_w, jax.core.Tracer):
            # the block-diagonality check needs a concrete R_w; silently
            # proceeding would drop the off-diagonal R coupling and
            # produce wrong K/kv with no error (ADVICE r4)
            raise ValueError(
                "rank6=True requires a concrete (non-traced) R_w so the "
                "leg-block-diagonality check can run; pass R_w as a "
                "constant or use rank6=False")
        R_np = np.asarray(R_w)
        if (np.max(np.abs(R_np[0:6, 6:12])) > 0
                or np.max(np.abs(R_np[6:12, 0:6])) > 0):
            rank6 = False
    Rw11 = jax.lax.slice(R_w, (0, 0), (6, 6))
    Rw22 = jax.lax.slice(R_w, (6, 6), (12, 12))

    const = lambda *shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    lane_ = lambda i, g: (0, i)
    full3 = lambda d0, d1: pl.BlockSpec((d0, d1, block), lambda i, g: (0, 0, i))

    in_specs = [
        const(_NPARAM, 1), const(3, 3), const(2, 3),
        const(NX, 6), const(NX, 6),
        pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),
        const(NU, NU), const(6, 6), const(6, 6),
        const(NX, NX), const(NX, NX),
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
    if factor:
        park_scratch = [
            pltpu.VMEM((N, NX, NX, block), dtype),   # Yh = L^-1 H
            pltpu.VMEM((N, NX, block), dtype),       # yv
            pltpu.VMEM((N, NX, NX, block), dtype),   # L (Cholesky)
            pltpu.VMEM((N, NX, block), dtype),       # dinv
        ]
    else:
        park_scratch = [
            pltpu.VMEM((N, NU, NX, block), dtype),   # K, all stages
            pltpu.VMEM((N, NU, block), dtype),       # k
        ]
    outs = pl.pallas_call(
        functools.partial(_onepass_planes_kernel, mu_b=mu_b,
                          theta_b=theta_b, reg=reg, N=N, rank6=rank6,
                          factor=factor),
        grid=(Bt // block, N + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, NX, block), dtype),      # P carry
            pltpu.VMEM((NX, block), dtype),          # p carry
            pltpu.VMEM((NX, block), dtype),          # q_N
            pltpu.VMEM((N, _C, block), dtype),       # linearization pack
        ] + park_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac1.astype(dtype), Ac2.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Rw11.astype(dtype), Rw22.astype(dtype),
      Q_w.astype(dtype), Qf_w.astype(dtype),
      xa, us, xra, dxc, duc, alpha.reshape(1, Bt), dx0)
    dx_rest, du, dphi, theta, phi, maxdef, mincon = outs
    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    aux = (jnp.squeeze(theta, 0), jnp.squeeze(phi, 0),
           jnp.squeeze(maxdef, 0), jnp.squeeze(mincon, 0))
    return dx, du, jnp.squeeze(dphi, 0), aux
