"""Fully fused SQP-iteration Pallas kernels.

Round-2 profiling of the batched NMPC hot path (tools/roofline.py) showed
the Riccati kernel 66% HBM-bound: per SQP iteration the linearization
kernel writes the stage Jacobian/Hessian tensors A, B, R_eff
(3 x [N,12,12,B] ~ 140 MB at B=4096) to HBM, and the Riccati kernels read
them straight back. This module fuses the two stages so those tensors
NEVER exist in HBM:

- ``_bwd_kernel``: one grid step linearizes stage k = N-1-g (RK4 defect,
  Euler sensitivities, barrier-augmented cost — the whole
  prepareQpStructures stage math, /root/reference/NMPC_solver.cpp:276-314)
  and immediately consumes A/B/R_eff in the backward Riccati recursion
  (the math HPIPM runs inside d_ocp_qp_ipm_solve for the unconstrained
  QPs this path solves, reference call site ocp_qp_ipm_solver.cpp:334).
  Only what the forward pass needs leaves the kernel: the closed-loop
  transition Acl = A + B K, its offset bcl = b + B k, the gains (K, k),
  and the cost gradients (q, r_eff) for the directional derivative —
  plus the current-point merit (theta, phi, diagnostics), accumulated in
  VMEM scratch across stages like models/merit_pallas.py.
- ``_fwd_kernel``: rollout dx_{k+1} = Acl dx_k + bcl, gains
  du_k = K dx_k + k, and the line-search directional derivative
  dphi = sum_k dx_k.q_k + du_k.r_k + dx_N.q_N (checkConvergence,
  NMPC_solver.cpp:191-198) accumulated in VMEM — so the XLA dphi
  reduction pass disappears too.

HBM traffic per SQP iteration drops from ~500 MB to ~230 MB at B=4096
(Acl/K at 47 MB each written+read are the irreducible remainder: the
forward pass cannot start until the backward pass finishes, so one
[12,12] matrix pair per stage must round-trip HBM).

Both kernels follow the proven Mosaic-safe pattern from
ops/riccati_pallas.py: a SEQUENTIAL ('arbitrary') minor grid dimension
over stages with VMEM scratch carry, ops/smallmat rank-1 k-loop products,
and lane-only broadcasts of constants.
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

_NPARAM = 8  # mass, dt, mu, lfx, lfz, fmax, fmin, pad


def _params_from_refs(scal_ref, iinv_ref, foot_ref, dtype) -> SRBDParams:
    return SRBDParams(
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


def _rb(M: jnp.ndarray, i: int) -> jnp.ndarray:
    """Row-block i (rows 3i:3i+3) of a [12, ..., B] SoA array."""
    return jax.lax.slice_in_dim(M, 3 * i, 3 * i + 3, axis=0)


def _split_leg_blocks(Ac: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host-side split of the leg-block-diagonal constraint matrix
    Ac [24, 12] into its two nonzero [12, 6] diagonal blocks.

    The structured kernels rely on Ac being leg-block-diagonal (true for
    srbd.constraint_matrix, ref GetConstrain SRBD_model.cpp:237-260): the
    off-diagonal blocks Ac[0:12, 6:12] and Ac[12:24, 0:6] are DISCARDED.
    When Ac is a concrete array the zero structure is checked here;
    under a jit trace the requirement is the caller's contract.

    Done host-side for a Mosaic reason too: slicing a lane-broadcast
    (widened) constant inside a TPU kernel hits a compiler CHECK
    (array.h:480 limits[i] <= dim(i)) on this image — the round-3 crash.
    Slicing the 2-D constant before the pallas_call avoids it entirely
    (bisected in tools/bisect_mosaic.py, variants widen_reff vs
    widen_after_slice).
    """
    import numpy as np

    if isinstance(Ac, np.ndarray) or (
            isinstance(Ac, jax.Array) and not isinstance(
                Ac, jax.core.Tracer)):
        # convert FIRST, slice in numpy: a jax slice of a concrete
        # closure constant gets STAGED to a tracer inside an enclosing
        # jit/fori_loop trace, and np.asarray on that tracer raises
        Ac_np = np.asarray(Ac)
        off1 = np.max(np.abs(Ac_np[0:12, 6:12]))
        off2 = np.max(np.abs(Ac_np[12:24, 0:6]))
        if off1 > 0 or off2 > 0:
            raise ValueError(
                "structured SQP kernels require a leg-block-diagonal "
                f"constraint matrix; off-diagonal max |Ac| = "
                f"{max(off1, off2)}")
    Ac1 = jax.lax.slice(Ac, (0, 0), (12, 6))
    Ac2 = jax.lax.slice(Ac, (12, 6), (24, 12))
    return Ac1, Ac2


def _backward_stage_structured(params, Ac1_b, Ac2_b, bc_col, Rw_b, Qw_b,
                               x, xn, u, xr, P, p, reg: float,
                               mu_b: float, theta_b: float):
    """One linearize + backward-Riccati stage exploiting SRBD structure.

    The dense stage update burns ~2x its FLOPs on structural zeros: the
    SRBD Jacobian J_fx has only 4 nonzero 3x3 blocks (and one of them is
    I), J_fu only 2 nonzero row-blocks (one diagonal), and the
    constraint matrix is leg-block-diagonal (constraint_matrix,
    SRBD_model.cpp:237-260). With A = I + dt Jx, B = dt Ju and P
    symmetric (the kernel symmetrizes each stage):

        P A    = P + dt (P Jx)          with P Jx = (Jx'P)', P Ju =
        P B    = dt (P Ju)              (Ju'P)' via the Jx'/Ju' row
        B'P B  = dt^2 Ju'(P Ju)         recipes below (P symmetric) +
        B'P A  = dt Ju'(P A),           one leading-dim swapaxes each,
        A'P A  = P + dt (M + Jx'P) + dt^2 Jx'M,   M = P Jx = V', V = Jx'P.

    Returns everything the kernels need downstream:
    (P_new, p_new, Acl, K, bcl, kv, q, reff, b, con, b_bar, Ru).
    Validated against the dense two-pass kernel at f64
    (tests/test_sqp_pallas.py::test_sqp_qp_solve_onepass_matches_twopass).

    ``Ac1_b``/``Ac2_b`` are the two [12, 6, block] leg-diagonal blocks of
    the constraint matrix, pre-sliced HOST-side (see _split_leg_blocks —
    in-kernel slicing of widened constants crashes this image's Mosaic).
    """
    dtype = x.dtype
    block = x.shape[-1]
    dt = params.dt
    m_inv = 1.0 / params.mass

    # NOTE kept as jacobian_blocks + rk4 (separate so3 chains): the
    # shared-chain srbd_soa.linearize_stage variant measured 102.6k vs
    # 104.7k end-to-end on chip (more simultaneously-live chain values ->
    # scheduling/register pressure beats the ~1-chain FLOP saving).
    D1, D2, SF, Sr, Sl = srbd_soa.jacobian_blocks(params, x, u)
    b = srbd_soa.rk4(params, x, u) - xn

    # ---- constraints / barrier: leg-block-diagonal Ac -------------------
    Ac1 = Ac1_b                                        # [12, 6, block]
    Ac2 = Ac2_b
    u1 = jax.lax.slice_in_dim(u, 0, 6, axis=0)
    u2 = jax.lax.slice_in_dim(u, 6, 12, axis=0)
    con = jnp.concatenate([sm.mv(Ac1, u1), sm.mv(Ac2, u2)], axis=0) + bc_col
    b_bar, db, ddb = relaxed_log_barrier(con, mu_b, theta_b)
    db1 = jax.lax.slice_in_dim(db, 0, 12, axis=0)
    db2 = jax.lax.slice_in_dim(db, 12, 24, axis=0)
    ddb1 = jax.lax.slice_in_dim(ddb, 0, 12, axis=0)
    ddb2 = jax.lax.slice_in_dim(ddb, 12, 24, axis=0)
    C11 = sm.mtm(Ac1, Ac1 * ddb1[:, None])             # [6, 6, block]
    C22 = sm.mtm(Ac2, Ac2 * ddb2[:, None])
    z66 = jnp.zeros((6, 6, block), dtype)
    Reff = Rw_b + jnp.concatenate([
        jnp.concatenate([C11, z66], axis=1),
        jnp.concatenate([z66, C22], axis=1)], axis=0)
    Ru = sm.mv(Rw_b, u)
    reff = Ru + jnp.concatenate([sm.mtv(Ac1, db1), sm.mtv(Ac2, db2)], axis=0)
    q = sm.mv(Qw_b, x - xr)

    P_new, p_new, Acl, K, bcl, kv = _riccati_stage_structured(
        dt, m_inv, D1, D2, SF, Sr, Sl, Qw_b, Reff, reff, q, b, P, p, reg)
    return P_new, p_new, Acl, K, bcl, kv, q, reff, b, con, b_bar, Ru


def _riccati_stage_structured(dt, m_inv, D1, D2, SF, Sr, Sl, Qw_b, Reff,
                              reff, q, b, P, p, reg: float,
                              with_acl: bool = True,
                              return_factor: bool = False):
    """One structured backward-Riccati stage given the linearization
    blocks (see ``_backward_stage_structured``); also the stage body of
    the plane-phase kernels (ops/sqp_planes), which feed it blocks read
    from the VMEM linearization pack instead of computing them inline.

    Returns (P_new, p_new, Acl, K, bcl, kv); with ``with_acl=False``
    Acl/bcl are None (the caller rolls forward with A dx + B du + b from
    the structured blocks instead — same values to rounding, saves the
    A + BK assembly and the [N,12,12,block] Acl parking).

    Row-recipe form: Jx'/Ju' row recipes produce full-width [3,12,block]
    slabs (second-minor 12 -> 75 % sublane occupancy); the direct column
    assemblies of M = P Jx / W = P Ju produce [12,3,block] pieces that
    run ~5x slower on this chip (445 vs 2285 GFLOP/s,
    tools/probe_pack.py). Since the kernel keeps P exactly symmetric,
    M = (Jx'P)' and P Ju = (Ju'P)' — compute the row-recipe transposes
    V = Jx'P, U = Ju'P (V doubles as the Jx'P term of A'PA) and pay one
    cheap leading-dim swapaxes each (~9 % of an mm12, probe-measured),
    bitwise-identical sums to the column assemblies."""
    dtype = P.dtype
    block = P.shape[-1]

    def JuT(Mat):
        """Ju' @ Mat rows: [Sr' M1 + M3/m | M1 | Sl' M1 + M3/m | M1]."""
        M1, M3 = _rb(Mat, 1), _rb(Mat, 3)
        a = sm.mtm(Sr, M1) + m_inv * M3
        c = sm.mtm(Sl, M1) + m_inv * M3
        return jnp.concatenate([a, M1, c, M1], axis=0)

    def JuTv(v):
        v1, v3 = _rb(v, 1), _rb(v, 3)
        a = sm.mtv(Sr, v1) + m_inv * v3
        c = sm.mtv(Sl, v1) + m_inv * v3
        return jnp.concatenate([a, v1, c, v1], axis=0)

    # Jx' rows pick [D1'|D2'|SF'|I]
    def JxT(Mat):
        M0, M1, M2 = _rb(Mat, 0), _rb(Mat, 1), _rb(Mat, 2)
        return jnp.concatenate([sm.mtm(D1, M0), sm.mtm(D2, M0),
                                sm.mtm(SF, M1), M2], axis=0)

    def JxTv(v):
        v0, v1, v2 = _rb(v, 0), _rb(v, 1), _rb(v, 2)
        return jnp.concatenate([sm.mtv(D1, v0), sm.mtv(D2, v0),
                                sm.mtv(SF, v1), v2], axis=0)

    V = JxT(P)                                         # Jx' P
    U = JuT(P)                                         # Ju' P
    M = jnp.swapaxes(V, 0, 1)                          # P Jx  (P = P')
    PA = P + dt * M
    eye_reg = jnp.asarray(reg, dtype) * jnp.eye(NX, dtype=dtype)[:, :, None]
    # B'P B = dt^2 Ju'(P Ju) = dt^2 Ju'(Ju'P)'
    G = Reff + (dt * dt) * JuT(jnp.swapaxes(U, 0, 1)) + eye_reg
    H = dt * JuT(PA)                                   # B'P A
    L, dinv = sm.cholesky(G)
    Pb_p = sm.mv(P, b) + p
    # One 13-rhs solve for [K | kv], SPLIT at the substitution: the
    # forward half Y = L^-1 [H | rv] already yields the Schur downdates
    # H'G^-1 H = Y'Y and H'kv = -Y' y_v, so P_new/p_new — the ONLY
    # stage-to-stage carried dependency — never wait on the backward
    # substitution or on K itself; the backward half (K, kv) runs off the
    # critical path, consumed only by the VMEM parking and Acl assembly.
    # (Round-5 restructure: the previous form chained fwd+bwd substitution
    # on 12+1 rhs AND an mtm(H, K) before P_new could start.)
    rhs = jnp.concatenate([H, (dt * JuTv(Pb_p) + reff)[:, None, :]], axis=1)
    Y13 = sm.fwd_subst(L, dinv, rhs)                   # [12, 13, block]
    Yh = jax.lax.slice_in_dim(Y13, 0, 12, axis=1)      # L^-1 H
    yv = jnp.squeeze(jax.lax.slice_in_dim(Y13, 12, 13, axis=1), 1)

    # A'P A = P + dt (M + Jx'P) + dt^2 Jx'M ; H'K = -Y'Y (sm.gram:
    # symmetric product, 25 % fewer FMAs, bitwise-equal through the
    # symmetrization below)
    P_new = (Qw_b + P + dt * (M + V) + (dt * dt) * JxT(M)
             - sm.gram(Yh))
    P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
    p_new = q + Pb_p + dt * JxTv(Pb_p) - sm.mtv(Yh, yv)

    if return_factor:
        # factor-parking form (planes kernel, park_factor=True): the
        # caller parks (L, dinv, Yh, yv) and solves for du LAZILY in the
        # forward epilogue as du = -L'^-1 (Yh dx + yv) — one 1-rhs
        # backward substitution per stage instead of the 13-rhs
        # substitution here (~13 % of the stage's FMAs). Same linear
        # algebra as K dx + kv to rounding (the substitution is linear).
        return P_new, p_new, L, dinv, Yh, yv

    KV = -sm.bwd_subst(L, dinv, Y13)
    K = jax.lax.slice_in_dim(KV, 0, 12, axis=1)
    kv = jnp.squeeze(jax.lax.slice_in_dim(KV, 12, 13, axis=1), 1)

    if not with_acl:
        return P_new, p_new, None, K, None, kv

    # Acl = A + B K ; A assembled by concatenation only (I + dt Jx)
    z3 = jnp.zeros((3, 3, block), dtype)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, block))
    A = jnp.concatenate([
        jnp.concatenate([I3 + dt * D1, dt * D2, z3, z3], axis=1),
        jnp.concatenate([z3, I3, dt * SF, z3], axis=1),
        jnp.concatenate([z3, z3, I3, dt * I3], axis=1),
        jnp.concatenate([z3, z3, z3, I3], axis=1)], axis=0)
    Kr0, Kr1 = _rb(K, 0), _rb(K, 1)
    Kr2, Kr3 = _rb(K, 2), _rb(K, 3)
    zr = jnp.zeros((3, NX, block), dtype)
    BK = jnp.concatenate([
        zr, dt * (sm.mm(Sr, Kr0) + Kr1 + sm.mm(Sl, Kr2) + Kr3),
        zr, (dt * m_inv) * (Kr0 + Kr2)], axis=0)
    Acl = A + BK
    kv0, kv1 = _rb(kv, 0), _rb(kv, 1)
    kv2, kv3 = _rb(kv, 2), _rb(kv, 3)
    zv = jnp.zeros((3, block), dtype)
    Bkv = jnp.concatenate([
        zv, dt * (sm.mv(Sr, kv0) + kv1 + sm.mv(Sl, kv2) + kv3),
        zv, (dt * m_inv) * (kv0 + kv2)], axis=0)
    bcl = b + Bkv
    return P_new, p_new, Acl, K, bcl, kv


def _accumulate_merit(acc_scr, is_first, b, con, b_bar, u, Ru, x, xr, q,
                      phiN):
    """Stage-merit accumulation into the VMEM scratch ``acc_scr`` [4, block]
    (rows: theta, phi, max|defect|, min constraint), shared by all three
    SQP kernels. ``is_first`` seeds the accumulators (scratch holds garbage
    on the first sequential grid step). Returns (th, ph, md, mc) so the
    caller can flush them on the last backward step.

    The reference re-evaluates these merit quantities in linearSearch
    (NMPC_solver.cpp:152-189); here they are a byproduct of the stage
    sweep."""
    dtype = b.dtype
    acc = acc_scr[...]
    th_part = 0.5 * jnp.sum(b * b, axis=0)
    ph_part = (jnp.sum(b_bar, axis=0) + 0.5 * jnp.sum(u * Ru, axis=0)
               + 0.5 * jnp.sum((x - xr) * q, axis=0))
    zero = jnp.zeros((), dtype)
    th = jnp.where(is_first, zero, sm.row(acc, 0)) + th_part
    ph = jnp.where(is_first, phiN, sm.row(acc, 1)) + ph_part
    md = jnp.maximum(jnp.where(is_first, zero, sm.row(acc, 2)),
                     jnp.max(jnp.abs(b), axis=0))
    mc = jnp.minimum(
        jnp.where(is_first, jnp.asarray(1e30, dtype), sm.row(acc, 3)),
        jnp.min(con, axis=0))
    acc_scr[...] = jnp.stack([th, ph, md, mc])
    return th, ph, md, mc


def _forward_phase(g, N, dx0_ref, dx_ref, du_ref, dphi_ref,
                   Acl_scr, K_scr, bcl_scr, kv_scr, q_scr, reff_scr,
                   qN_scr, dxc_scr, dacc_scr):
    """Forward-rollout step k = g - N of the one-pass kernels (g >= N):
    closed-loop rollout, gains, and dphi accumulation from the
    VMEM-parked backward products. Shared by ``_onepass_kernel`` and
    ``_onepass_cand_kernel`` verbatim."""
    dtype = dxc_scr.dtype
    block = dxc_scr.shape[-1]
    k = g - N
    dx = jnp.where(g == N, dx0_ref[...], dxc_scr[...])
    prev = jnp.where(g == N, jnp.zeros((1, block), dtype), dacc_scr[...])
    K = jnp.squeeze(K_scr[pl.ds(k, 1)], 0)
    du = sm.mv(K, dx) + jnp.squeeze(kv_scr[pl.ds(k, 1)], 0)
    Acl = jnp.squeeze(Acl_scr[pl.ds(k, 1)], 0)
    dxn = sm.mv(Acl, dx) + jnp.squeeze(bcl_scr[pl.ds(k, 1)], 0)
    part = (jnp.sum(dx * jnp.squeeze(q_scr[pl.ds(k, 1)], 0), axis=0)
            + jnp.sum(du * jnp.squeeze(reff_scr[pl.ds(k, 1)], 0), axis=0))
    tot = prev + part[None]
    dacc_scr[...] = tot
    du_ref[...] = du[None]
    dx_ref[...] = dxn[None]
    dxc_scr[...] = dxn

    @pl.when(g == 2 * N - 1)
    def _():
        dphi_ref[...] = tot + jnp.sum(dxn * qN_scr[...], axis=0)[None]


def _forward_epilogue(N, dx0_ref, dx_ref, du_ref, dphi_ref,
                      Acl_scr, K_scr, bcl_scr, kv_scr, q_scr, reff_scr,
                      qN_scr):
    """Forward rollout as a Python-unrolled epilogue of the LAST backward
    grid step (g == N-1, which just stored the stage-0 products): removes
    N of the 2N sequential grid steps — the forward phase's per-stage
    compute (two [12,12] mat-vecs) is tiny next to the grid-step overhead
    it was paying. All stage indices here are STATIC Python ints, so the
    scratch reads are static slices (no dynamic-index Mosaic risk)."""
    dx = dx0_ref[...]
    tot = None
    for k in range(N):
        K = jnp.squeeze(K_scr[pl.ds(k, 1)], 0)
        du = sm.mv(K, dx) + jnp.squeeze(kv_scr[pl.ds(k, 1)], 0)
        Acl = jnp.squeeze(Acl_scr[pl.ds(k, 1)], 0)
        dxn = sm.mv(Acl, dx) + jnp.squeeze(bcl_scr[pl.ds(k, 1)], 0)
        part = (jnp.sum(dx * jnp.squeeze(q_scr[pl.ds(k, 1)], 0), axis=0)
                + jnp.sum(du * jnp.squeeze(reff_scr[pl.ds(k, 1)], 0), axis=0))
        tot = part if tot is None else tot + part
        du_ref[pl.ds(k, 1)] = du[None]
        dx_ref[pl.ds(k, 1)] = dxn[None]
        dx = dxn
    dphi_ref[...] = (tot + jnp.sum(dx * qN_scr[...], axis=0))[None]


def _bwd_kernel(scal_ref, iinv_ref, foot_ref, Ac_ref, bc_ref, Rw_ref, Qw_ref,
                Qf_ref, x_ref, xn_ref, u_ref, xr_ref, xrN_ref,
                Acl_ref, K_ref, bcl_ref, kv_ref, q_ref, reff_ref, qN_ref,
                theta_ref, phi_ref, maxdef_ref, mincon_ref,
                P_scr, p_scr, acc_scr,
                mu_b: float, theta_b: float, reg: float, N: int):
    """Linearize + one backward-Riccati stage at k = N-1-g per grid step."""
    g = pl.program_id(1)
    dtype = x_ref.dtype
    block = x_ref.shape[-1]

    def widen(c):
        # constants reach full lane width in ONE (lane-only) broadcast:
        # Mosaic can't broadcast a single operand in both sublanes and lanes
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    x = jnp.squeeze(x_ref[...], 0)     # [12, block] — stage-k state
    xn = jnp.squeeze(xn_ref[...], 0)   # stage k+1 state
    u = jnp.squeeze(u_ref[...], 0)
    xr = jnp.squeeze(xr_ref[...], 0)
    params = _params_from_refs(scal_ref, iinv_ref, foot_ref, dtype)

    # ---- linearization (prepareQpStructures stage math) ------------------
    A, B = srbd_soa.euler_AB(params, x, u)               # [12,12,block]
    b = srbd_soa.rk4(params, x, u) - xn                   # = -defect
    Ac_b = widen(Ac_ref[...])                             # [24,12,block]
    con = sm.mv(Ac_b, u) + bc_ref[...]                    # [24, block]
    b_bar, db, ddb = relaxed_log_barrier(con, mu_b, theta_b)
    Rw_b = widen(Rw_ref[...])
    Reff = Rw_b + sm.mtm(Ac_b, Ac_b * ddb[:, None])       # [12,12,block]
    Ru = sm.mv(Rw_b, u)
    reff = Ru + sm.mtv(Ac_b, db)
    Qw_b = widen(Qw_ref[...])
    q = sm.mv(Qw_b, x - xr)

    # terminal quantities (meaningful only at g == 0, where xn is x_N)
    eN = xn - jnp.squeeze(xrN_ref[...], 0)
    qN = sm.mv(widen(Qf_ref[...]), eN)

    @pl.when(g == 0)
    def _():
        P_scr[...] = widen(Qf_ref[...])
        p_scr[...] = qN
        qN_ref[...] = qN

    # ---- backward Riccati stage (S = 0 in the NMPC delta-QP) -------------
    P = P_scr[...]
    p = p_scr[...]
    eye_reg = jnp.asarray(reg, dtype) * jnp.eye(NX, dtype=dtype)[:, :, None]
    PA = sm.mm(P, A)
    PB = sm.mm(P, B)
    G = Reff + sm.mtm(B, PB) + eye_reg
    H = sm.mtm(B, PA)
    L, dinv = sm.cholesky(G)
    K = -sm.chol_solve(L, dinv, H)
    Pb_p = sm.mv(P, b) + p
    kv = -jnp.squeeze(
        sm.chol_solve(L, dinv, (sm.mtv(B, Pb_p) + reff)[:, None, :]), 1)
    P_new = Qw_b + sm.mtm(A, PA) + sm.mtm(H, K)
    P_scr[...] = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
    p_scr[...] = q + sm.mtv(A, Pb_p) + sm.mtv(H, kv)

    Acl_ref[...] = (A + sm.mm(B, K))[None]
    K_ref[...] = K[None]
    bcl_ref[...] = (b + sm.mv(B, kv))[None]
    kv_ref[...] = kv[None]
    q_ref[...] = q[None]
    reff_ref[...] = reff[None]

    # ---- current-point merit, accumulated across stages in VMEM ----------
    phiN = 0.5 * jnp.sum(eN * qN, axis=0)
    th, ph, md, mc = _accumulate_merit(
        acc_scr, g == 0, b, con, b_bar, u, Ru, x, xr, q, phiN)

    @pl.when(g == N - 1)
    def _():
        theta_ref[...] = th[None]
        phi_ref[...] = ph[None]
        maxdef_ref[...] = md[None]
        mincon_ref[...] = mc[None]


def _fwd_kernel(Acl_ref, K_ref, bcl_ref, kv_ref, q_ref, reff_ref, qN_ref,
                dx0_ref, dx_ref, du_ref, dphi_ref, x_scr, acc_scr, N: int):
    """Closed-loop rollout + gains + dphi accumulation; stage k = g."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        x_scr[...] = dx0_ref[...]
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    dx = x_scr[...]
    du = sm.mv(jnp.squeeze(K_ref[...], 0), dx) + jnp.squeeze(kv_ref[...], 0)
    dxn = (sm.mv(jnp.squeeze(Acl_ref[...], 0), dx)
           + jnp.squeeze(bcl_ref[...], 0))
    part = (jnp.sum(dx * jnp.squeeze(q_ref[...], 0), axis=0)
            + jnp.sum(du * jnp.squeeze(reff_ref[...], 0), axis=0))
    tot = acc_scr[...] + part[None]
    acc_scr[...] = tot
    du_ref[...] = du[None]
    dx_ref[...] = dxn[None]
    x_scr[...] = dxn

    @pl.when(g == N - 1)
    def _():
        dphi_ref[...] = tot + jnp.sum(dxn * qN_ref[...], axis=0)[None]


def _onepass_kernel(scal_ref, iinv_ref, foot_ref, ac1_ref, ac2_ref, bc_ref,
                    Rw_ref, Qw_ref, Qf_ref, x_ref, xn_ref, u_ref, xr_ref,
                    xrN_ref, dx0_ref,
                    dx_ref, du_ref, dphi_ref,
                    theta_ref, phi_ref, maxdef_ref, mincon_ref,
                    P_scr, p_scr, acc_scr, Acl_scr, K_scr, bcl_scr, kv_scr,
                    q_scr, reff_scr, qN_scr, dxc_scr, dacc_scr,
                    mu_b: float, theta_b: float, reg: float, N: int,
                    fold: bool):
    """Backward (g < N) AND forward (g >= N) phases in ONE kernel over a
    2N-step sequential grid: the per-stage Riccati products (Acl, K, bcl,
    k, q, r_eff) are parked in VMEM scratch by the backward phase and read
    back by the forward phase, so they NEVER touch HBM (~440 MB/iteration
    at B=16384 with the two-kernel split). Feasible because the whole
    stage inventory fits VMEM: (2*144 + 4*12) * N * block * 4 B ≈ 6.9 MB
    at N=20, block=256 (tools/probe_dynscratch.py validates the
    dynamic-stage scratch indexing + modular index maps this needs)."""
    g = pl.program_id(1)
    dtype = x_ref.dtype
    block = x_ref.shape[-1]

    def widen(c):
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    @pl.when(g < N)
    def _backward():
        x = jnp.squeeze(x_ref[...], 0)
        xn = jnp.squeeze(xn_ref[...], 0)
        u = jnp.squeeze(u_ref[...], 0)
        xr = jnp.squeeze(xr_ref[...], 0)
        params = _params_from_refs(scal_ref, iinv_ref, foot_ref, dtype)

        Qw_b = widen(Qw_ref[...])
        eN = xn - jnp.squeeze(xrN_ref[...], 0)
        qN = sm.mv(widen(Qf_ref[...]), eN)

        @pl.when(g == 0)
        def _():
            P_scr[...] = widen(Qf_ref[...])
            p_scr[...] = qN
            qN_scr[...] = qN

        (P_new, p_new, Acl, K, bcl, kv, q, reff, b, con, b_bar, Ru) = \
            _backward_stage_structured(
                params, widen(ac1_ref[...]), widen(ac2_ref[...]),
                bc_ref[...], widen(Rw_ref[...]),
                Qw_b, x, xn, u, xr, P_scr[...], p_scr[...],
                reg, mu_b, theta_b)
        P_scr[...] = P_new
        p_scr[...] = p_new

        k = N - 1 - g
        Acl_scr[pl.ds(k, 1)] = Acl[None]
        K_scr[pl.ds(k, 1)] = K[None]
        bcl_scr[pl.ds(k, 1)] = bcl[None]
        kv_scr[pl.ds(k, 1)] = kv[None]
        q_scr[pl.ds(k, 1)] = q[None]
        reff_scr[pl.ds(k, 1)] = reff[None]

        phiN = 0.5 * jnp.sum(eN * qN, axis=0)
        th, ph, md, mc = _accumulate_merit(
            acc_scr, g == 0, b, con, b_bar, u, Ru, x, xr, q, phiN)

        @pl.when(g == N - 1)
        def _():
            theta_ref[...] = th[None]
            phi_ref[...] = ph[None]
            maxdef_ref[...] = md[None]
            mincon_ref[...] = mc[None]
            if fold:
                _forward_epilogue(N, dx0_ref, dx_ref, du_ref, dphi_ref,
                                  Acl_scr, K_scr, bcl_scr, kv_scr, q_scr,
                                  reff_scr, qN_scr)

    if not fold:
        @pl.when(g >= N)
        def _forward():
            _forward_phase(g, N, dx0_ref, dx_ref, du_ref, dphi_ref,
                           Acl_scr, K_scr, bcl_scr, kv_scr, q_scr, reff_scr,
                           qN_scr, dxc_scr, dacc_scr)


def _onepass_cand_kernel(scal_ref, iinv_ref, foot_ref, ac1_ref, ac2_ref,
                         bc_ref, Rw_ref,
                         Qw_ref, Qf_ref, x_ref, xn_ref, u_ref, xr_ref,
                         xrN_ref, dxc_in_ref, dxcn_in_ref, duc_in_ref,
                         alpha_ref, dx0_ref,
                         dx_ref, du_ref, dphi_ref,
                         theta_ref, phi_ref, maxdef_ref, mincon_ref,
                         P_scr, p_scr, acc_scr, Acl_scr, K_scr, bcl_scr,
                         kv_scr, q_scr, reff_scr, qN_scr, dxc_scr, dacc_scr,
                         mu_b: float, theta_b: float, reg: float, N: int,
                         fold: bool):
    """``_onepass_kernel`` evaluated at the LINE-SEARCH CANDIDATE
    (x + alpha dxc, u + alpha duc) with a per-scenario alpha, the
    candidate folded into the stage loads so the trial trajectory never
    materializes in HBM (same trick as merit_pallas._kernel_alpha).

    This powers the speculative-acceptance SQP loop: the kernel's merit
    outputs (theta, phi at the candidate) decide the filter acceptance,
    and on acceptance its QP outputs ARE the next iteration's step — one
    launch does line-search trial AND next linearize+Riccati. Deliberate
    near-duplicate of ``_onepass_kernel`` (a shared parameterized body
    would obscure the Mosaic-sensitive structure both kernels rely on)."""
    g = pl.program_id(1)
    dtype = x_ref.dtype
    block = x_ref.shape[-1]

    def widen(c):
        return jnp.broadcast_to(c[..., None], c.shape + (block,))

    @pl.when(g < N)
    def _backward():
        a = alpha_ref[...]                                  # [1, block]
        x = jnp.squeeze(x_ref[...], 0) + a * jnp.squeeze(dxc_in_ref[...], 0)
        xn = jnp.squeeze(xn_ref[...], 0) + a * jnp.squeeze(dxcn_in_ref[...], 0)
        u = jnp.squeeze(u_ref[...], 0) + a * jnp.squeeze(duc_in_ref[...], 0)
        xr = jnp.squeeze(xr_ref[...], 0)
        params = _params_from_refs(scal_ref, iinv_ref, foot_ref, dtype)

        Qw_b = widen(Qw_ref[...])
        eN = xn - jnp.squeeze(xrN_ref[...], 0)
        qN = sm.mv(widen(Qf_ref[...]), eN)

        @pl.when(g == 0)
        def _():
            P_scr[...] = widen(Qf_ref[...])
            p_scr[...] = qN
            qN_scr[...] = qN

        (P_new, p_new, Acl, K, bcl, kv, q, reff, b, con, b_bar, Ru) = \
            _backward_stage_structured(
                params, widen(ac1_ref[...]), widen(ac2_ref[...]),
                bc_ref[...], widen(Rw_ref[...]),
                Qw_b, x, xn, u, xr, P_scr[...], p_scr[...],
                reg, mu_b, theta_b)
        P_scr[...] = P_new
        p_scr[...] = p_new

        k = N - 1 - g
        Acl_scr[pl.ds(k, 1)] = Acl[None]
        K_scr[pl.ds(k, 1)] = K[None]
        bcl_scr[pl.ds(k, 1)] = bcl[None]
        kv_scr[pl.ds(k, 1)] = kv[None]
        q_scr[pl.ds(k, 1)] = q[None]
        reff_scr[pl.ds(k, 1)] = reff[None]

        phiN = 0.5 * jnp.sum(eN * qN, axis=0)
        th, ph, md, mc = _accumulate_merit(
            acc_scr, g == 0, b, con, b_bar, u, Ru, x, xr, q, phiN)

        @pl.when(g == N - 1)
        def _():
            theta_ref[...] = th[None]
            phi_ref[...] = ph[None]
            maxdef_ref[...] = md[None]
            mincon_ref[...] = mc[None]
            if fold:
                _forward_epilogue(N, dx0_ref, dx_ref, du_ref, dphi_ref,
                                  Acl_scr, K_scr, bcl_scr, kv_scr, q_scr,
                                  reff_scr, qN_scr)

    if not fold:
        @pl.when(g >= N)
        def _forward():
            _forward_phase(g, N, dx0_ref, dx_ref, du_ref, dphi_ref,
                           Acl_scr, K_scr, bcl_scr, kv_scr, q_scr, reff_scr,
                           qN_scr, dxc_scr, dacc_scr)


def sqp_qp_solve_onepass_cand(
    params: SRBDParams, Q_w: jnp.ndarray, Qf_w: jnp.ndarray, R_w: jnp.ndarray,
    Ac: jnp.ndarray, bc: jnp.ndarray,
    xa: jnp.ndarray, us: jnp.ndarray, xra: jnp.ndarray,
    dxc: jnp.ndarray, duc: jnp.ndarray, alpha: jnp.ndarray,
    x0s: jnp.ndarray,
    mu_b: float, theta_b: float, reg: float = 0.0, block: int = 256,
    fold: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Fused SQP QP solve AT THE CANDIDATE (xa + alpha dxc, us + alpha duc).

    Same contract as ``sqp_qp_solve_onepass`` but evaluated at the trial
    point, with ``alpha`` per scenario [Bt] and ``x0s`` the raw initial
    states [12, Bt] (the kernel's dx0 is x0s - candidate x_0, formed
    here). Returns (dx, du, dphi, (theta, phi, max|defect|, min_con)) —
    merit AND next-step QP solution at the candidate in one launch.

    REQUIRES ``Ac`` leg-block-diagonal (off-blocks Ac[0:12, 6:12] and
    Ac[12:24, 0:6] zero — true for srbd.constraint_matrix); the
    structured stage body ignores the off-blocks (checked when Ac is
    concrete, see _split_leg_blocks)."""
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
    bN_ = lambda i, g: (N, 0, i)
    lane_ = lambda i, g: (0, i)
    if fold:
        # grid minor is N backward steps; forward runs as the unrolled
        # epilogue of g = N-1 writing whole-[N] output blocks
        rv_ = lambda i, g: (N - 1 - g, 0, i)         # stage k = N-1-g
        rv1_ = lambda i, g: (N - g, 0, i)            # stage k+1
        dx_spec = pl.BlockSpec((N, NX, block), lambda i, g: (0, 0, i))
        du_spec = pl.BlockSpec((N, NU, block), lambda i, g: (0, 0, i))
        n_minor = N
    else:
        rv_ = lambda i, g: ((N - 1 - g) % N, 0, i)   # stage k = N-1-g (bwd)
        rv1_ = lambda i, g: ((N - g) % (N + 1), 0, i)  # stage k+1 (bwd)
        fv_ = lambda i, g: ((g - N) % N, 0, i)       # stage k = g-N (fwd)
        dx_spec = pl.BlockSpec((1, NX, block), fv_)
        du_spec = pl.BlockSpec((1, NU, block), fv_)
        n_minor = 2 * N

    in_specs = [
        const(_NPARAM, 1), const(3, 3), const(2, 3),
        const(NX, 6), const(NX, 6),            # Ac leg-diagonal blocks
        pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),
        const(NU, NU), const(NX, NX), const(NX, NX),
        pl.BlockSpec((1, NX, block), rv_),     # x_k
        pl.BlockSpec((1, NX, block), rv1_),    # x_{k+1}
        pl.BlockSpec((1, NU, block), rv_),     # u_k
        pl.BlockSpec((1, NX, block), rv_),     # xr_k
        pl.BlockSpec((1, NX, block), bN_),     # xr_N
        pl.BlockSpec((1, NX, block), rv_),     # dxc_k
        pl.BlockSpec((1, NX, block), rv1_),    # dxc_{k+1}
        pl.BlockSpec((1, NU, block), rv_),     # duc_k
        pl.BlockSpec((1, block), lane_),       # alpha
        pl.BlockSpec((NX, block), lane_),      # dx0
    ]
    out_specs = [
        dx_spec,                               # dx_{k+1}
        du_spec,                               # du_k
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
        functools.partial(_onepass_cand_kernel, mu_b=mu_b, theta_b=theta_b,
                          reg=reg, N=N, fold=fold),
        grid=(Bt // block, n_minor),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, NX, block), dtype),      # P carry
            pltpu.VMEM((NX, block), dtype),          # p carry
            pltpu.VMEM((4, block), dtype),           # merit accumulators
            pltpu.VMEM((N, NX, NX, block), dtype),   # Acl, all stages
            pltpu.VMEM((N, NU, NX, block), dtype),   # K, all stages
            pltpu.VMEM((N, NX, block), dtype),       # bcl
            pltpu.VMEM((N, NU, block), dtype),       # k
            pltpu.VMEM((N, NX, block), dtype),       # q
            pltpu.VMEM((N, NU, block), dtype),       # r_eff
            pltpu.VMEM((NX, block), dtype),          # q_N
            pltpu.VMEM((NX, block), dtype),          # dx carry
            pltpu.VMEM((1, block), dtype),           # dphi accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac1.astype(dtype), Ac2.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Q_w.astype(dtype), Qf_w.astype(dtype),
      xa, xa, us, xra, xra, dxc, dxc, duc, alpha.reshape(1, Bt), dx0)
    dx_rest, du, dphi, theta, phi, maxdef, mincon = outs
    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    aux = (jnp.squeeze(theta, 0), jnp.squeeze(phi, 0),
           jnp.squeeze(maxdef, 0), jnp.squeeze(mincon, 0))
    return dx, du, jnp.squeeze(dphi, 0), aux


def sqp_qp_solve_onepass(
    params: SRBDParams, Q_w: jnp.ndarray, Qf_w: jnp.ndarray, R_w: jnp.ndarray,
    Ac: jnp.ndarray, bc: jnp.ndarray,
    xa: jnp.ndarray, us: jnp.ndarray, xra: jnp.ndarray, dx0: jnp.ndarray,
    mu_b: float, theta_b: float, reg: float = 0.0, block: int = 256,
    fold: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Single-kernel fused SQP QP solve (see ``_onepass_kernel``): same
    contract as ``sqp_qp_solve`` but the intermediate stage tensors stay
    VMEM-resident — HBM traffic is just the trajectory in and (dx, du)
    out. Stage-input index maps are clamped with modular arithmetic in
    the forward phase (the fetched blocks are unused there); (dx, du)
    output blocks flushed during the backward phase hold garbage that the
    in-order forward revisits overwrite (validated by
    tools/probe_dynscratch.py and the interpret/TPU parity tests).

    REQUIRES ``Ac`` leg-block-diagonal (off-blocks Ac[0:12, 6:12] and
    Ac[12:24, 0:6] zero — true for srbd.constraint_matrix); the
    structured stage body ignores the off-blocks (checked when Ac is
    concrete, see _split_leg_blocks)."""
    N = us.shape[0]
    Bt = xa.shape[-1]
    assert Bt % block == 0, (Bt, block)
    dtype = xa.dtype

    scal = jnp.stack([
        params.mass, params.dt, params.mu, params.lfx, params.lfz,
        params.fmax, params.fmin, jnp.asarray(0.0, dtype),
    ]).reshape(_NPARAM, 1)
    Ac1, Ac2 = _split_leg_blocks(Ac)

    const = lambda *shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    bN_ = lambda i, g: (N, 0, i)
    lane_ = lambda i, g: (0, i)
    if fold:
        rv_ = lambda i, g: (N - 1 - g, 0, i)         # stage k = N-1-g
        rv1_ = lambda i, g: (N - g, 0, i)            # stage k+1
        dx_spec = pl.BlockSpec((N, NX, block), lambda i, g: (0, 0, i))
        du_spec = pl.BlockSpec((N, NU, block), lambda i, g: (0, 0, i))
        n_minor = N
    else:
        rv_ = lambda i, g: ((N - 1 - g) % N, 0, i)   # stage k = N-1-g (bwd)
        rv1_ = lambda i, g: ((N - g) % (N + 1), 0, i)  # stage k+1 (bwd)
        fv_ = lambda i, g: ((g - N) % N, 0, i)       # stage k = g-N (fwd)
        dx_spec = pl.BlockSpec((1, NX, block), fv_)
        du_spec = pl.BlockSpec((1, NU, block), fv_)
        n_minor = 2 * N

    in_specs = [
        const(_NPARAM, 1), const(3, 3), const(2, 3),
        const(NX, 6), const(NX, 6),            # Ac leg-diagonal blocks
        pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),
        const(NU, NU), const(NX, NX), const(NX, NX),
        pl.BlockSpec((1, NX, block), rv_),     # x_k
        pl.BlockSpec((1, NX, block), rv1_),    # x_{k+1}
        pl.BlockSpec((1, NU, block), rv_),     # u_k
        pl.BlockSpec((1, NX, block), rv_),     # xr_k
        pl.BlockSpec((1, NX, block), bN_),     # xr_N
        pl.BlockSpec((NX, block), lane_),      # dx0
    ]
    out_specs = [
        dx_spec,                               # dx_{k+1}
        du_spec,                               # du_k
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
        functools.partial(_onepass_kernel, mu_b=mu_b, theta_b=theta_b,
                          reg=reg, N=N, fold=fold),
        grid=(Bt // block, n_minor),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, NX, block), dtype),      # P carry
            pltpu.VMEM((NX, block), dtype),          # p carry
            pltpu.VMEM((4, block), dtype),           # merit accumulators
            pltpu.VMEM((N, NX, NX, block), dtype),   # Acl, all stages
            pltpu.VMEM((N, NU, NX, block), dtype),   # K, all stages
            pltpu.VMEM((N, NX, block), dtype),       # bcl
            pltpu.VMEM((N, NU, block), dtype),       # k
            pltpu.VMEM((N, NX, block), dtype),       # q
            pltpu.VMEM((N, NU, block), dtype),       # r_eff
            pltpu.VMEM((NX, block), dtype),          # q_N
            pltpu.VMEM((NX, block), dtype),          # dx carry
            pltpu.VMEM((1, block), dtype),           # dphi accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac1.astype(dtype), Ac2.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Q_w.astype(dtype), Qf_w.astype(dtype),
      xa, xa, us, xra, xra, dx0)
    dx_rest, du, dphi, theta, phi, maxdef, mincon = outs
    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    aux = (jnp.squeeze(theta, 0), jnp.squeeze(phi, 0),
           jnp.squeeze(maxdef, 0), jnp.squeeze(mincon, 0))
    return dx, du, jnp.squeeze(dphi, 0), aux


def sqp_qp_solve(
    params: SRBDParams, Q_w: jnp.ndarray, Qf_w: jnp.ndarray, R_w: jnp.ndarray,
    Ac: jnp.ndarray, bc: jnp.ndarray,
    xa: jnp.ndarray, us: jnp.ndarray, xra: jnp.ndarray, dx0: jnp.ndarray,
    mu_b: float, theta_b: float, reg: float = 0.0, block: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """One fused SQP QP solve: linearize around (xa, us) and solve the
    delta-form LQR in two Pallas passes.

    Stage-major SoA inputs: xa [N+1,12,Bt] (trajectory), us [N,12,Bt],
    xra [N+1,12,Bt] (reference), dx0 [12,Bt] (x0 - xa[0]). Returns
    (dx [N+1,12,Bt], du [N,12,Bt], dphi [Bt],
    aux = (theta, phi, max|defect|, min_con) at the current iterate, [Bt]).
    """
    N = us.shape[0]
    Bt = xa.shape[-1]
    assert Bt % block == 0, (Bt, block)
    dtype = xa.dtype

    scal = jnp.stack([
        params.mass, params.dt, params.mu, params.lfx, params.lfz,
        params.fmax, params.fmin, jnp.asarray(0.0, dtype),
    ]).reshape(_NPARAM, 1)

    const = lambda *shape: pl.BlockSpec(shape, lambda i, g: (0,) * len(shape))
    rv_ = lambda i, g: (N - 1 - g, 0, i)      # stage k = N-1-g, vectors
    rv1_ = lambda i, g: (N - g, 0, i)         # stage k+1
    rm_ = lambda i, g: (N - 1 - g, 0, 0, i)   # stage k, matrices
    bN_ = lambda i, g: (N, 0, i)              # terminal stage
    lane_ = lambda i, g: (0, i)               # per-scenario blocks

    in_specs = [
        const(_NPARAM, 1), const(3, 3), const(2, 3),
        const(NG, NU), pl.BlockSpec((NG, 1), lambda i, g: (0, 0)),
        const(NU, NU), const(NX, NX), const(NX, NX),
        pl.BlockSpec((1, NX, block), rv_),     # x_k
        pl.BlockSpec((1, NX, block), rv1_),    # x_{k+1}
        pl.BlockSpec((1, NU, block), rv_),     # u_k
        pl.BlockSpec((1, NX, block), rv_),     # xr_k
        pl.BlockSpec((1, NX, block), bN_),     # xr_N
    ]
    out_specs = [
        pl.BlockSpec((1, NX, NX, block), rm_),   # Acl = A + B K
        pl.BlockSpec((1, NU, NX, block), rm_),   # K
        pl.BlockSpec((1, NX, block), rv_),       # bcl = b + B k
        pl.BlockSpec((1, NU, block), rv_),       # k
        pl.BlockSpec((1, NX, block), rv_),       # q (running stages)
        pl.BlockSpec((1, NU, block), rv_),       # r_eff
        pl.BlockSpec((NX, block), lane_),        # q_N
        pl.BlockSpec((1, block), lane_),         # theta
        pl.BlockSpec((1, block), lane_),         # phi
        pl.BlockSpec((1, block), lane_),         # max |defect|
        pl.BlockSpec((1, block), lane_),         # min constraint
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, NX, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, NU, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, NU, Bt), dtype),
        jax.ShapeDtypeStruct((N, NX, Bt), dtype),
        jax.ShapeDtypeStruct((N, NU, Bt), dtype),
        jax.ShapeDtypeStruct((NX, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
        jax.ShapeDtypeStruct((1, Bt), dtype),
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, mu_b=mu_b, theta_b=theta_b,
                          reg=reg, N=N),
        grid=(Bt // block, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX, NX, block), dtype),   # P carry
            pltpu.VMEM((NX, block), dtype),       # p carry
            pltpu.VMEM((4, block), dtype),        # merit accumulators
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(scal, params.inertia_inv.astype(dtype), params.foot_pos.astype(dtype),
      Ac.astype(dtype), bc.astype(dtype).reshape(NG, 1),
      R_w.astype(dtype), Q_w.astype(dtype), Qf_w.astype(dtype),
      xa, xa, us, xra, xra)
    Acl, K, bcl, kv, q, reff, qN, theta, phi, maxdef, mincon = outs

    fm_ = lambda i, g: (g, 0, 0, i)
    fv_ = lambda i, g: (g, 0, i)
    dx_rest, du, dphi = pl.pallas_call(
        functools.partial(_fwd_kernel, N=N),
        grid=(Bt // block, N),
        in_specs=[
            pl.BlockSpec((1, NX, NX, block), fm_),   # Acl
            pl.BlockSpec((1, NU, NX, block), fm_),   # K
            pl.BlockSpec((1, NX, block), fv_),       # bcl
            pl.BlockSpec((1, NU, block), fv_),       # k
            pl.BlockSpec((1, NX, block), fv_),       # q
            pl.BlockSpec((1, NU, block), fv_),       # r_eff
            pl.BlockSpec((NX, block), lane_),        # q_N
            pl.BlockSpec((NX, block), lane_),        # dx0
        ],
        out_specs=[
            pl.BlockSpec((1, NX, block), fv_),
            pl.BlockSpec((1, NU, block), fv_),
            pl.BlockSpec((1, block), lane_),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, NX, Bt), dtype),
            jax.ShapeDtypeStruct((N, NU, Bt), dtype),
            jax.ShapeDtypeStruct((1, Bt), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX, block), dtype),   # dx carry
            pltpu.VMEM((1, block), dtype),    # dphi accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(Acl, K, bcl, kv, q, reff, qN, dx0)

    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    aux = (jnp.squeeze(theta, 0), jnp.squeeze(phi, 0),
           jnp.squeeze(maxdef, 0), jnp.squeeze(mincon, 0))
    return dx, du, jnp.squeeze(dphi, 0), aux
