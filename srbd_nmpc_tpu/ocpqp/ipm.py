"""Structure-exploiting primal-dual interior-point solver for OCP-QPs.

TPU-native replacement for the used functionality of HPIPM's
``d_ocp_qp_ipm_solve`` (reached by the reference at
/root/reference/hpipm-cpp/src/ocp_qp_ipm_solver.cpp:334): a Mehrotra
predictor-corrector IPM over box (x, u) and general (C x + D u) constraints
with HPIPM-style one-sided masks, each Newton system solved by ONE Riccati
factorization reused for predictor and corrector rhs.

Algorithm (per iteration, standard Mehrotra with slacks s and duals lam
for lower/upper bounds; all constraint rows stacked per stage):
  1. W = lam_l/s_l + lam_u/s_u  ->  stage Hessian augmentation
     (Q,S,R) += G' W G, the slack elimination of the Newton KKT system;
  2. predictor (sigma = 0) -> affine step, alpha_aff, mu_aff;
  3. sigma = (mu_aff/mu)^3; corrector rhs adds Ds_aff*Dlam_aff - sigma*mu;
  4. fraction-to-boundary step sizes (0.995); ``split_step`` selects
     independent primal/dual steps vs a common one (the settings surface of
     ocp_qp_ipm_solver_settings.hpp:10-92);
  5. iterates updated; residuals/statistics recorded
     (ocp_qp_ipm_solver_statistics.hpp:15-58).

Design notes (vs HPIPM):
- primal iterates (x, u) stay exactly dynamics-feasible: initialization
  rolls out from x0 and every Newton step satisfies the homogeneous
  dynamics, so res_eq is ~machine-eps by construction (HPIPM is
  infeasible-start in the equality constraints as well);
- the whole solve is a fixed-shape `lax.while_loop`, `vmap`-able over
  scenario batches: per-scenario convergence masking comes free from
  JAX's vmap-of-while lowering;
- the initial state is an argument (x0), not an eliminated stage — no
  nx[0]=0 shuffling (cf. ocp_qp_ipm_solver.cpp:127-139) and no stage-0
  Riccati reconstruction (:347-373): the recursion emits stage 0 directly.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from srbd_nmpc_tpu.ocpqp.data import OcpQp, OcpQpDims
from srbd_nmpc_tpu.ocpqp.settings import IpmMode, IpmSettings, IpmStatus
from srbd_nmpc_tpu.ocpqp.solution import OcpQpSolution
from srbd_nmpc_tpu.ocpqp.statistics import IpmStatistics
from srbd_nmpc_tpu.ops.riccati import (
    RiccatiFactors,
    kkt_residuals,
    lqr_solve,
    riccati_factorize,
    riccati_factorize_sqrt_con,
    riccati_solve_vectors,
)

_FRAC_TO_BOUND = 0.995  # fraction-to-boundary factor (HPIPM default)


class _ConstraintSystem(NamedTuple):
    """Stacked per-stage constraint geometry: rows = [box-x, box-u, general].

    Gx [N+1, m, nx], Gu [N+1, m, nu]; bounds/masks [N+1, m]. Masked-out or
    structurally absent rows have mask 0 and are inert (slack pinned to 1,
    dual to 0).
    """

    Gx: jnp.ndarray
    Gu: jnp.ndarray
    lb: jnp.ndarray
    ub: jnp.ndarray
    mask_l: jnp.ndarray
    mask_u: jnp.ndarray
    # Soft-constraint row data, scattered from OcpQp.idxs over the stacked
    # rows (zeros on hard rows): soft_{l,u} in {0,1}; Z/z penalty
    # coefficients; ls slack lower bounds (ocp_qp.hpp:144-176).
    soft_l: jnp.ndarray
    soft_u: jnp.ndarray
    Zl: jnp.ndarray
    Zu: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray
    lls: jnp.ndarray
    lus: jnp.ndarray


def _build_constraints(qp: OcpQp, dims: OcpQpDims, x0: jnp.ndarray) -> _ConstraintSystem:
    """Assemble the stacked constraint system.

    Structural masking mirrors HPIPM's dimension rules: stage-0 x-box rows
    are disabled (x0 is data, ocp_qp_ipm_solver.cpp:127-130), stage-N u
    rows are absent, stage-0 general rows act on u only with the C0 x0
    offset folded into the bounds (the initial-state embedding,
    ocp_qp_ipm_solver.cpp:225-249).
    """
    N, nx, nu = dims.N, dims.nx, dims.nu
    nbx, nbu, ng = dims.nbx, dims.nbu, dims.ng
    m = nbx + nbu + ng
    dtype = qp.A.dtype

    Gx = jnp.zeros((N + 1, m, nx), dtype)
    Gu = jnp.zeros((N + 1, m, nu), dtype)
    lb = jnp.zeros((N + 1, m), dtype)
    ub = jnp.zeros((N + 1, m), dtype)
    mask_l = jnp.zeros((N + 1, m), dtype)
    mask_u = jnp.zeros((N + 1, m), dtype)

    stage_idx = jnp.arange(N + 1)

    if nbx:
        Ex = jnp.zeros((nbx, nx), dtype)
        Ex = Ex.at[jnp.arange(nbx), jnp.asarray(qp.idxbx)].set(1.0)
        avail = (stage_idx >= 1).astype(dtype)[:, None]  # no stage-0 x box
        Gx = Gx.at[:, 0:nbx, :].set(Ex[None] * avail[..., None])
        lb = lb.at[:, 0:nbx].set(qp.lbx)
        ub = ub.at[:, 0:nbx].set(qp.ubx)
        ml = qp.lbx_mask if qp.lbx_mask is not None else jnp.ones_like(qp.lbx)
        mu_ = qp.ubx_mask if qp.ubx_mask is not None else jnp.ones_like(qp.ubx)
        mask_l = mask_l.at[:, 0:nbx].set(ml * avail)
        mask_u = mask_u.at[:, 0:nbx].set(mu_ * avail)

    if nbu:
        Eu = jnp.zeros((nbu, nu), dtype)
        Eu = Eu.at[jnp.arange(nbu), jnp.asarray(qp.idxbu)].set(1.0)
        avail = (stage_idx < N).astype(dtype)[:, None]  # no terminal u
        o = nbx
        Gu = Gu.at[:, o:o + nbu, :].set(Eu[None] * avail[..., None])
        lb = lb.at[:N, o:o + nbu].set(qp.lbu)
        ub = ub.at[:N, o:o + nbu].set(qp.ubu)
        ml = qp.lbu_mask if qp.lbu_mask is not None else jnp.ones_like(qp.lbu)
        mu_ = qp.ubu_mask if qp.ubu_mask is not None else jnp.ones_like(qp.ubu)
        mask_l = mask_l.at[:N, o:o + nbu].set(ml * avail[:N])
        mask_u = mask_u.at[:N, o:o + nbu].set(mu_ * avail[:N])

    if ng:
        o = nbx + nbu
        # stage 0: x0 is fixed -> Gx row zero, bounds shifted by C0 x0
        Cx0 = qp.C[0] @ x0
        Gx = Gx.at[1:, o:o + ng, :].set(qp.C[1:])
        D_full = jnp.concatenate(
            [qp.D, jnp.zeros((1, ng, nu), dtype)], axis=0
        )
        Gu = Gu.at[:, o:o + ng, :].set(D_full)
        lg = qp.lg.at[0].add(-Cx0)
        ug = qp.ug.at[0].add(-Cx0)
        lb = lb.at[:, o:o + ng].set(lg)
        ub = ub.at[:, o:o + ng].set(ug)
        ml = qp.lg_mask if qp.lg_mask is not None else jnp.ones_like(qp.lg)
        mu_ = qp.ug_mask if qp.ug_mask is not None else jnp.ones_like(qp.ug)
        mask_l = mask_l.at[:, o:o + ng].set(ml)
        mask_u = mask_u.at[:, o:o + ng].set(mu_)

    soft_l = jnp.zeros((N + 1, m), dtype)
    soft_u = jnp.zeros((N + 1, m), dtype)
    Zl_r = jnp.zeros((N + 1, m), dtype)
    Zu_r = jnp.zeros((N + 1, m), dtype)
    zl_r = jnp.zeros((N + 1, m), dtype)
    zu_r = jnp.zeros((N + 1, m), dtype)
    lls_r = jnp.zeros((N + 1, m), dtype)
    lus_r = jnp.zeros((N + 1, m), dtype)
    if dims.ns:
        idxs = jnp.asarray(qp.idxs)
        ones = jnp.ones((N + 1, dims.ns), dtype)
        soft_l = soft_l.at[:, idxs].set(ones)
        soft_u = soft_u.at[:, idxs].set(ones)
        Zl_r = Zl_r.at[:, idxs].set(qp.Zl)
        Zu_r = Zu_r.at[:, idxs].set(qp.Zu)
        zl_r = zl_r.at[:, idxs].set(qp.zl)
        zu_r = zu_r.at[:, idxs].set(qp.zu)
        lls_r = lls_r.at[:, idxs].set(qp.lls)
        lus_r = lus_r.at[:, idxs].set(qp.lus)
        # a soft side only exists where the bound itself is active
        soft_l = soft_l * mask_l
        soft_u = soft_u * mask_u

    return _ConstraintSystem(Gx=Gx, Gu=Gu, lb=lb, ub=ub,
                             mask_l=mask_l, mask_u=mask_u,
                             soft_l=soft_l, soft_u=soft_u,
                             Zl=Zl_r, Zu=Zu_r, zl=zl_r, zu=zu_r,
                             lls=lls_r, lus=lus_r)


class _Iterate(NamedTuple):
    x: jnp.ndarray       # [N+1, nx]
    u: jnp.ndarray       # [N, nu]
    pi: jnp.ndarray      # [N+1, nx]
    sl: jnp.ndarray      # [N+1, m] lower slacks (v - lb [+ soft s])
    su: jnp.ndarray      # [N+1, m] upper slacks (ub - v [+ soft s])
    ll: jnp.ndarray      # [N+1, m] lower duals
    lu: jnp.ndarray      # [N+1, m] upper duals
    # soft-constraint variables (inert zeros/ones on hard rows):
    s_l: jnp.ndarray     # [N+1, m] soft slack values (lower side)
    s_u: jnp.ndarray     # [N+1, m] soft slack values (upper side)
    tb_l: jnp.ndarray    # [N+1, m] IPM slack of s_l >= lls
    tb_u: jnp.ndarray    # [N+1, m] IPM slack of s_u >= lus
    mu_l: jnp.ndarray    # [N+1, m] dual of s_l >= lls
    mu_u: jnp.ndarray    # [N+1, m] dual of s_u >= lus


def _cvals(con: _ConstraintSystem, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    u_full = jnp.concatenate([u, jnp.zeros_like(u[:1])], axis=0)
    return (jnp.einsum("nmj,nj->nm", con.Gx, x)
            + jnp.einsum("nmj,nj->nm", con.Gu, u_full))


def _rollout(qp: OcpQp, x0: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    def step(x, stage):
        A, B, b, u_i = stage
        x1 = A @ x + B @ u_i + b
        return x1, x
    xN, xs = lax.scan(step, x0, (qp.A, qp.B, qp.b, u))
    return jnp.concatenate([xs, xN[None]], axis=0)


def _stat_residuals(qp: OcpQp, con: _ConstraintSystem, it: _Iterate):
    """True-KKT stationarity residuals (with constraint dual terms)."""
    lam = it.lu * con.mask_u - it.ll * con.mask_l          # [N+1, m]
    gx_lam = jnp.einsum("nmj,nm->nj", con.Gx, lam)         # [N+1, nx]
    gu_lam = jnp.einsum("nmj,nm->nj", con.Gu, lam)[:-1]    # [N, nu]

    r_dyn, r_sx, r_su = kkt_residuals(qp, it.x, it.u, it.pi)
    return r_dyn, r_sx + gx_lam, r_su + gu_lam


def _objective(qp: OcpQp, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    quad_x = 0.5 * jnp.einsum("ni,nij,nj->", x, qp.Q, x) + jnp.sum(qp.q * x)
    quad_u = 0.5 * jnp.einsum("ni,nij,nj->", u, qp.R, u) + jnp.sum(qp.r * u)
    cross = jnp.einsum("ni,nij,nj->", u, qp.S, x[:-1])
    return quad_x + quad_u + cross


def ipm_solve(
    qp: OcpQp,
    x0: jnp.ndarray,
    settings: IpmSettings = IpmSettings(),
    warm_start: Optional[OcpQpSolution] = None,
) -> Tuple[OcpQpSolution, IpmStatistics]:
    """Solve the OCP-QP. Returns (solution, statistics).

    If the QP has no inequality rows, this is a single exact Riccati solve
    and ``statistics.iter == 0`` — matching the reference's unconstrained
    contract (hpipm-cpp/test/ocp_qp_ipm_solver.cpp:56).
    """
    with jax.default_matmul_precision("float32"):
        return _ipm_solve(qp, x0, settings, warm_start)


def _ipm_solve(qp, x0, settings, warm_start):
    dims = qp.dims
    dtype = qp.A.dtype
    iter_max = settings.iter_max

    if not dims.has_constraints:
        sol = lqr_solve(qp, x0, reg=settings.reg_prim, sqrt=settings.ric_alg)
        r_dyn, r_sx, r_su = kkt_residuals(qp, sol.x, sol.u, sol.pi)
        res_stat = jnp.maximum(jnp.max(jnp.abs(r_sx)), jnp.max(jnp.abs(r_su)))
        res_eq = jnp.max(jnp.abs(r_dyn))
        # a non-finite Riccati solution escaped every in-loop detector
        # (there is no loop): report it as UNKNOWN_FAILURE, the
        # reference wrapper's catch-all default branch
        # (ocp_qp_ipm_solver.cpp:406-413)
        finite = jnp.isfinite(jnp.sum(sol.x) + jnp.sum(sol.u)
                              + jnp.sum(sol.pi))
        zeros = jnp.zeros((iter_max + 1,), dtype)
        stats = IpmStatistics(
            iter=jnp.asarray(0, jnp.int32),
            status=jnp.where(finite, int(IpmStatus.SUCCESS),
                             int(IpmStatus.UNKNOWN_FAILURE)
                             ).astype(jnp.int32),
            max_res_stat=res_stat,
            max_res_eq=res_eq,
            max_res_ineq=jnp.asarray(0.0, dtype),
            max_res_comp=jnp.asarray(0.0, dtype),
            alpha_aff=zeros, mu_aff=zeros, sigma=zeros,
            alpha_prim=zeros, alpha_dual=zeros, mu=zeros,
            res_stat=zeros.at[0].set(res_stat),
            res_eq=zeros.at[0].set(res_eq),
            res_ineq=zeros, res_comp=zeros,
            obj=zeros.at[0].set(_objective(qp, sol.x, sol.u)),
            # the single Riccati solve IS the Newton system here: its KKT
            # residuals are the linear-system residuals
            lin_res_stat=zeros.at[0].set(res_stat),
            lin_res_eq=zeros.at[0].set(res_eq),
            lin_res_ineq=zeros, lin_res_comp=zeros,
        )
        return sol, stats

    con = _build_constraints(qp, dims, x0)
    n_act = (jnp.sum(con.mask_l) + jnp.sum(con.mask_u)
             + jnp.sum(con.soft_l) + jnp.sum(con.soft_u))
    n_act = jnp.maximum(n_act, 1.0)

    def factorize_aug(W):
        """Riccati factorization of the W-augmented stage Hessians.

        ``ric_alg`` selects the structured square-root recursion, which
        takes (base cost, constraint rows, W) and never forms the
        augmented Hessian — the generic sqrt factorization's Schur
        complement catastrophically cancels at near-convergence weights
        (W ~ 1/mu ~ 1e12) and NaNs. Classical forms the augmentation
        explicitly (cheaper; additions only, so no cancellation there).
        """
        if settings.ric_alg:
            return riccati_factorize_sqrt_con(
                qp.A, qp.B, qp.Q, qp.S, qp.R, con.Gx, con.Gu, W,
                reg=settings.reg_prim)
        Q_aug = qp.Q + jnp.einsum("nmi,nm,nmj->nij", con.Gx, W, con.Gx)
        Gu_w = con.Gu[:-1]
        R_aug = qp.R + jnp.einsum("nmi,nm,nmj->nij", Gu_w, W[:-1], Gu_w)
        S_aug = qp.S + jnp.einsum("nmi,nm,nmj->nij", Gu_w, W[:-1], con.Gx[:-1])
        return riccati_factorize(qp.A, qp.B, Q_aug, S_aug, R_aug,
                                 reg=settings.reg_prim)

    # --- initialization -----------------------------------------------------
    warm = settings.warm_start and warm_start is not None
    if warm:
        u_init = warm_start.u.astype(dtype)
    else:
        u_init = jnp.zeros((dims.N, dims.nu), dtype)
    x_init = _rollout(qp, x0, u_init)
    v0 = _cvals(con, x_init, u_init)
    # cold: slacks floored at sqrt(mu0) (HPIPM-style centered start);
    # warm: trust the provided point's distances (a large floor would
    # distort near-active constraints and cost iterations)
    floor = jnp.sqrt(settings.mu0) if not warm else max(
        1e-8, float(jnp.finfo(dtype).eps) * 10.0)
    s_floor = jnp.asarray(floor, dtype)
    s_l0 = jnp.where(con.soft_l > 0, con.lls + s_floor, 0.0)
    s_u0 = jnp.where(con.soft_u > 0, con.lus + s_floor, 0.0)
    tb_l0 = jnp.where(con.soft_l > 0, s_floor, 1.0)
    tb_u0 = jnp.where(con.soft_u > 0, s_floor, 1.0)
    mu_l0 = jnp.where(con.soft_l > 0, settings.mu0 / tb_l0, 0.0)
    mu_u0 = jnp.where(con.soft_u > 0, settings.mu0 / tb_u0, 0.0)
    sl0 = jnp.where(con.mask_l > 0,
                    jnp.maximum(v0 - con.lb + s_l0, s_floor), 1.0)
    su0 = jnp.where(con.mask_u > 0,
                    jnp.maximum(con.ub + s_u0 - v0, s_floor), 1.0)
    ll0 = jnp.where(con.mask_l > 0, settings.mu0 / sl0, 0.0)
    lu0 = jnp.where(con.mask_u > 0, settings.mu0 / su0, 0.0)
    it0 = _Iterate(x=x_init, u=u_init, pi=jnp.zeros_like(x_init),
                   sl=sl0, su=su0, ll=ll0, lu=lu0,
                   s_l=s_l0, s_u=s_u0, tb_l=tb_l0, tb_u=tb_u0,
                   mu_l=mu_l0, mu_u=mu_u0)

    def compute_mu(it: _Iterate) -> jnp.ndarray:
        return (jnp.sum(it.ll * it.sl * con.mask_l)
                + jnp.sum(it.lu * it.su * con.mask_u)
                + jnp.sum(it.mu_l * it.tb_l * con.soft_l)
                + jnp.sum(it.mu_u * it.tb_u * con.soft_u)) / n_act

    def residual_norms(it: _Iterate):
        r_dyn, r_sx, r_su = _stat_residuals(qp, con, it)
        v = _cvals(con, it.x, it.u)
        r_l = (v - con.lb + it.s_l * con.soft_l - it.sl) * con.mask_l
        r_u = (con.ub + it.s_u * con.soft_u - v - it.su) * con.mask_u
        # soft-slack bound residuals and s-stationarity
        r_bl = (it.s_l - con.lls - it.tb_l) * con.soft_l
        r_bu = (it.s_u - con.lus - it.tb_u) * con.soft_u
        r_ssl = (con.Zl * it.s_l + con.zl - it.ll - it.mu_l) * con.soft_l
        r_ssu = (con.Zu * it.s_u + con.zu - it.lu - it.mu_u) * con.soft_u
        res_stat = jnp.maximum(jnp.max(jnp.abs(r_sx)), jnp.max(jnp.abs(r_su)))
        res_stat = jnp.maximum(res_stat, jnp.maximum(
            jnp.max(jnp.abs(r_ssl)), jnp.max(jnp.abs(r_ssu))))
        res_eq = jnp.max(jnp.abs(r_dyn))
        res_ineq = jnp.maximum(jnp.max(jnp.abs(r_l)), jnp.max(jnp.abs(r_u)))
        res_ineq = jnp.maximum(res_ineq, jnp.maximum(
            jnp.max(jnp.abs(r_bl)), jnp.max(jnp.abs(r_bu))))
        res_comp = jnp.maximum(
            jnp.max(jnp.abs(it.ll * it.sl * con.mask_l)),
            jnp.max(jnp.abs(it.lu * it.su * con.mask_u)),
        )
        res_comp = jnp.maximum(res_comp, jnp.maximum(
            jnp.max(jnp.abs(it.mu_l * it.tb_l * con.soft_l)),
            jnp.max(jnp.abs(it.mu_u * it.tb_u * con.soft_u))))
        return ((r_dyn, r_sx, r_su, r_l, r_u, r_bl, r_bu, r_ssl, r_ssu),
                (res_stat, res_eq, res_ineq, res_comp))

    def max_step(val: jnp.ndarray, dval: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Largest alpha in (0,1] with val + alpha dval >= (1-tau) restriction."""
        neg = (dval < 0) & (mask > 0)
        ratio = jnp.where(neg, -val / jnp.where(neg, dval, -1.0), jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio))

    def soft_weights(it: _Iterate):
        """Per-row effective weights for the slack-eliminated Hessian:
        hard rows contribute w_h = lam/s; softened rows the series
        combination w_h (Z + w_s)/(Z + w_h + w_s) — softening caps the
        row's stiffness at the penalty curvature."""
        w_hl = jnp.where(con.mask_l > 0, it.ll / it.sl, 0.0)
        w_hu = jnp.where(con.mask_u > 0, it.lu / it.su, 0.0)
        w_sl = jnp.where(con.soft_l > 0, it.mu_l / it.tb_l, 0.0)
        w_su = jnp.where(con.soft_u > 0, it.mu_u / it.tb_u, 0.0)
        w_tot_l = con.Zl + w_hl + w_sl
        w_tot_u = con.Zu + w_hu + w_su
        w_eff_l = jnp.where(con.soft_l > 0,
                            w_hl * (1.0 - w_hl / w_tot_l), w_hl)
        w_eff_u = jnp.where(con.soft_u > 0,
                            w_hu * (1.0 - w_hu / w_tot_u), w_hu)
        return (w_hl, w_hu, w_tot_l, w_tot_u, w_eff_l, w_eff_u)

    def newton_direction(it: _Iterate, fac: RiccatiFactors, rhs_c, resids):
        """Solve one Newton system given the shared factorization.

        ``rhs_c = (rc_l, rc_u, rc_bl, rc_bu)`` are complementarity
        right-hand sides (lam*s for the predictor; + correction - sigma*mu
        for the corrector) for the four nonnegative pairs.
        """
        (r_dyn, r_sx, r_su, r_l, r_u, r_bl, r_bu, r_ssl, r_ssu) = resids
        rc_l, rc_u, rc_bl, rc_bu = rhs_c
        inv_sl = jnp.where(con.mask_l > 0, 1.0 / it.sl, 0.0)
        inv_su = jnp.where(con.mask_u > 0, 1.0 / it.su, 0.0)
        inv_tbl = jnp.where(con.soft_l > 0, 1.0 / it.tb_l, 0.0)
        inv_tbu = jnp.where(con.soft_u > 0, 1.0 / it.tb_u, 0.0)
        w_hl, w_hu, w_tot_l, w_tot_u, _, _ = soft_weights(it)

        rho_l = inv_sl * (rc_l + it.ll * r_l)
        rho_u = inv_su * (rc_u + it.lu * r_u)
        rho_bl = inv_tbl * (rc_bl + it.mu_l * r_bl)
        rho_bu = inv_tbu * (rc_bu + it.mu_u * r_bu)
        Sig_l = r_ssl + rho_l + rho_bl
        Sig_u = r_ssu + rho_u + rho_bu

        # kappa: constant part of d(lambda) = +-w_eff G dz + kappa
        kap_l = jnp.where(con.soft_l > 0,
                          -rho_l + w_hl * Sig_l / w_tot_l, -rho_l)
        kap_u = jnp.where(con.soft_u > 0,
                          -rho_u + w_hu * Sig_u / w_tot_u, -rho_u)
        d = kap_u - kap_l
        q_add = jnp.einsum("nmj,nm->nj", con.Gx, d)
        r_add = jnp.einsum("nmj,nm->nj", con.Gu, d)[:-1]

        dx, du, dpi, _, _ = riccati_solve_vectors(
            fac, qp.A, qp.B, r_dyn,
            r_sx + q_add, r_su + r_add, jnp.zeros_like(x0),
        )
        Gdx = jnp.einsum("nmj,nj->nm", con.Gx, dx)
        du_full = jnp.concatenate([du, jnp.zeros_like(du[:1])], axis=0)
        Gdu = jnp.einsum("nmj,nj->nm", con.Gu, du_full)
        Gdz = Gdx + Gdu

        ds_l = jnp.where(con.soft_l > 0,
                         -(Sig_l + w_hl * Gdz) / w_tot_l, 0.0)
        ds_u = jnp.where(con.soft_u > 0,
                         -(Sig_u - w_hu * Gdz) / w_tot_u, 0.0)
        dsl = (Gdz + ds_l + r_l) * con.mask_l
        dsu = (-Gdz + ds_u + r_u) * con.mask_u
        dll = jnp.where(con.mask_l > 0, -inv_sl * (rc_l + it.ll * dsl), 0.0)
        dlu = jnp.where(con.mask_u > 0, -inv_su * (rc_u + it.lu * dsu), 0.0)
        dtb_l = (ds_l + r_bl) * con.soft_l
        dtb_u = (ds_u + r_bu) * con.soft_u
        dmu_l = jnp.where(con.soft_l > 0, -inv_tbl * (rc_bl + it.mu_l * dtb_l), 0.0)
        dmu_u = jnp.where(con.soft_u > 0, -inv_tbu * (rc_bu + it.mu_u * dtb_u), 0.0)
        return _Iterate(x=dx, u=du, pi=dpi, sl=dsl, su=dsu, ll=dll, lu=dlu,
                        s_l=ds_l, s_u=ds_u, tb_l=dtb_l, tb_u=dtb_u,
                        mu_l=dmu_l, mu_u=dmu_u)

    def linear_residual_norms(it: _Iterate, d: _Iterate, rhs_c, resids):
        """Inf-norm residuals of the FULL Newton linear system at the
        computed direction ``d`` — HPIPM's ``lin_res_{stat,eq,ineq,comp}``
        columns (ocp_qp_ipm_solver_statistics.hpp:54-57, harvested at
        src/ocp_qp_ipm_solver.cpp:396-398). In exact arithmetic all four
        are zero; in f32 the stat/eq rows expose the Riccati backsolve
        error (the slack/complementarity rows are satisfied to rounding by
        the elimination formulas), which is the refinement diagnostic.
        """
        (r_dyn, r_sx, r_su, r_l, r_u, r_bl, r_bu, r_ssl, r_ssu) = resids
        rc_l, rc_u, rc_bl, rc_bu = rhs_c
        # dynamics rows: dx_{k+1} - A dx_k - B du_k = r_dyn
        Adx = jnp.einsum("nij,nj->ni", qp.A, d.x[:-1])
        Bdu = jnp.einsum("nij,nj->ni", qp.B, d.u)
        lin_eq = d.x[1:] - Adx - Bdu - r_dyn
        # stationarity rows (BASE Hessians + constraint-dual columns):
        #   Q dx + S'du + A'dpi_{+1} - dpi + Gx'(dlu - dll) = -r_sx_full
        dlam = d.lu * con.mask_u - d.ll * con.mask_l
        gx_dlam = jnp.einsum("nmj,nm->nj", con.Gx, dlam)
        gu_dlam = jnp.einsum("nmj,nm->nj", con.Gu, dlam)[:-1]
        Qdx = jnp.einsum("nij,nj->ni", qp.Q, d.x)
        Stdu = jnp.einsum("nji,nj->ni", qp.S, d.u)
        Atdpi = jnp.einsum("nji,nj->ni", qp.A, d.pi[1:])
        lin_sx = Qdx - d.pi + gx_dlam + r_sx
        lin_sx = lin_sx.at[:-1].add(Stdu + Atdpi)
        Rdu = jnp.einsum("nij,nj->ni", qp.R, d.u)
        Sdx = jnp.einsum("nij,nj->ni", qp.S, d.x[:-1])
        Btdpi = jnp.einsum("nji,nj->ni", qp.B, d.pi[1:])
        lin_su = Rdu + Sdx + Btdpi + gu_dlam + r_su
        lin_ssl = (con.Zl * d.s_l - d.ll - d.mu_l + r_ssl) * con.soft_l
        lin_ssu = (con.Zu * d.s_u - d.lu - d.mu_u + r_ssu) * con.soft_u
        lin_stat = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(lin_sx)), jnp.max(jnp.abs(lin_su))),
            jnp.maximum(jnp.max(jnp.abs(lin_ssl)), jnp.max(jnp.abs(lin_ssu))))
        # inequality rows: Gdz + ds - dsl = -r
        du_full = jnp.concatenate([d.u, jnp.zeros_like(d.u[:1])], axis=0)
        Gdz = (jnp.einsum("nmj,nj->nm", con.Gx, d.x)
               + jnp.einsum("nmj,nj->nm", con.Gu, du_full))
        lin_l = (Gdz + d.s_l * con.soft_l - d.sl + r_l) * con.mask_l
        lin_u = (-Gdz + d.s_u * con.soft_u - d.su + r_u) * con.mask_u
        lin_bl = (d.s_l - d.tb_l + r_bl) * con.soft_l
        lin_bu = (d.s_u - d.tb_u + r_bu) * con.soft_u
        lin_ineq = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(lin_l)), jnp.max(jnp.abs(lin_u))),
            jnp.maximum(jnp.max(jnp.abs(lin_bl)), jnp.max(jnp.abs(lin_bu))))
        # complementarity rows: lam dsl + sl dll = -rc
        lin_cl = (it.ll * d.sl + it.sl * d.ll + rc_l) * con.mask_l
        lin_cu = (it.lu * d.su + it.su * d.lu + rc_u) * con.mask_u
        lin_cbl = (it.mu_l * d.tb_l + it.tb_l * d.mu_l + rc_bl) * con.soft_l
        lin_cbu = (it.mu_u * d.tb_u + it.tb_u * d.mu_u + rc_bu) * con.soft_u
        lin_comp = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(lin_cl)), jnp.max(jnp.abs(lin_cu))),
            jnp.maximum(jnp.max(jnp.abs(lin_cbl)), jnp.max(jnp.abs(lin_cbu))))
        return lin_stat, jnp.max(jnp.abs(lin_eq)), lin_ineq, lin_comp

    def one_iteration(it: _Iterate):
        resids, _ = residual_norms(it)
        mu = compute_mu(it)

        # slack-eliminated Hessian augmentation (soft rows use the series
        # combination weight)
        _, _, _, _, w_eff_l, w_eff_u = soft_weights(it)
        fac = factorize_aug(w_eff_l + w_eff_u)

        # predictor (affine): complementarity rhs = lam*s (sigma = 0)
        rc_aff = (it.ll * it.sl * con.mask_l,
                  it.lu * it.su * con.mask_u,
                  it.mu_l * it.tb_l * con.soft_l,
                  it.mu_u * it.tb_u * con.soft_u)
        d_aff = newton_direction(it, fac, rc_aff, resids)

        def joint_max_step(dd: _Iterate):
            prim = jnp.minimum(
                jnp.minimum(max_step(it.sl, dd.sl, con.mask_l),
                            max_step(it.su, dd.su, con.mask_u)),
                jnp.minimum(max_step(it.tb_l, dd.tb_l, con.soft_l),
                            max_step(it.tb_u, dd.tb_u, con.soft_u)),
            )
            dual = jnp.minimum(
                jnp.minimum(max_step(it.ll, dd.ll, con.mask_l),
                            max_step(it.lu, dd.lu, con.mask_u)),
                jnp.minimum(max_step(it.mu_l, dd.mu_l, con.soft_l),
                            max_step(it.mu_u, dd.mu_u, con.soft_u)),
            )
            return prim, dual

        ap_aff, ad_aff = joint_max_step(d_aff)
        a_aff = jnp.minimum(ap_aff, ad_aff)
        mu_aff = (
            jnp.sum((it.ll + a_aff * d_aff.ll) * (it.sl + a_aff * d_aff.sl) * con.mask_l)
            + jnp.sum((it.lu + a_aff * d_aff.lu) * (it.su + a_aff * d_aff.su) * con.mask_u)
            + jnp.sum((it.mu_l + a_aff * d_aff.mu_l) * (it.tb_l + a_aff * d_aff.tb_l) * con.soft_l)
            + jnp.sum((it.mu_u + a_aff * d_aff.mu_u) * (it.tb_u + a_aff * d_aff.tb_u) * con.soft_u)
        ) / n_act
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        if settings.pred_corr:
            rc = (rc_aff[0] + (d_aff.ll * d_aff.sl - sigma * mu) * con.mask_l,
                  rc_aff[1] + (d_aff.lu * d_aff.su - sigma * mu) * con.mask_u,
                  rc_aff[2] + (d_aff.mu_l * d_aff.tb_l - sigma * mu) * con.soft_l,
                  rc_aff[3] + (d_aff.mu_u * d_aff.tb_u - sigma * mu) * con.soft_u)
        else:
            rc = (rc_aff[0] - sigma * mu * con.mask_l,
                  rc_aff[1] - sigma * mu * con.mask_u,
                  rc_aff[2] - sigma * mu * con.soft_l,
                  rc_aff[3] - sigma * mu * con.soft_u)
        d = newton_direction(it, fac, rc, resids)

        tau = jnp.asarray(_FRAC_TO_BOUND, dtype)
        ap, ad = joint_max_step(d)
        a_slack, a_dual = tau * ap, tau * ad
        if settings.split_step:
            a_prim, a_du = a_slack, a_dual
        else:
            a = jnp.minimum(a_slack, a_dual)
            a_prim, a_du = a, a

        new_it = _Iterate(
            x=it.x + a_prim * d.x,
            u=it.u + a_prim * d.u,
            pi=it.pi + a_du * d.pi,
            sl=jnp.where(con.mask_l > 0, it.sl + a_prim * d.sl, 1.0),
            su=jnp.where(con.mask_u > 0, it.su + a_prim * d.su, 1.0),
            ll=jnp.where(con.mask_l > 0, it.ll + a_du * d.ll, 0.0),
            lu=jnp.where(con.mask_u > 0, it.lu + a_du * d.lu, 0.0),
            s_l=jnp.where(con.soft_l > 0, it.s_l + a_prim * d.s_l, 0.0),
            s_u=jnp.where(con.soft_u > 0, it.s_u + a_prim * d.s_u, 0.0),
            tb_l=jnp.where(con.soft_l > 0, it.tb_l + a_prim * d.tb_l, 1.0),
            tb_u=jnp.where(con.soft_u > 0, it.tb_u + a_prim * d.tb_u, 1.0),
            mu_l=jnp.where(con.soft_l > 0, it.mu_l + a_du * d.mu_l, 0.0),
            mu_u=jnp.where(con.soft_u > 0, it.mu_u + a_du * d.mu_u, 0.0),
        )
        l_st, l_eq, l_iq, l_cp = linear_residual_norms(it, d, rc, resids)
        per_iter = dict(alpha_aff=a_aff, mu_aff=mu_aff, sigma=sigma,
                        alpha_prim=a_prim, alpha_dual=a_du,
                        lin_res_stat=l_st, lin_res_eq=l_eq,
                        lin_res_ineq=l_iq, lin_res_comp=l_cp)
        return new_it, fac, per_iter

    # --- main loop ----------------------------------------------------------
    stat_cols = ("alpha_aff", "mu_aff", "sigma", "alpha_prim", "alpha_dual",
                 "mu", "res_stat", "res_eq", "res_ineq", "res_comp", "obj",
                 "lin_res_stat", "lin_res_eq", "lin_res_ineq",
                 "lin_res_comp")
    zeros_hist = {c: jnp.zeros((iter_max + 1,), dtype) for c in stat_cols}

    def full_objective(it: _Iterate):
        pen = (jnp.sum((0.5 * con.Zl * it.s_l + con.zl) * it.s_l * con.soft_l)
               + jnp.sum((0.5 * con.Zu * it.s_u + con.zu) * it.s_u * con.soft_u))
        return _objective(qp, it.x, it.u) + pen

    def record(hist, i, it: _Iterate, extra):
        _, (rs, re, ri, rc) = residual_norms(it)
        vals = dict(mu=compute_mu(it), res_stat=rs, res_eq=re, res_ineq=ri,
                    res_comp=rc, obj=full_objective(it), **extra)
        return {c: hist[c].at[i].set(vals.get(c, 0.0)) for c in stat_cols}

    def converged(it: _Iterate):
        if settings.mode is IpmMode.SPEED_ABS:
            # HPIPM abs_form semantics: exit on the absolute duality
            # measure alone, no KKT residual test per iteration
            # (d_ocp_qp_ipm_arg_set_default, ocp_qp_ipm_solver_settings.hpp:8-26).
            return compute_mu(it) < settings.tol_comp
        _, (rs, re, ri, rc) = residual_norms(it)
        return ((rs < settings.tol_stat) & (re < settings.tol_eq)
                & (ri < settings.tol_ineq) & (rc < settings.tol_comp))

    def cond(carry):
        it, i, hist, status = carry
        running = status == int(IpmStatus.MAX_ITER_REACHED)
        return (i < iter_max) & running & jnp.logical_not(converged(it))

    def body(carry):
        it, i, hist, status = carry
        new_it, _, extra = one_iteration(it)
        nan = jnp.logical_not(
            jnp.isfinite(jnp.sum(new_it.x) + jnp.sum(new_it.u)
                         + jnp.sum(new_it.ll) + jnp.sum(new_it.lu)
                         + jnp.sum(new_it.s_l) + jnp.sum(new_it.mu_l)
                         + jnp.sum(new_it.s_u) + jnp.sum(new_it.mu_u))
        )
        tiny_step = jnp.maximum(extra["alpha_prim"], extra["alpha_dual"]) < settings.alpha_min
        new_status = jnp.where(
            nan, int(IpmStatus.NAN_DETECTED),
            jnp.where(tiny_step, int(IpmStatus.MIN_STEP_LENGTH_REACHED),
                      int(IpmStatus.MAX_ITER_REACHED)),
        ).astype(jnp.int32)
        new_it = jax.tree.map(
            lambda new, old: jnp.where(nan, old, new), new_it, it
        )
        hist = record(hist, i + 1, new_it, extra)
        return (new_it, i + 1, hist, new_status)

    hist0 = record(zeros_hist, 0, it0, dict(alpha_aff=0.0, mu_aff=0.0, sigma=0.0,
                                            alpha_prim=0.0, alpha_dual=0.0))
    status0 = jnp.asarray(int(IpmStatus.MAX_ITER_REACHED), jnp.int32)
    it_f, n_iter, hist, status = lax.while_loop(cond, body, (it0, 0, hist0, status0))

    status = jnp.where(
        (status == int(IpmStatus.MAX_ITER_REACHED)) & converged(it_f),
        jnp.asarray(int(IpmStatus.SUCCESS), jnp.int32), status,
    )
    # catch-all: a non-finite final iterate that none of the in-loop
    # detectors classified (the NaN guard freezes at the last finite
    # iterate, so reaching here non-finite means e.g. non-finite QP data
    # from iteration 0) — the reference wrapper's default status branch
    # (ocp_qp_ipm_solver.cpp:406-413 -> HpipmStatus::UnknownFailure)
    finite_f = jnp.isfinite(jnp.sum(it_f.x) + jnp.sum(it_f.u)
                            + jnp.sum(it_f.pi))
    status = jnp.where(
        jnp.logical_not(finite_f) & (status != int(IpmStatus.NAN_DETECTED)),
        jnp.asarray(int(IpmStatus.UNKNOWN_FAILURE), jnp.int32), status,
    )

    # final factorization for the Riccati surface of the solution (HPIPM
    # returns the last iteration's ric quantities; we refresh them at the
    # final iterate's augmentation for a consistent (P, K, k, p) surface)
    _, _, _, _, w_eff_l_f, w_eff_u_f = soft_weights(it_f)
    lam = it_f.lu * con.mask_u - it_f.ll * con.mask_l
    q_aug = qp.q + jnp.einsum("nmj,nm->nj", con.Gx, lam)
    r_aug = qp.r + jnp.einsum("nmj,nm->nj", con.Gu, lam)[:-1]
    fac_f = factorize_aug(w_eff_l_f + w_eff_u_f)
    _, _, _, p_f, k_f = riccati_solve_vectors(
        fac_f, qp.A, qp.B, qp.b, q_aug, r_aug, x0
    )

    sol = OcpQpSolution(x=it_f.x, u=it_f.u, pi=it_f.pi,
                        P=fac_f.P, p=p_f, K=fac_f.K, k=k_f)

    _, (rs, re, ri, rc) = residual_norms(it_f)
    stats = IpmStatistics(
        iter=n_iter.astype(jnp.int32),
        status=status,
        max_res_stat=rs, max_res_eq=re, max_res_ineq=ri, max_res_comp=rc,
        **hist,
    )
    return sol, stats
