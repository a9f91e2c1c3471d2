"""Batched constrained interior-point solver in SoA ("batch-in-lanes") layout.

TPU-native twin of :mod:`ocpqp.ipm` — the same Mehrotra predictor-corrector
algorithm (see ipm.py's module docstring for the math and the HPIPM parity
notes; reference entry point ``d_ocp_qp_ipm_solve`` at
/root/reference/hpipm-cpp/src/ocp_qp_ipm_solver.cpp:334) — but laid out for
the hardware: every stage matrix is stored ``[stages, n, m, B]`` with the
scenario batch in the trailing lane dimension, products expand through
``ops.smallmat`` rank-1 k-loops, and the Riccati factorization is
``ops.riccati_soa``. This is the layout ``README.md`` measures as ~100x
faster than the vmapped AoS ``einsum`` path for 12x12 stage matrices at
B=4096 — the AoS solver in ipm.py remains the f64/CPU oracle.

Semantics match ``vmap(ipm_solve)`` exactly (validated to 1e-6 in
tests/test_ipm_soa.py): per-scenario convergence masking freezes finished
scenarios exactly like JAX's vmap-of-while lowering, per-scenario statuses
follow IpmStatus, and the per-iteration statistics history is recorded
per scenario (the batched-statistics story flagged in round 1: the history
is [iter_max+1, B] — ~1.4 MB per column at B=4096/iter_max=30, cheap).

One deviation: ``ric_alg`` is accepted but the SoA path always runs the
classical Riccati factorization (ops.riccati_soa has no square-root
variant); both produce the same solution, and the AoS oracle covers the
sqrt algorithm.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from srbd_nmpc_tpu.ocpqp.data import OcpQp, OcpQpDims
from srbd_nmpc_tpu.ocpqp.settings import IpmMode, IpmSettings, IpmStatus
from srbd_nmpc_tpu.ocpqp.solution import OcpQpSolution
from srbd_nmpc_tpu.ocpqp.statistics import IpmStatistics
from srbd_nmpc_tpu.ops import riccati_soa
from srbd_nmpc_tpu.ops import smallmat as sm

_FRAC_TO_BOUND = 0.995  # fraction-to-boundary factor (HPIPM default)

# stage-wise smallmat ops over a leading stage axis:
#   _smv : ([S,n,m,B], [S,m,B]) -> [S,n,B]
#   _smtv: ([S,n,m,B], [S,n,B]) -> [S,m,B]
#   _smtm: ([S,k,n,B], [S,k,m,B]) -> [S,n,m,B]
_smv = jax.vmap(sm.mv)
_smtv = jax.vmap(sm.mtv)
_smtm = jax.vmap(sm.mtm)


class _QpSoA(NamedTuple):
    """OCP-QP cost/dynamics data in SoA layout (trailing batch lane)."""

    A: jnp.ndarray   # [N, nx, nx, B]
    B: jnp.ndarray   # [N, nx, nu, B]
    b: jnp.ndarray   # [N, nx, B]
    Q: jnp.ndarray   # [N+1, nx, nx, B]
    S: jnp.ndarray   # [N, nu, nx, B]
    R: jnp.ndarray   # [N, nu, nu, B]
    q: jnp.ndarray   # [N+1, nx, B]
    r: jnp.ndarray   # [N, nu, B]


class _ConSoA(NamedTuple):
    """Stacked constraint system, SoA: rows = [box-x, box-u, general].

    Same construction as ipm._build_constraints (stage-0 x rows disabled,
    terminal u rows absent, stage-0 general rows fold C0 x0 into the
    bounds) with a trailing batch lane on every array.
    """

    Gx: jnp.ndarray      # [N+1, m, nx, B]
    Gu: jnp.ndarray      # [N+1, m, nu, B]
    lb: jnp.ndarray      # [N+1, m, B]
    ub: jnp.ndarray
    mask_l: jnp.ndarray
    mask_u: jnp.ndarray
    soft_l: jnp.ndarray
    soft_u: jnp.ndarray
    Zl: jnp.ndarray
    Zu: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray
    lls: jnp.ndarray
    lus: jnp.ndarray


class _Iterate(NamedTuple):
    """Per-scenario IPM iterate; same fields as ipm._Iterate, SoA shapes."""

    x: jnp.ndarray       # [N+1, nx, B]
    u: jnp.ndarray       # [N, nu, B]
    pi: jnp.ndarray      # [N+1, nx, B]
    sl: jnp.ndarray      # [N+1, m, B]
    su: jnp.ndarray
    ll: jnp.ndarray
    lu: jnp.ndarray
    s_l: jnp.ndarray
    s_u: jnp.ndarray
    tb_l: jnp.ndarray
    tb_u: jnp.ndarray
    mu_l: jnp.ndarray
    mu_u: jnp.ndarray


def _soa(arr: jnp.ndarray, base_rank: int, batch: int) -> jnp.ndarray:
    """[B, ...] or shared [...] -> SoA [..., B]."""
    arr = jnp.asarray(arr)
    if arr.ndim == base_rank:
        return jnp.broadcast_to(arr[..., None], arr.shape + (batch,))
    return sm.to_soa(arr)


def _qp_soa(qp: OcpQp, batch: int) -> _QpSoA:
    return _QpSoA(
        A=_soa(qp.A, 3, batch), B=_soa(qp.B, 3, batch), b=_soa(qp.b, 2, batch),
        Q=_soa(qp.Q, 3, batch), S=_soa(qp.S, 3, batch), R=_soa(qp.R, 3, batch),
        q=_soa(qp.q, 2, batch), r=_soa(qp.r, 2, batch),
    )


def _build_constraints(qp: OcpQp, dims: OcpQpDims, x0s: jnp.ndarray,
                       batch: int) -> _ConSoA:
    """SoA twin of ipm._build_constraints; x0s is SoA [nx, B]."""
    N, nx, nu = dims.N, dims.nx, dims.nu
    nbx, nbu, ng = dims.nbx, dims.nbu, dims.ng
    m = nbx + nbu + ng
    dtype = qp.A.dtype

    def z(*shape):
        return jnp.zeros(shape + (batch,), dtype)

    Gx, Gu = z(N + 1, m, nx), z(N + 1, m, nu)
    lb, ub = z(N + 1, m), z(N + 1, m)
    mask_l, mask_u = z(N + 1, m), z(N + 1, m)

    stage_idx = jnp.arange(N + 1)

    def ones_like_bound(b_arr, rank):
        return jnp.ones(b_arr.shape[-rank:], dtype)

    if nbx:
        Ex = jnp.zeros((nbx, nx), dtype)
        Ex = Ex.at[jnp.arange(nbx), jnp.asarray(qp.idxbx)].set(1.0)
        avail = (stage_idx >= 1).astype(dtype)  # no stage-0 x box
        Gx = Gx.at[:, 0:nbx, :, :].set(
            (Ex[None] * avail[:, None, None])[..., None])
        lb = lb.at[:, 0:nbx].set(_soa(qp.lbx, 2, batch))
        ub = ub.at[:, 0:nbx].set(_soa(qp.ubx, 2, batch))
        ml = qp.lbx_mask if qp.lbx_mask is not None else ones_like_bound(qp.lbx, 2)
        mu_ = qp.ubx_mask if qp.ubx_mask is not None else ones_like_bound(qp.ubx, 2)
        av = avail[:, None, None]
        mask_l = mask_l.at[:, 0:nbx].set(_soa(ml, 2, batch) * av)
        mask_u = mask_u.at[:, 0:nbx].set(_soa(mu_, 2, batch) * av)

    if nbu:
        Eu = jnp.zeros((nbu, nu), dtype)
        Eu = Eu.at[jnp.arange(nbu), jnp.asarray(qp.idxbu)].set(1.0)
        avail = (stage_idx < N).astype(dtype)  # no terminal u
        o = nbx
        Gu = Gu.at[:, o:o + nbu, :, :].set(
            (Eu[None] * avail[:, None, None])[..., None])
        lb = lb.at[:N, o:o + nbu].set(_soa(qp.lbu, 2, batch))
        ub = ub.at[:N, o:o + nbu].set(_soa(qp.ubu, 2, batch))
        ml = qp.lbu_mask if qp.lbu_mask is not None else ones_like_bound(qp.lbu, 2)
        mu_ = qp.ubu_mask if qp.ubu_mask is not None else ones_like_bound(qp.ubu, 2)
        mask_l = mask_l.at[:N, o:o + nbu].set(_soa(ml, 2, batch))
        mask_u = mask_u.at[:N, o:o + nbu].set(_soa(mu_, 2, batch))

    if ng:
        o = nbx + nbu
        C = _soa(qp.C, 3, batch)                      # [N+1, ng, nx, B]
        D = _soa(qp.D, 3, batch)                      # [N, ng, nu, B]
        Cx0 = sm.mv(C[0], x0s)                        # [ng, B]
        Gx = Gx.at[1:, o:o + ng, :, :].set(C[1:])
        Gu = Gu.at[:N, o:o + ng, :, :].set(D)
        lg = _soa(qp.lg, 2, batch).at[0].add(-Cx0)
        ug = _soa(qp.ug, 2, batch).at[0].add(-Cx0)
        lb = lb.at[:, o:o + ng].set(lg)
        ub = ub.at[:, o:o + ng].set(ug)
        ml = qp.lg_mask if qp.lg_mask is not None else ones_like_bound(qp.lg, 2)
        mu_ = qp.ug_mask if qp.ug_mask is not None else ones_like_bound(qp.ug, 2)
        mask_l = mask_l.at[:, o:o + ng].set(_soa(ml, 2, batch))
        mask_u = mask_u.at[:, o:o + ng].set(_soa(mu_, 2, batch))

    soft_l, soft_u = z(N + 1, m), z(N + 1, m)
    Zl_r, Zu_r = z(N + 1, m), z(N + 1, m)
    zl_r, zu_r = z(N + 1, m), z(N + 1, m)
    lls_r, lus_r = z(N + 1, m), z(N + 1, m)
    if dims.ns:
        idxs = jnp.asarray(qp.idxs)
        ones = jnp.ones((N + 1, dims.ns, batch), dtype)
        soft_l = soft_l.at[:, idxs].set(ones)
        soft_u = soft_u.at[:, idxs].set(ones)
        Zl_r = Zl_r.at[:, idxs].set(_soa(qp.Zl, 2, batch))
        Zu_r = Zu_r.at[:, idxs].set(_soa(qp.Zu, 2, batch))
        zl_r = zl_r.at[:, idxs].set(_soa(qp.zl, 2, batch))
        zu_r = zu_r.at[:, idxs].set(_soa(qp.zu, 2, batch))
        lls_r = lls_r.at[:, idxs].set(_soa(qp.lls, 2, batch))
        lus_r = lus_r.at[:, idxs].set(_soa(qp.lus, 2, batch))
        soft_l = soft_l * mask_l
        soft_u = soft_u * mask_u

    return _ConSoA(Gx=Gx, Gu=Gu, lb=lb, ub=ub, mask_l=mask_l, mask_u=mask_u,
                   soft_l=soft_l, soft_u=soft_u, Zl=Zl_r, Zu=Zu_r,
                   zl=zl_r, zu=zu_r, lls=lls_r, lus=lus_r)


def _cvals(con: _ConSoA, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    u_full = jnp.concatenate([u, jnp.zeros_like(u[:1])], axis=0)
    return _smv(con.Gx, x) + _smv(con.Gu, u_full)


def _rollout(qp: _QpSoA, x0: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    def step(x, stage):
        A, B, b, u_i = stage
        return sm.mv(A, x) + sm.mv(B, u_i) + b, x
    xN, xs = lax.scan(step, x0, (qp.A, qp.B, qp.b, u))
    return jnp.concatenate([xs, xN[None]], axis=0)


def _objective(qp: _QpSoA, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    quad_x = 0.5 * jnp.sum(x * _smv(qp.Q, x), axis=(0, 1)) \
        + jnp.sum(qp.q * x, axis=(0, 1))
    quad_u = 0.5 * jnp.sum(u * _smv(qp.R, u), axis=(0, 1)) \
        + jnp.sum(qp.r * u, axis=(0, 1))
    cross = jnp.sum(u * _smv(qp.S, x[:-1]), axis=(0, 1))
    return quad_x + quad_u + cross


def ipm_solve_soa(
    qp: OcpQp,
    x0: jnp.ndarray,
    settings: IpmSettings = IpmSettings(),
    warm_start: Optional[OcpQpSolution] = None,
) -> Tuple[OcpQpSolution, IpmStatistics]:
    """Solve a BATCH of OCP-QPs in the TPU SoA layout.

    ``x0`` is [B, nx]; every array leaf of ``qp`` (and ``warm_start``) may
    carry a leading batch axis [B, ...] or be shared (unbatched — broadcast
    over scenarios). Returns (solution, statistics) with leading batch axes
    on every leaf, exactly the shapes ``vmap(ipm_solve)`` produces.
    """
    with jax.default_matmul_precision("float32"):
        return _ipm_solve_soa(qp, x0, settings, warm_start)


def _ipm_solve_soa(qp, x0, settings, warm_start):
    dims = qp.dims
    dtype = qp.A.dtype
    iter_max = settings.iter_max
    batch = x0.shape[0]
    x0s = sm.to_soa(jnp.asarray(x0, dtype))                 # [nx, B]
    qps = _qp_soa(qp, batch)

    def factorize(Q, S, R):
        # classical Riccati only (module docstring); settings.ric_alg is a
        # no-op here — the AoS oracle covers the square-root algorithm.
        return riccati_soa.factorize(qps.A, qps.B, Q, S, R,
                                     reg=settings.reg_prim)

    def finish(x, u, pi, P, p, K, k, stats):
        # SoA [..., B] -> batched AoS [B, ...] on every solution leaf
        sol = OcpQpSolution(
            x=jnp.moveaxis(x, -1, 0),
            u=jnp.moveaxis(u, -1, 0), pi=jnp.moveaxis(pi, -1, 0),
            P=jnp.moveaxis(P, -1, 0), p=jnp.moveaxis(p, -1, 0),
            K=jnp.moveaxis(K, -1, 0), k=jnp.moveaxis(k, -1, 0),
        )
        return sol, stats

    if not dims.has_constraints:
        fac = factorize(qps.Q, qps.S, qps.R)
        x, u, pi, p, k = riccati_soa.solve_vectors(
            fac, qps.A, qps.B, qps.b, qps.q, qps.r, x0s)
        r_dyn, r_sx, r_su = riccati_soa.kkt_residuals_soa(
            qps.A, qps.B, qps.b, qps.Q, qps.S, qps.R, qps.q, qps.r, x, u, pi)
        res_stat = jnp.maximum(jnp.max(jnp.abs(r_sx), axis=(0, 1)),
                               jnp.max(jnp.abs(r_su), axis=(0, 1)))
        res_eq = jnp.max(jnp.abs(r_dyn), axis=(0, 1))
        zeros = jnp.zeros((batch, iter_max + 1), dtype)
        # non-finite per-scenario solutions escaped every detector (there
        # is no loop): UNKNOWN_FAILURE, the reference wrapper's default
        # branch (ocp_qp_ipm_solver.cpp:406-413)
        finite = jnp.isfinite(jnp.sum(x, axis=(0, 1))
                              + jnp.sum(u, axis=(0, 1))
                              + jnp.sum(pi, axis=(0, 1)))
        stats = IpmStatistics(
            iter=jnp.zeros((batch,), jnp.int32),
            status=jnp.where(finite, int(IpmStatus.SUCCESS),
                             int(IpmStatus.UNKNOWN_FAILURE)
                             ).astype(jnp.int32),
            max_res_stat=res_stat, max_res_eq=res_eq,
            max_res_ineq=jnp.zeros((batch,), dtype),
            max_res_comp=jnp.zeros((batch,), dtype),
            alpha_aff=zeros, mu_aff=zeros, sigma=zeros,
            alpha_prim=zeros, alpha_dual=zeros, mu=zeros,
            res_stat=zeros.at[:, 0].set(res_stat),
            res_eq=zeros.at[:, 0].set(res_eq),
            res_ineq=zeros, res_comp=zeros,
            obj=zeros.at[:, 0].set(_objective(qps, x, u)),
            lin_res_stat=zeros.at[:, 0].set(res_stat),
            lin_res_eq=zeros.at[:, 0].set(res_eq),
            lin_res_ineq=zeros, lin_res_comp=zeros,
        )
        return finish(x, u, pi, fac.P, p, fac.K, k, stats)

    con = _build_constraints(qp, dims, x0s, batch)
    n_act = (jnp.sum(con.mask_l, axis=(0, 1)) + jnp.sum(con.mask_u, axis=(0, 1))
             + jnp.sum(con.soft_l, axis=(0, 1)) + jnp.sum(con.soft_u, axis=(0, 1)))
    n_act = jnp.maximum(n_act, 1.0)                          # [B]

    # --- initialization (identical to ipm.py, trailing lane) ---------------
    warm = settings.warm_start and warm_start is not None
    if warm:
        u_init = _soa(jnp.asarray(warm_start.u, dtype), 2, batch)
    else:
        u_init = jnp.zeros((dims.N, dims.nu, batch), dtype)
    x_init = _rollout(qps, x0s, u_init)
    v0 = _cvals(con, x_init, u_init)
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

    def compute_mu(it: _Iterate) -> jnp.ndarray:             # [B]
        return (jnp.sum(it.ll * it.sl * con.mask_l, axis=(0, 1))
                + jnp.sum(it.lu * it.su * con.mask_u, axis=(0, 1))
                + jnp.sum(it.mu_l * it.tb_l * con.soft_l, axis=(0, 1))
                + jnp.sum(it.mu_u * it.tb_u * con.soft_u, axis=(0, 1))) / n_act

    def _stat_residuals(it: _Iterate):
        lam = it.lu * con.mask_u - it.ll * con.mask_l        # [N+1, m, B]
        gx_lam = _smtv(con.Gx, lam)                          # [N+1, nx, B]
        gu_lam = _smtv(con.Gu, lam)[:-1]                     # [N, nu, B]
        r_dyn, r_sx, r_su = riccati_soa.kkt_residuals_soa(
            qps.A, qps.B, qps.b, qps.Q, qps.S, qps.R, qps.q, qps.r,
            it.x, it.u, it.pi)
        return r_dyn, r_sx + gx_lam, r_su + gu_lam

    def residual_norms(it: _Iterate):
        r_dyn, r_sx, r_su = _stat_residuals(it)
        v = _cvals(con, it.x, it.u)
        r_l = (v - con.lb + it.s_l * con.soft_l - it.sl) * con.mask_l
        r_u = (con.ub + it.s_u * con.soft_u - v - it.su) * con.mask_u
        r_bl = (it.s_l - con.lls - it.tb_l) * con.soft_l
        r_bu = (it.s_u - con.lus - it.tb_u) * con.soft_u
        r_ssl = (con.Zl * it.s_l + con.zl - it.ll - it.mu_l) * con.soft_l
        r_ssu = (con.Zu * it.s_u + con.zu - it.lu - it.mu_u) * con.soft_u

        def mx(a):
            return jnp.max(jnp.abs(a), axis=(0, 1))

        res_stat = jnp.maximum(jnp.maximum(mx(r_sx), mx(r_su)),
                               jnp.maximum(mx(r_ssl), mx(r_ssu)))
        res_eq = mx(r_dyn)
        res_ineq = jnp.maximum(jnp.maximum(mx(r_l), mx(r_u)),
                               jnp.maximum(mx(r_bl), mx(r_bu)))
        res_comp = jnp.maximum(
            jnp.maximum(mx(it.ll * it.sl * con.mask_l),
                        mx(it.lu * it.su * con.mask_u)),
            jnp.maximum(mx(it.mu_l * it.tb_l * con.soft_l),
                        mx(it.mu_u * it.tb_u * con.soft_u)))
        return ((r_dyn, r_sx, r_su, r_l, r_u, r_bl, r_bu, r_ssl, r_ssu),
                (res_stat, res_eq, res_ineq, res_comp))

    def max_step(val, dval, mask):                           # -> [B]
        neg = (dval < 0) & (mask > 0)
        ratio = jnp.where(neg, -val / jnp.where(neg, dval, -1.0), jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio, axis=(0, 1)))

    def soft_weights(it: _Iterate):
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

    def augment(W):
        """(Q,S,R) + G' diag(W) G, stage-wise in SoA."""
        Wx = W[:, :, None, :]                                # [N+1, m, 1, B]
        Q_aug = qps.Q + _smtm(con.Gx, con.Gx * Wx)
        R_aug = qps.R + _smtm(con.Gu[:-1], con.Gu[:-1] * Wx[:-1])
        S_aug = qps.S + _smtm(con.Gu[:-1], con.Gx[:-1] * Wx[:-1])
        return Q_aug, S_aug, R_aug

    def newton_direction(it: _Iterate, fac, rhs_c, resids):
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

        kap_l = jnp.where(con.soft_l > 0,
                          -rho_l + w_hl * Sig_l / w_tot_l, -rho_l)
        kap_u = jnp.where(con.soft_u > 0,
                          -rho_u + w_hu * Sig_u / w_tot_u, -rho_u)
        d = kap_u - kap_l
        q_add = _smtv(con.Gx, d)
        r_add = _smtv(con.Gu, d)[:-1]

        dx, du, dpi, _, _ = riccati_soa.solve_vectors(
            fac, qps.A, qps.B, r_dyn,
            r_sx + q_add, r_su + r_add, jnp.zeros_like(x0s),
        )
        du_full = jnp.concatenate([du, jnp.zeros_like(du[:1])], axis=0)
        Gdz = _smv(con.Gx, dx) + _smv(con.Gu, du_full)

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
        """[B] inf-norm residuals of the full Newton system at the
        computed direction — the SoA twin of ipm.linear_residual_norms
        (HPIPM lin_res_{stat,eq,ineq,comp},
        ocp_qp_ipm_solver_statistics.hpp:54-57)."""
        (r_dyn, r_sx, r_su, r_l, r_u, r_bl, r_bu, r_ssl, r_ssu) = resids
        rc_l, rc_u, rc_bl, rc_bu = rhs_c

        def mx(a):
            return jnp.max(jnp.abs(a), axis=(0, 1))

        lin_eq = d.x[1:] - _smv(qps.A, d.x[:-1]) - _smv(qps.B, d.u) - r_dyn
        dlam = d.lu * con.mask_u - d.ll * con.mask_l
        lin_sx = _smv(qps.Q, d.x) - d.pi + _smtv(con.Gx, dlam) + r_sx
        lin_sx = lin_sx.at[:-1].add(
            _smtv(qps.S, d.u) + _smtv(qps.A, d.pi[1:]))
        lin_su = (_smv(qps.R, d.u) + _smv(qps.S, d.x[:-1])
                  + _smtv(qps.B, d.pi[1:]) + _smtv(con.Gu, dlam)[:-1] + r_su)
        lin_ssl = (con.Zl * d.s_l - d.ll - d.mu_l + r_ssl) * con.soft_l
        lin_ssu = (con.Zu * d.s_u - d.lu - d.mu_u + r_ssu) * con.soft_u
        lin_stat = jnp.maximum(jnp.maximum(mx(lin_sx), mx(lin_su)),
                               jnp.maximum(mx(lin_ssl), mx(lin_ssu)))
        du_full = jnp.concatenate([d.u, jnp.zeros_like(d.u[:1])], axis=0)
        Gdz = _smv(con.Gx, d.x) + _smv(con.Gu, du_full)
        lin_l = (Gdz + d.s_l * con.soft_l - d.sl + r_l) * con.mask_l
        lin_u = (-Gdz + d.s_u * con.soft_u - d.su + r_u) * con.mask_u
        lin_bl = (d.s_l - d.tb_l + r_bl) * con.soft_l
        lin_bu = (d.s_u - d.tb_u + r_bu) * con.soft_u
        lin_ineq = jnp.maximum(jnp.maximum(mx(lin_l), mx(lin_u)),
                               jnp.maximum(mx(lin_bl), mx(lin_bu)))
        lin_cl = (it.ll * d.sl + it.sl * d.ll + rc_l) * con.mask_l
        lin_cu = (it.lu * d.su + it.su * d.lu + rc_u) * con.mask_u
        lin_cbl = (it.mu_l * d.tb_l + it.tb_l * d.mu_l + rc_bl) * con.soft_l
        lin_cbu = (it.mu_u * d.tb_u + it.tb_u * d.mu_u + rc_bu) * con.soft_u
        lin_comp = jnp.maximum(jnp.maximum(mx(lin_cl), mx(lin_cu)),
                               jnp.maximum(mx(lin_cbl), mx(lin_cbu)))
        return lin_stat, mx(lin_eq), lin_ineq, lin_comp

    def one_iteration(it: _Iterate):
        resids, _ = residual_norms(it)
        mu = compute_mu(it)                                  # [B]

        _, _, _, _, w_eff_l, w_eff_u = soft_weights(it)
        Q_aug, S_aug, R_aug = augment(w_eff_l + w_eff_u)
        fac = factorize(Q_aug, S_aug, R_aug)

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
        a_aff = jnp.minimum(ap_aff, ad_aff)                  # [B]
        aa = a_aff[None, None]
        mu_aff = (
            jnp.sum((it.ll + aa * d_aff.ll) * (it.sl + aa * d_aff.sl)
                    * con.mask_l, axis=(0, 1))
            + jnp.sum((it.lu + aa * d_aff.lu) * (it.su + aa * d_aff.su)
                      * con.mask_u, axis=(0, 1))
            + jnp.sum((it.mu_l + aa * d_aff.mu_l) * (it.tb_l + aa * d_aff.tb_l)
                      * con.soft_l, axis=(0, 1))
            + jnp.sum((it.mu_u + aa * d_aff.mu_u) * (it.tb_u + aa * d_aff.tb_u)
                      * con.soft_u, axis=(0, 1))
        ) / n_act
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
        sg = (sigma * mu)[None, None]

        if settings.pred_corr:
            rc = (rc_aff[0] + (d_aff.ll * d_aff.sl - sg) * con.mask_l,
                  rc_aff[1] + (d_aff.lu * d_aff.su - sg) * con.mask_u,
                  rc_aff[2] + (d_aff.mu_l * d_aff.tb_l - sg) * con.soft_l,
                  rc_aff[3] + (d_aff.mu_u * d_aff.tb_u - sg) * con.soft_u)
        else:
            rc = (rc_aff[0] - sg * con.mask_l, rc_aff[1] - sg * con.mask_u,
                  rc_aff[2] - sg * con.soft_l, rc_aff[3] - sg * con.soft_u)
        d = newton_direction(it, fac, rc, resids)

        tau = jnp.asarray(_FRAC_TO_BOUND, dtype)
        ap, ad = joint_max_step(d)
        a_slack, a_dual = tau * ap, tau * ad
        if settings.split_step:
            a_prim, a_du = a_slack, a_dual
        else:
            a = jnp.minimum(a_slack, a_dual)
            a_prim, a_du = a, a
        apr, adu = a_prim[None, None], a_du[None, None]

        new_it = _Iterate(
            x=it.x + apr * d.x,
            u=it.u + apr * d.u,
            pi=it.pi + adu * d.pi,
            sl=jnp.where(con.mask_l > 0, it.sl + apr * d.sl, 1.0),
            su=jnp.where(con.mask_u > 0, it.su + apr * d.su, 1.0),
            ll=jnp.where(con.mask_l > 0, it.ll + adu * d.ll, 0.0),
            lu=jnp.where(con.mask_u > 0, it.lu + adu * d.lu, 0.0),
            s_l=jnp.where(con.soft_l > 0, it.s_l + apr * d.s_l, 0.0),
            s_u=jnp.where(con.soft_u > 0, it.s_u + apr * d.s_u, 0.0),
            tb_l=jnp.where(con.soft_l > 0, it.tb_l + apr * d.tb_l, 1.0),
            tb_u=jnp.where(con.soft_u > 0, it.tb_u + apr * d.tb_u, 1.0),
            mu_l=jnp.where(con.soft_l > 0, it.mu_l + adu * d.mu_l, 0.0),
            mu_u=jnp.where(con.soft_u > 0, it.mu_u + adu * d.mu_u, 0.0),
        )
        l_st, l_eq, l_iq, l_cp = linear_residual_norms(it, d, rc, resids)
        per_iter = dict(alpha_aff=a_aff, mu_aff=mu_aff, sigma=sigma,
                        alpha_prim=a_prim, alpha_dual=a_du,
                        lin_res_stat=l_st, lin_res_eq=l_eq,
                        lin_res_ineq=l_iq, lin_res_comp=l_cp)
        return new_it, per_iter

    # --- main loop (per-scenario masking) -----------------------------------
    stat_cols = ("alpha_aff", "mu_aff", "sigma", "alpha_prim", "alpha_dual",
                 "mu", "res_stat", "res_eq", "res_ineq", "res_comp", "obj",
                 "lin_res_stat", "lin_res_eq", "lin_res_ineq",
                 "lin_res_comp")
    zeros_hist = {c: jnp.zeros((iter_max + 1, batch), dtype) for c in stat_cols}

    def full_objective(it: _Iterate):
        pen = (jnp.sum((0.5 * con.Zl * it.s_l + con.zl) * it.s_l * con.soft_l,
                       axis=(0, 1))
               + jnp.sum((0.5 * con.Zu * it.s_u + con.zu) * it.s_u * con.soft_u,
                         axis=(0, 1)))
        return _objective(qps, it.x, it.u) + pen

    def record(hist, i, it: _Iterate, extra, active):
        _, (rs, re, ri, rc) = residual_norms(it)
        vals = dict(mu=compute_mu(it), res_stat=rs, res_eq=re, res_ineq=ri,
                    res_comp=rc, obj=full_objective(it), **extra)
        return {c: hist[c].at[i].set(
            jnp.where(active, vals.get(c, jnp.zeros((batch,), dtype)),
                      hist[c][i]))
            for c in stat_cols}

    def converged(it: _Iterate):                             # [B] bool
        if settings.mode is IpmMode.SPEED_ABS:
            return compute_mu(it) < settings.tol_comp
        _, (rs, re, ri, rc) = residual_norms(it)
        return ((rs < settings.tol_stat) & (re < settings.tol_eq)
                & (ri < settings.tol_ineq) & (rc < settings.tol_comp))

    def active_mask(it, status):
        return (status == int(IpmStatus.MAX_ITER_REACHED)) \
            & jnp.logical_not(converged(it))

    def cond(carry):
        it, i, hist, status = carry
        return (i < iter_max) & jnp.any(active_mask(it, status))

    def body(carry):
        it, i, hist, status = carry
        active = active_mask(it, status)                     # [B]
        new_it, extra = one_iteration(it)
        nan = jnp.logical_not(jnp.isfinite(
            jnp.sum(new_it.x, axis=(0, 1)) + jnp.sum(new_it.u, axis=(0, 1))
            + jnp.sum(new_it.ll, axis=(0, 1)) + jnp.sum(new_it.lu, axis=(0, 1))
            + jnp.sum(new_it.s_l, axis=(0, 1)) + jnp.sum(new_it.mu_l, axis=(0, 1))
            + jnp.sum(new_it.s_u, axis=(0, 1)) + jnp.sum(new_it.mu_u, axis=(0, 1))))
        tiny = jnp.maximum(extra["alpha_prim"], extra["alpha_dual"]) \
            < settings.alpha_min
        new_status = jnp.where(
            active & nan, int(IpmStatus.NAN_DETECTED),
            jnp.where(active & tiny, int(IpmStatus.MIN_STEP_LENGTH_REACHED),
                      status)).astype(jnp.int32)
        # frozen scenarios (and NaN blow-ups) keep their old iterate
        keep = jnp.logical_not(active) | nan                 # [B]
        new_it = jax.tree.map(
            lambda new, old: jnp.where(keep[(None,) * (new.ndim - 1)], old, new),
            new_it, it)
        extra = {k: jnp.where(active, v, 0.0) for k, v in extra.items()}
        hist = record(hist, i + 1, new_it, extra, active)
        return (new_it, i + 1, hist, new_status)

    all_active = jnp.ones((batch,), bool)
    hist0 = record(zeros_hist, 0, it0,
                   dict(alpha_aff=jnp.zeros((batch,), dtype),
                        mu_aff=jnp.zeros((batch,), dtype),
                        sigma=jnp.zeros((batch,), dtype),
                        alpha_prim=jnp.zeros((batch,), dtype),
                        alpha_dual=jnp.zeros((batch,), dtype)),
                   all_active)
    status0 = jnp.full((batch,), int(IpmStatus.MAX_ITER_REACHED), jnp.int32)
    # per-scenario iteration counts: a scenario's count stops increasing
    # once it leaves the active set, so track it alongside the loop index
    def body_with_iters(carry):
        (it, i, hist, status), iters = carry
        active = active_mask(it, status)
        new_carry = body((it, i, hist, status))
        return (new_carry, iters + active.astype(jnp.int32))

    def cond_with_iters(carry):
        return cond(carry[0])

    (it_f, _, hist, status), n_iter = lax.while_loop(
        cond_with_iters, body_with_iters,
        ((it0, 0, hist0, status0), jnp.zeros((batch,), jnp.int32)))

    status = jnp.where(
        (status == int(IpmStatus.MAX_ITER_REACHED)) & converged(it_f),
        jnp.asarray(int(IpmStatus.SUCCESS), jnp.int32), status)
    # catch-all for per-scenario non-finite final iterates none of the
    # in-loop detectors classified (cf. ipm.py): UNKNOWN_FAILURE
    finite_f = jnp.isfinite(jnp.sum(it_f.x, axis=(0, 1))
                            + jnp.sum(it_f.u, axis=(0, 1))
                            + jnp.sum(it_f.pi, axis=(0, 1)))
    status = jnp.where(
        jnp.logical_not(finite_f) & (status != int(IpmStatus.NAN_DETECTED)),
        jnp.asarray(int(IpmStatus.UNKNOWN_FAILURE), jnp.int32), status)

    # final factorization for the Riccati solution surface (cf. ipm.py)
    _, _, _, _, w_eff_l_f, w_eff_u_f = soft_weights(it_f)
    Q_aug, S_aug, R_aug = augment(w_eff_l_f + w_eff_u_f)
    lam = it_f.lu * con.mask_u - it_f.ll * con.mask_l
    q_aug = qps.q + _smtv(con.Gx, lam)
    r_aug = qps.r + _smtv(con.Gu, lam)[:-1]
    fac_f = factorize(Q_aug, S_aug, R_aug)
    _, _, _, p_f, k_f = riccati_soa.solve_vectors(
        fac_f, qps.A, qps.B, qps.b, q_aug, r_aug, x0s)

    _, (rs, re, ri, rc) = residual_norms(it_f)
    stats = IpmStatistics(
        iter=n_iter, status=status,
        max_res_stat=rs, max_res_eq=re, max_res_ineq=ri, max_res_comp=rc,
        **{c: jnp.moveaxis(hist[c], 0, 1) for c in hist},    # -> [B, iters+1]
    )
    return finish(it_f.x, it_f.u, it_f.pi, fac_f.P, p_f, fac_f.K, k_f, stats)
