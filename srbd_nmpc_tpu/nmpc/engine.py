"""SQP NMPC engine: linearize -> Riccati QP solve -> filter line search.

TPU-native re-design of ``NMPCSolver`` (/root/reference/NMPC_solver.{h,cpp}):
a pure-functional SQP iteration over a pytree state, written for ONE
scenario and `vmap`ped over arbitrarily large scenario batches (the
reference is strictly single-problem, single-threaded).

Key semantic parity points (with knowing deviations flagged):

- QP in delta form: the QP solves (dx, du) around the current trajectory
  with initial state ``x0 - x[0]`` (NMPC_solver.cpp:320).
- Inequalities enter ONLY through the relaxed log-barrier's gradient and
  Hessian on the input cost (R_eff, r_eff — NMPC_solver.cpp:308-309); the
  QP itself is equality-constrained, so one Riccati factorization solves it
  exactly (hence the reference's `iter==0` unconstrained IPM path).
- Filter line search follows NMPC_solver.cpp:149-274 including the
  *persistent* step size: ``alpha`` is carried across SQP iterations and
  never reset (NMPC_solver.h:104) — reproduced when
  ``persistent_alpha=True`` (default, parity); ``False`` resets alpha to 1
  each SQP iteration (usually converges in fewer iterations).
- Convergence test: ``dphi > -1e-3 and theta < 1e-6`` (NMPC_solver.cpp:267).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.ocpqp.data import OcpQp
from srbd_nmpc_tpu.ops.barrier import relaxed_log_barrier
from srbd_nmpc_tpu.ops.riccati import lqr_solve


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NmpcConfig:
    """Static engine configuration.

    Line-search constants are the reference's hardcoded members
    (NMPC_solver.h:97-104); barrier weights come from the YAML
    (mu_b/theta_b, config/mpc_option.yaml:17-18).
    """

    N: int = _static(default=20)
    sqp_max_iter: int = _static(default=15)
    mu_barrier: float = _static(default=0.1)
    theta_barrier: float = _static(default=5.0)
    sensitivity: str = _static(default="euler")

    theta_max: float = _static(default=1e-6)
    theta_min: float = _static(default=5e-10)
    eta: float = _static(default=1e-4)
    beta_phi: float = _static(default=1e-6)
    beta_theta: float = _static(default=1e-6)
    beta_alpha: float = _static(default=0.5)
    alpha_min: float = _static(default=1e-4)
    persistent_alpha: bool = _static(default=True)

    # QP solve knobs (TPU additions; reg matches reg_prim=1e-12 in
    # NMPC_solver.cpp:78 in spirit — tiny SPD safeguard).
    reg: float = _static(default=1e-9)
    refine: int = _static(default=0)

    # Convergence thresholds (NMPC_solver.cpp:267)
    conv_dphi: float = _static(default=-1e-3)
    conv_theta: float = _static(default=1e-6)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NmpcWeights:
    """Cost weights. Built as the reference does (NMPC_solver.cpp:55-58):
    Q = diag(Q_yaml), R = R_yaml * I, Qf = N * diag(Qf_yaml)."""

    Q: jnp.ndarray   # [nx, nx]
    R: jnp.ndarray   # [nu, nu]
    Qf: jnp.ndarray  # [nx, nx]

    @staticmethod
    def create(Q_diag, R_scalar, Qf_diag, N: int, dtype=jnp.float32) -> "NmpcWeights":
        return NmpcWeights(
            Q=jnp.diag(jnp.asarray(Q_diag, dtype)),
            R=jnp.asarray(R_scalar, dtype) * jnp.eye(srbd.NU, dtype=dtype),
            Qf=jnp.asarray(N, dtype) * jnp.diag(jnp.asarray(Qf_diag, dtype)),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NmpcState:
    """Per-scenario SQP iterate: trajectories + persistent step size."""

    x: jnp.ndarray      # [N+1, nx]
    u: jnp.ndarray      # [N, nu]
    alpha: jnp.ndarray  # []

    @staticmethod
    def initial(N: int, dtype=jnp.float32) -> "NmpcState":
        """x = 0, u = 100 (NMPC_solver.cpp:60-64), alpha = 1 (NMPC_solver.h:104)."""
        return NmpcState(
            x=jnp.zeros((N + 1, srbd.NX), dtype),
            u=100.0 * jnp.ones((N, srbd.NU), dtype),
            alpha=jnp.asarray(1.0, dtype),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NmpcInfo:
    """Diagnostics, superset of printOptimizationInfo's data
    (NMPC_solver.cpp:113-141)."""

    converged: jnp.ndarray       # [] bool
    sqp_iters: jnp.ndarray       # [] int32
    theta: jnp.ndarray           # [] — equality-constraint merit
    phi: jnp.ndarray             # [] — cost merit
    dphi: jnp.ndarray            # [] — directional derivative
    alpha: jnp.ndarray           # [] — final step size
    max_defect: jnp.ndarray      # [] — max |dynamics defect|
    min_constraint: jnp.ndarray  # [] — most-negative friction-cone value


def merit(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
          x: jnp.ndarray, u: jnp.ndarray, x_ref: jnp.ndarray,
          with_grad: bool = False):
    """Merit pair (theta, phi) and optionally their gradients.

    theta = 1/2 sum_k ||f_k||^2 (shooting defects); phi = tracking + barrier
    + input cost. Ref: linearSearch merit accumulation NMPC_solver.cpp:152-189.
    Stage loop is vmapped; reductions are jnp.sum (become psum when sharded).
    """
    Ac, bc = srbd.constraint_matrix(params)

    defects = jax.vmap(lambda xk, xk1, uk: srbd.shooting_defect(params, xk, xk1, uk))(
        x[:-1], x[1:], u
    )
    theta = 0.5 * jnp.sum(defects * defects)

    ex = x - x_ref                                   # [N+1, nx]
    Qx = ex[:-1] @ weights.Q                         # rows k < N
    phi_x = 0.5 * jnp.sum(ex[:-1] * Qx)
    eN = ex[-1]
    phi_N = 0.5 * eN @ weights.Qf @ eN

    con = u @ Ac.T + bc                              # [N, 24]
    b_bar, db_bar, _ = relaxed_log_barrier(con, cfg.mu_barrier, cfg.theta_barrier)
    Ru = u @ weights.R
    phi_u = jnp.sum(b_bar) + 0.5 * jnp.sum(u * Ru)

    phi = phi_x + phi_N + phi_u
    if not with_grad:
        return theta, phi, defects, con
    Jphi_x = jnp.concatenate([Qx, (weights.Qf @ eN)[None]], axis=0)  # [N+1, nx]
    Jphi_u = db_bar @ Ac + Ru                                        # [N, nu]
    return theta, phi, defects, con, Jphi_x, Jphi_u


def linearize(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
              state: NmpcState, x_ref: jnp.ndarray) -> OcpQp:
    """Build the delta-form OCP-QP around the current trajectory.

    Ref: prepareQpStructures (NMPC_solver.cpp:276-314) — dynamics rows from
    the shooting linearization, barrier curvature folded into (R_eff, r_eff),
    no hard constraint rows.
    """
    dtype = state.x.dtype
    N = cfg.N

    A, B, b, _ = jax.vmap(
        lambda xk, xk1, uk: srbd.linearize_shooting(params, xk, xk1, uk, cfg.sensitivity)
    )(state.x[:-1], state.x[1:], state.u)

    Ac, bc = srbd.constraint_matrix(params)
    con = state.u @ Ac.T + bc                           # [N, 24]
    _, db, ddb = relaxed_log_barrier(con, cfg.mu_barrier, cfg.theta_barrier)

    # R_eff_k = R + Ac' diag(ddb_k) Ac ; r_eff_k = R u_k + Ac' db_k
    R_eff = weights.R[None] + jnp.einsum("gi,ng,gj->nij", Ac, ddb, Ac)
    r_eff = state.u @ weights.R + db @ Ac

    ex = state.x - x_ref
    Q = jnp.concatenate(
        [jnp.broadcast_to(weights.Q, (N, srbd.NX, srbd.NX)), weights.Qf[None]], axis=0
    )
    q = jnp.concatenate([ex[:-1] @ weights.Q, (weights.Qf @ ex[-1])[None]], axis=0)

    return OcpQp(
        A=A, B=B, b=b,
        Q=Q, q=q,
        S=jnp.zeros((N, srbd.NU, srbd.NX), dtype),
        R=R_eff, r=r_eff,
    )


def _line_search(params, weights, cfg, state: NmpcState, x_ref,
                 dx, du, theta0, phi0, dphi):
    """Backtracking filter line search, sequential like the reference
    (NMPC_solver.cpp:200-264) but as a `lax.while_loop` so a vmapped batch
    runs only as many merit evaluations as its slowest scenario needs."""
    dtype = state.x.dtype
    theta_max = jnp.asarray(cfg.theta_max, dtype)
    theta_min = jnp.asarray(cfg.theta_min, dtype)

    def accept(theta_a, phi_a, alpha):
        case_infeasible = theta_a > theta_max
        acc_infeasible = theta_a < (1.0 - cfg.beta_theta) * theta0
        case_small = (jnp.maximum(theta_a, theta0) < theta_min) & (dphi < 0.0)
        acc_small = phi_a < phi0 + cfg.eta * alpha * dphi
        acc_mixed = (phi_a < phi0 - cfg.beta_phi * theta0) | (
            theta_a < (1.0 - cfg.beta_theta) * theta0
        )
        return jnp.where(
            case_infeasible, acc_infeasible, jnp.where(case_small, acc_small, acc_mixed)
        )

    def cond(carry):
        alpha, accepted, _, _ = carry
        return (alpha > cfg.alpha_min) & jnp.logical_not(accepted)

    def body(carry):
        alpha, _, _, _ = carry
        x_a = state.x + alpha * dx
        u_a = state.u + alpha * du
        theta_a, phi_a, _, _ = merit(params, weights, cfg, x_a, u_a, x_ref)
        ok = accept(theta_a, phi_a, alpha)
        new_alpha = jnp.where(ok, alpha, cfg.beta_alpha * alpha)
        return (new_alpha, ok, jnp.where(ok, alpha, jnp.nan), ok)

    alpha0 = state.alpha if cfg.persistent_alpha else jnp.asarray(1.0, dtype)
    init = (alpha0, jnp.asarray(False), jnp.asarray(jnp.nan, dtype), jnp.asarray(False))
    alpha_f, accepted, alpha_acc, _ = lax.while_loop(cond, body, init)

    step = jnp.where(accepted, alpha_acc, 0.0)
    x_new = state.x + step * dx
    u_new = state.u + step * du
    return NmpcState(x=x_new, u=u_new, alpha=alpha_f)


def sqp_step(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
             state: NmpcState, x0: jnp.ndarray, x_ref: jnp.ndarray
             ) -> Tuple[NmpcState, NmpcInfo]:
    """One SQP iteration: linearize, QP-solve, line-search, convergence test.

    Ref: the body of the SQP loop (NMPC_solver.cpp:367-374) plus
    checkConvergence/linearSearch (:143-274).
    """
    qp = linearize(params, weights, cfg, state, x_ref)
    sol = lqr_solve(qp, x0 - state.x[0], reg=cfg.reg, refine=cfg.refine)
    dx, du = sol.x, sol.u

    theta0, phi0, defects, con, Jphi_x, Jphi_u = merit(
        params, weights, cfg, state.x, state.u, x_ref, with_grad=True
    )
    dphi = jnp.sum(dx * Jphi_x) + jnp.sum(du * Jphi_u)

    new_state = _line_search(
        params, weights, cfg, state, x_ref, dx, du, theta0, phi0, dphi
    )
    converged = (dphi > cfg.conv_dphi) & (theta0 < cfg.conv_theta)
    info = NmpcInfo(
        converged=converged,
        sqp_iters=jnp.asarray(1, jnp.int32),
        theta=theta0, phi=phi0, dphi=dphi, alpha=new_state.alpha,
        max_defect=jnp.max(jnp.abs(defects)),
        min_constraint=jnp.min(con),
    )
    return new_state, info


def solve(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
          state: NmpcState, x0: jnp.ndarray, x_ref: jnp.ndarray
          ) -> Tuple[NmpcState, NmpcInfo]:
    """Full NMPC solve: SQP iterations until convergence or sqp_max_iter.

    Ref: the per-repetition work of controlLoop (NMPC_solver.cpp:359-375).
    Implemented as `lax.while_loop` so a converged scenario stops paying for
    iterations (under vmap, the batch runs until its slowest member is done,
    exactly like the reference's early `break`).
    """

    def cond(carry):
        _, info, it = carry
        return (it < cfg.sqp_max_iter) & jnp.logical_not(info.converged)

    def body(carry):
        state, info, it = carry
        new_state, step_info = sqp_step(params, weights, cfg, state, x0, x_ref)
        new_info = dataclasses.replace(step_info, sqp_iters=it + 1)
        return (new_state, new_info, it + 1)

    dummy = NmpcInfo(
        converged=jnp.asarray(False),
        sqp_iters=jnp.asarray(0, jnp.int32),
        theta=jnp.asarray(jnp.inf, state.x.dtype),
        phi=jnp.asarray(jnp.inf, state.x.dtype),
        dphi=jnp.asarray(-jnp.inf, state.x.dtype),
        alpha=state.alpha,
        max_defect=jnp.asarray(jnp.inf, state.x.dtype),
        min_constraint=jnp.asarray(-jnp.inf, state.x.dtype),
    )
    state_f, info_f, _ = lax.while_loop(cond, body, (state, dummy, jnp.asarray(0, jnp.int32)))
    return state_f, info_f


def make_benchmark_problem(cfg: NmpcConfig, dtype=jnp.float32):
    """The reference benchmark scenario: stance with a yaw/forward/height
    reference step. Ref: setupDynamics/setupReference (NMPC_solver.cpp:332-351)."""
    x0 = jnp.zeros(srbd.NX, dtype).at[8].set(1.0)
    x_ref_k = jnp.zeros(srbd.NX, dtype).at[2].set(0.2).at[6].set(0.5).at[8].set(1.0)
    x_ref = jnp.broadcast_to(x_ref_k, (cfg.N + 1, srbd.NX))
    return x0, x_ref
