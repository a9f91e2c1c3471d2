"""Per-solve IPM statistics.

Parity with ``hpipm::OcpQpIpmSolverStatistics``
(/root/reference/hpipm-cpp/include/hpipm-cpp/ocp_qp_ipm_solver_statistics.hpp:15-78
and the 18-column stat harvest at ocp_qp_ipm_solver.cpp:381-403), redesigned
as fixed-length arrays (length ``iter_max + 1``) so a batch of solves keeps
static shapes: entries past ``iter`` are zero. ``lq_fact``/``itref_*``
columns exist in HPIPM to time BLASFEO factorizations; on TPU a fused jitted
solve has no per-iteration host timers, so they are reported as zeros (use
``jax.profiler`` traces for kernel-level timing instead). The
``lin_res_{stat,eq,ineq,comp}`` columns (hpp:54-57) ARE computed: the
inf-norm residuals of the Newton linear system at the computed step — the
backsolve error of the factorized KKT solve, i.e. the diagnostic that
drives iterative refinement in low precision.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IpmStatistics:
    """IPM iteration statistics. All per-iteration arrays have static length
    ``iter_max + 1`` (row i = state after iteration i; row 0 = initial point).
    """

    iter: jnp.ndarray            # [] int32 — iterations taken
    status: jnp.ndarray          # [] int32 — IpmStatus code
    max_res_stat: jnp.ndarray    # [] — final stationarity residual (inf-norm)
    max_res_eq: jnp.ndarray      # [] — final dynamics residual
    max_res_ineq: jnp.ndarray    # [] — final inequality residual
    max_res_comp: jnp.ndarray    # [] — final complementarity residual

    alpha_aff: jnp.ndarray       # [iter_max+1] — affine (predictor) step size
    mu_aff: jnp.ndarray          # [iter_max+1] — affine complementarity measure
    sigma: jnp.ndarray           # [iter_max+1] — Mehrotra centering parameter
    alpha_prim: jnp.ndarray      # [iter_max+1] — primal step size
    alpha_dual: jnp.ndarray      # [iter_max+1] — dual step size
    mu: jnp.ndarray              # [iter_max+1] — complementarity measure
    res_stat: jnp.ndarray        # [iter_max+1]
    res_eq: jnp.ndarray          # [iter_max+1]
    res_ineq: jnp.ndarray        # [iter_max+1]
    res_comp: jnp.ndarray        # [iter_max+1]
    obj: jnp.ndarray             # [iter_max+1] — QP objective at the iterate
    # Newton linear-system residuals at the computed (corrector) step —
    # the backsolve error of the factorized KKT solve
    # (ocp_qp_ipm_solver_statistics.hpp:54-57, harvest at
    # src/ocp_qp_ipm_solver.cpp:396-398). Row i = the step taken at
    # iteration i; row 0 is zero (no step yet), except the unconstrained
    # path where row 0 holds the single Riccati solve's KKT residuals.
    lin_res_stat: jnp.ndarray    # [iter_max+1]
    lin_res_eq: jnp.ndarray      # [iter_max+1]
    lin_res_ineq: jnp.ndarray    # [iter_max+1]
    lin_res_comp: jnp.ndarray    # [iter_max+1]

    def pretty(self) -> str:
        """Human-readable table, mirroring ``disp``
        (src/ocp_qp_ipm_solver_statistics.cpp)."""
        n = int(self.iter) + 1
        hdr = (f"ipm iterations: {int(self.iter)}  status: {int(self.status)}\n"
               f"max_res_stat: {float(self.max_res_stat):.3e}  "
               f"max_res_eq: {float(self.max_res_eq):.3e}  "
               f"max_res_ineq: {float(self.max_res_ineq):.3e}  "
               f"max_res_comp: {float(self.max_res_comp):.3e}\n")
        cols = ["alpha_aff", "mu_aff", "sigma", "alpha_prim", "alpha_dual",
                "mu", "res_stat", "res_eq", "res_ineq", "res_comp", "obj",
                "lin_res_stat", "lin_res_eq", "lin_res_ineq", "lin_res_comp"]
        lines = ["iter  " + "  ".join(f"{c:>10s}" for c in cols)]
        for i in range(n):
            vals = [float(getattr(self, c)[i]) for c in cols]
            lines.append(f"{i:4d}  " + "  ".join(f"{v:10.3e}" for v in vals))
        return hdr + "\n".join(lines)
