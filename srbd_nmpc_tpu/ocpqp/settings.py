"""IPM solver settings, modes, and status codes.

Parity surface with the reference
(/root/reference/hpipm-cpp/include/hpipm-cpp/ocp_qp_ipm_solver_settings.hpp:10-92
and ocp_qp_ipm_solver.hpp:24-30), redesigned as a frozen dataclass whose
fields are static (Python) values — they parameterize the jitted solver and
never become traced arrays, so each settings combination compiles once.
"""

from __future__ import annotations

import dataclasses
import enum


class IpmMode(enum.Enum):
    """Solver presets. Ref: ``HpipmMode`` (ocp_qp_ipm_solver_settings.hpp:10-15).

    The presets fix default tolerances/mu0 the same way HPIPM's
    ``d_ocp_qp_ipm_arg_set_default`` does for each mode; explicit settings
    fields always override the preset. Two modes also change BEHAVIOR, as
    in HPIPM:

    - ``SPEED_ABS`` exits on the ABSOLUTE duality measure only
      (``mu < tol_comp``), skipping the per-iteration KKT residual test —
      HPIPM's ``abs_form`` fast path (``d_ocp_qp_ipm_arg_set_default``).
    - ``ROBUST`` defaults to the square-root Riccati factorization
      (``ric_alg=True``) and a larger primal regularization — HPIPM's
      numerically conservative preset.
    """

    SPEED_ABS = "speed_abs"
    SPEED = "speed"
    BALANCE = "balance"
    ROBUST = "robust"


class IpmStatus(enum.IntEnum):
    """Solve status. Ref: ``HpipmStatus`` (ocp_qp_ipm_solver.hpp:24-30).

    Integer codes match HPIPM's (0..3) so logged statuses are comparable.
    """

    SUCCESS = 0
    MAX_ITER_REACHED = 1
    MIN_STEP_LENGTH_REACHED = 2
    NAN_DETECTED = 3
    UNKNOWN_FAILURE = 4


# Per-mode defaults, mirroring HPIPM's mode presets (the subset of knobs the
# reference surface exposes; hpipm_d_ocp_qp_ipm.h `..._arg_set_default`).
_MODE_DEFAULTS = {
    IpmMode.SPEED_ABS: dict(iter_max=15, mu0=1e0, tol_stat=1e-6, tol_eq=1e-6,
                            tol_ineq=1e-6, tol_comp=1e-6, pred_corr=True),
    IpmMode.SPEED: dict(iter_max=15, mu0=1e0, tol_stat=1e-6, tol_eq=1e-6,
                        tol_ineq=1e-6, tol_comp=1e-6, pred_corr=True),
    IpmMode.BALANCE: dict(iter_max=30, mu0=1e1, tol_stat=1e-8, tol_eq=1e-8,
                          tol_ineq=1e-8, tol_comp=1e-8, pred_corr=True),
    IpmMode.ROBUST: dict(iter_max=100, mu0=1e2, tol_stat=1e-8, tol_eq=1e-8,
                         tol_ineq=1e-8, tol_comp=1e-8, pred_corr=True,
                         ric_alg=True, reg_prim=1e-10),
}


@dataclasses.dataclass(frozen=True)
class IpmSettings:
    """Interior-point solver settings.

    Field-for-field parity with the reference struct
    (ocp_qp_ipm_solver_settings.hpp:21-91). ``ric_alg`` selects between the
    classical (False) and square-root (True) Riccati factorization, as in
    HPIPM; both produce the same solution. The classical one is the
    default, matching the reference NMPC (ric_alg=0, NMPC_solver.cpp:81);
    the square-root path runs the structured pre-array recursion
    (ops.riccati.riccati_factorize_sqrt_con) inside the constrained IPM.
    """

    mode: IpmMode = IpmMode.SPEED
    iter_max: int = 15
    alpha_min: float = 1.0e-8
    mu0: float = 1.0e2
    tol_stat: float = 1.0e-8
    tol_eq: float = 1.0e-8
    tol_ineq: float = 1.0e-8
    tol_comp: float = 1.0e-8
    reg_prim: float = 1.0e-12
    warm_start: bool = False
    pred_corr: bool = True
    ric_alg: bool = False
    split_step: bool = False

    @staticmethod
    def preset(mode: IpmMode, **overrides) -> "IpmSettings":
        """Mode preset + explicit overrides — the semantics of HPIPM's
        ``d_ocp_qp_ipm_arg_set_default(mode)`` followed by individual
        setters (ocp_qp_ipm_solver.cpp:102-116)."""
        base = dict(_MODE_DEFAULTS[mode])
        base["mode"] = mode
        base.update(overrides)
        return IpmSettings(**base)

    def check(self) -> None:
        """Validate. Ref: ``checkSettings`` (src/ocp_qp_ipm_solver_settings.cpp:7-38)."""
        if self.iter_max < 0:
            raise ValueError("IpmSettings.iter_max must be non-negative")
        if not (0.0 < self.alpha_min < 1.0):
            raise ValueError("IpmSettings.alpha_min must be in (0, 1)")
        if self.mu0 <= 0.0:
            raise ValueError("IpmSettings.mu0 must be positive")
        for name in ("tol_stat", "tol_eq", "tol_ineq", "tol_comp"):
            if getattr(self, name) <= 0.0:
                raise ValueError(f"IpmSettings.{name} must be positive")
        if self.reg_prim < 0.0:
            raise ValueError("IpmSettings.reg_prim must be non-negative")
