"""SQP NMPC engine: linearize -> Riccati QP solve -> filter line search.

TPU-native re-design of ``NMPCSolver`` (/root/reference/NMPC_solver.{h,cpp}):
a pure-functional SQP iteration over a pytree state. All functions are
RANK-POLYMORPHIC: they accept a single scenario (``x [N+1,nx]``) or a
leading scenario batch (``x [B,N+1,nx]``) — the batched path routes the QP
solve through the SoA ("batch-in-lanes") Riccati kernel
(ops.riccati_soa), which is the speed-of-light layout for 12x12 stage
matrices on TPU, and runs the SQP/line-search loops with per-scenario
masks (each scenario follows exactly the sequential reference semantics;
the batch runs until its slowest member finishes, like vmap-of-while).

Key semantic parity points (deviations flagged):
- QP in delta form: the QP solves (dx, du) around the current trajectory
  with initial state ``x0 - x[0]`` (NMPC_solver.cpp:320).
- Inequalities enter ONLY through the relaxed log-barrier's gradient and
  Hessian on the input cost (R_eff, r_eff — NMPC_solver.cpp:308-309); the
  QP itself is equality-constrained, so one Riccati factorization solves
  it exactly (the reference's iter==0 unconstrained HPIPM path).
- Filter line search follows NMPC_solver.cpp:149-274 including the
  *persistent* step size: ``alpha`` is carried across SQP iterations and
  never reset (NMPC_solver.h:104) — reproduced when
  ``persistent_alpha=True`` (default, parity); ``False`` resets alpha to 1
  each SQP iteration.
- Convergence test: ``dphi > -1e-3 and theta < 1e-6`` (NMPC_solver.cpp:267).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from srbd_nmpc_tpu.models import srbd, srbd_soa
from srbd_nmpc_tpu.ocpqp.data import OcpQp
from srbd_nmpc_tpu.ops import riccati_soa
from srbd_nmpc_tpu.ops import smallmat as sm
from srbd_nmpc_tpu.ops.barrier import relaxed_log_barrier
from srbd_nmpc_tpu.ops.riccati import lqr_solve


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


# Engine status codes — same encoding as ocpqp.settings.IpmStatus
# (ocp_qp_ipm_solver.hpp:24-30). STATUS_RUNNING doubles as
# MAX_ITER_REACHED: a scenario that never leaves it ran out of iterations.
STATUS_SUCCESS = 0
STATUS_RUNNING = 1           # == MAX_ITER_REACHED at exit
STATUS_MIN_STEP = 2          # line search stalled at alpha_min
STATUS_NAN_DETECTED = 3


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
    # "auto" | "fused" | "xla" | "pallas" | "pscan": batched QP backend.
    # "fused" is the fastest TPU path: one Pallas kernel linearizes AND
    # runs the backward Riccati per stage (ops/sqp_pallas.py), so the
    # [N,12,12,B] Jacobian/Hessian tensors never round-trip HBM; "pallas"
    # is the two-kernel round-2 path (separate linearize + Riccati);
    # "auto" picks "fused" on TPU when eligible (refine==0, batch
    # divisible by pallas_block, Euler sensitivities), else the XLA SoA
    # scan; at long horizons (N >= pscan_min_N, refine==0) it switches to
    # the O(log N)-depth associative-scan Riccati (ops/riccati_pscan.py).
    # "pscan" forces that kernel. Combining "pscan"/"fused" with
    # refine > 0, or "pallas"/"fused" with non-Euler sensitivities,
    # raises ValueError (the Pallas linearizers implement the reference's
    # Euler sensitivities only, SRBD_model.cpp:180-181).
    qp_kernel: str = _static(default="auto")
    # auto-rule horizon threshold for the stage-parallel Riccati. Measured
    # on the real chip (tools/bench_pscan.py, B=256 f32): the sequential
    # SoA kernel is ~flat in N (24-29 ms for N=20..200, dominated by
    # per-call overheads) while pscan grows linearly (105 -> 936 ms,
    # N=20 -> 200; its O(log N) depth buys nothing single-chip because the
    # AoS 12x12 solves dominate) — there is NO single-chip crossover, so
    # the default never auto-engages it. pscan's value is sharding the
    # horizon over a mesh "stage" axis (tests/test_riccati_pscan.py,
    # __graft_entry__ 2-D mesh dryrun); set qp_kernel="pscan" explicitly
    # (or lower this threshold) for that regime.
    pscan_min_N: int = _static(default=1 << 30)
    # scenario-lane block per Pallas grid step (lane dimension of every
    # kernel operand; larger blocks amortize per-grid-step overhead until
    # VMEM pressure bites)
    pallas_block: int = _static(default=256)
    # speculative line-search acceptance (fused batched path only): each
    # while-trip launches ONE fused kernel at the candidate point — its
    # merit outputs decide the filter acceptance and, on acceptance, its
    # QP outputs are the next iteration's direction, so the separate
    # merit kernel disappears from the hot loop (~87% of iterations
    # accept the first candidate; see NmpcInfo.ls_trips). Scenario-level
    # semantics identical to the sequential loop (tests); False restores
    # the iteration-synchronous loop.
    speculative: bool = _static(default=True)
    # fold the forward rollout into the last backward grid step of the
    # one-pass kernel (unrolled epilogue; halves the sequential grid
    # depth). False restores the 2N-step grid — on the DENSE one-pass
    # kernels only: the planes kernel (cfg.planes=True, the default)
    # always folds the forward rollout and ignores this flag.
    fold_forward: bool = _static(default=True)
    # plane-phase linearization for the fused one-pass kernel
    # (ops/sqp_planes): grid step 0 linearizes ALL stages at once as
    # entry-wise algebra over [N, block] planes (83% sublane occupancy
    # incl. transcendentals, vs [block]-rows at 1/8) and parks a compact
    # structured pack in VMEM; the backward steps are pure Riccati.
    # Measured 5.82 vs 8.79 ms/launch at B=16384 (the whole solve is ~18
    # launches of this kernel). False restores the dense-layout one-pass
    # kernels (kept as the on-chip oracle, tools/tpu_smoke.py).
    planes: bool = _static(default=True)
    # straggler compaction (speculative fused path): the batch pays every
    # while-trip at full width even when only a tail of slow scenarios is
    # still live (cold: mean 11.4 SQP iterations but the batch runs ~18
    # trips; warm: mean 8.7 — VERDICT r4 weak #2). When the live count
    # fits in the next tier width (Bn // compact_tiers[i]), gather the
    # live scenarios into a dense prefix, launch the fused kernel on
    # that sub-batch only, and scatter the results back. Per-lane kernel
    # math has no cross-lane ops, so results are bitwise identical to
    # the full-width launch (asserted in tests/test_sqp_planes.py).
    # Tiers engage only when their width is a multiple of pallas_block.
    compact: bool = _static(default=True)
    # compaction tier divisors (width of tier i = Bn // compact_tiers[i];
    # tiers whose width is not a pallas_block multiple are skipped).
    # (2, 8, 32) is the regime-robust measured optimum at B=131072
    # (round-5 A/B sweeps on chip): cold it is a wash vs (4, 16)
    # (236.5k vs 236.8k solves/s — live collapses ~41 % -> 3 % in ONE
    # SQP iteration so the B/2 tier saves < 1 trip, and the extra
    # crossing costs what it saves) but WARM it wins +4.1 % (279.4k vs
    # 268.4k): the warm live set collapses ~3 iterations earlier, so the
    # early B/2 tier covers real trips. Also measured: (2,8) alone cold
    # -1.3 % (233.7k, the B/32 tail runs at 1/8 width instead of 1/32);
    # (4,16,64) a wash; a 4th tier (2,8,32,128) a wash.
    compact_tiers: tuple = _static(default=(2, 8, 32))
    # factor-parking in the planes kernel: park the backward stage's
    # Cholesky factor (L, dinv, Yh, yv) instead of the gains (K, kv) and
    # back-substitute du lazily in the forward epilogue — deletes the
    # 13-rhs backward substitution from every backward Riccati stage
    # (ops/sqp_planes, ``factor``). Default OFF — measured NON-LEVER
    # (round 5, tools/probe_planes_split.py --factor --block 128 at
    # B=16384): the backward phase does get its ~10 % faster (2.44 ->
    # 2.20 ms) but the epilogue's per-stage 12-step substitution is a
    # SERIAL dependency chain inside the already-serial rollout and
    # costs more than the saving (fold+planes 3.17 -> 3.52 ms; net
    # 5.62 -> 5.71 ms/launch, -1.7 %). Also needs block<=128 (the two
    # extra [N,12,12,block] parks exceed VMEM at 256). Kept validated
    # (tests/test_sqp_planes.py::test_factor_matches_gains_stage).
    park_factor: bool = _static(default=False)

    # Convergence thresholds (NMPC_solver.cpp:267)
    conv_dphi: float = _static(default=-1e-3)
    conv_theta: float = _static(default=1e-6)

    def __post_init__(self):
        # iterative refinement is a sequential-kernel feature; forcing the
        # associative-scan kernel while also requesting refinement would
        # silently drop it — reject the combination instead (the "auto"
        # rule already never picks pscan when refine > 0).
        if self.qp_kernel in ("pscan", "fused") and self.refine > 0:
            raise ValueError(
                f"qp_kernel={self.qp_kernel!r} does not support refine > 0 "
                "(iterative refinement is only implemented in the "
                "sequential XLA Riccati kernel); use qp_kernel='auto'/'xla' "
                "or set refine=0"
            )
        if self.qp_kernel in ("pallas", "fused") and self.sensitivity != "euler":
            raise ValueError(
                f"qp_kernel={self.qp_kernel!r} implements the reference's "
                "Euler sensitivities only (SRBD_model.cpp:180-181); use "
                "sensitivity='euler' or qp_kernel='auto'/'xla'"
            )


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
    """Per-scenario SQP iterate: trajectories + persistent step size.
    Leaves may carry a leading scenario-batch axis."""

    x: jnp.ndarray      # [..., N+1, nx]
    u: jnp.ndarray      # [..., N, nu]
    alpha: jnp.ndarray  # [...]

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
    """Per-scenario diagnostics, superset of printOptimizationInfo's data
    (NMPC_solver.cpp:113-141).

    ``status`` uses the IpmStatus codes (ocp_qp_ipm_solver.hpp:24-30):
    0 SUCCESS, 1 MAX_ITER_REACHED, 2 MIN_STEP_LENGTH_REACHED (the line
    search bottomed out at alpha_min without converging — a stall), 3
    NAN_DETECTED (a non-finite merit/direction; the scenario freezes at
    its last finite iterate — the engine analogue of the reference's
    try/catch guard, NMPC_solver.cpp:383-392).
    """

    converged: jnp.ndarray       # [...] bool
    sqp_iters: jnp.ndarray       # [...] int32
    theta: jnp.ndarray           # [...] — equality-constraint merit
    phi: jnp.ndarray             # [...] — cost merit
    dphi: jnp.ndarray            # [...] — directional derivative
    alpha: jnp.ndarray           # [...] — final step size
    max_defect: jnp.ndarray      # [...] — max |dynamics defect|
    min_constraint: jnp.ndarray  # [...] — most-negative friction-cone value
    status: jnp.ndarray          # [...] int32 — IpmStatus codes
    # cumulative line-search merit evaluations (backtracking trips; in a
    # batch every scenario pays for the slowest member's trips, so this is
    # the launch count — the line-search cost driver)
    ls_trips: jnp.ndarray        # [...] int32

    def pretty(self) -> str:
        """Human-readable report — the printOptimizationInfo analogue
        (NMPC_solver.cpp:113-141: sqp_loop, phi, dphi, theta, alpha, max
        friction-cone violation, max dynamics violation), aggregated over
        the scenario batch when one is present."""
        import numpy as np

        names = {0: "SUCCESS", 1: "MAX_ITER_REACHED",
                 2: "MIN_STEP_LENGTH_REACHED", 3: "NAN_DETECTED"}
        conv = np.asarray(self.converged)
        stat = np.asarray(self.status)
        lines = ["-----------------------"]
        if conv.ndim == 0:
            lines += [
                f"status      : {names.get(int(stat), int(stat))}",
                f"sqp_loop    : {int(np.asarray(self.sqp_iters))}",
                f"ls_trips    : {int(np.asarray(self.ls_trips))}",
                f"phi         : {float(np.asarray(self.phi)):.6e}",
                f"dphi        : {float(np.asarray(self.dphi)):.6e}",
                f"theta       : {float(np.asarray(self.theta)):.6e}",
                f"alpha       : {float(np.asarray(self.alpha)):.6e}",
                "max dynamic equation violation    : "
                f"{float(np.asarray(self.max_defect)):.6e}",
                "min friction cone constraint value: "
                f"{float(np.asarray(self.min_constraint)):.6e}",
            ]
        else:
            n = conv.size
            counts = {names[k]: int(np.sum(stat == k)) for k in names
                      if np.any(stat == k)}
            lines += [
                f"scenarios   : {n}  (converged {int(conv.sum())}/{n})",
                f"status      : {counts}",
                f"sqp_loop    : mean {float(np.mean(np.asarray(self.sqp_iters))):.2f}"
                f"  max {int(np.max(np.asarray(self.sqp_iters)))}",
                f"ls_trips    : max {int(np.max(np.asarray(self.ls_trips)))}",
                f"phi         : max {float(np.max(np.asarray(self.phi))):.6e}",
                f"theta       : max {float(np.max(np.asarray(self.theta))):.6e}",
                f"alpha       : min {float(np.min(np.asarray(self.alpha))):.6e}",
                "max dynamic equation violation    : "
                f"{float(np.max(np.asarray(self.max_defect))):.6e}",
                "min friction cone constraint value: "
                f"{float(np.min(np.asarray(self.min_constraint))):.6e}",
            ]
        return "\n".join(lines)


def merit(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
          x: jnp.ndarray, u: jnp.ndarray, x_ref: jnp.ndarray,
          with_grad: bool = False):
    """Merit pair (theta, phi) and optionally their gradients; per scenario.

    theta = 1/2 sum_k ||f_k||^2 (shooting defects); phi = tracking + barrier
    + input cost. Ref: linearSearch merit accumulation NMPC_solver.cpp:152-189.

    The RK4 defect evaluation — the dominant FLOPs — goes through the SoA
    dynamics kernels when a scenario batch is present (lane-starved
    [B,N,3,3] tensors otherwise).
    """
    Ac, bc = srbd.constraint_matrix(params)

    if x.ndim == 3:  # batched: [B, N+1, nx] -> SoA [nx, B, N]
        xs = jnp.moveaxis(x[:, :-1, :], -1, 0)
        xn = jnp.moveaxis(x[:, 1:, :], -1, 0)
        us = jnp.moveaxis(u, -1, 0)
        d_soa = xn - srbd_soa.rk4(params, xs, us)        # [nx, B, N]
        defects = jnp.moveaxis(d_soa, 0, -1)             # [B, N, nx]
    else:
        defects = srbd.shooting_defect(params, x[..., :-1, :], x[..., 1:, :], u)
    theta = 0.5 * jnp.sum(defects * defects, axis=(-2, -1))

    ex = x - x_ref                                     # [..., N+1, nx]
    Qx = jnp.einsum("...ni,ij->...nj", ex[..., :-1, :], weights.Q)
    phi_x = 0.5 * jnp.sum(ex[..., :-1, :] * Qx, axis=(-2, -1))
    eN = ex[..., -1, :]
    QfeN = jnp.einsum("...i,ij->...j", eN, weights.Qf)
    phi_N = 0.5 * jnp.sum(eN * QfeN, axis=-1)

    con = jnp.einsum("...ni,gi->...ng", u, Ac) + bc    # [..., N, 24]
    b_bar, db_bar, _ = relaxed_log_barrier(con, cfg.mu_barrier, cfg.theta_barrier)
    Ru = jnp.einsum("...ni,ij->...nj", u, weights.R)
    phi_u = jnp.sum(b_bar, axis=(-2, -1)) + 0.5 * jnp.sum(u * Ru, axis=(-2, -1))

    phi = phi_x + phi_N + phi_u
    if not with_grad:
        return theta, phi, defects, con
    Jphi_x = jnp.concatenate([Qx, QfeN[..., None, :]], axis=-2)   # [..., N+1, nx]
    Jphi_u = jnp.einsum("...ng,gi->...ni", db_bar, Ac) + Ru       # [..., N, nu]
    return theta, phi, defects, con, Jphi_x, Jphi_u


def _pallas_eligible(cfg: NmpcConfig, batch: int) -> bool:
    return cfg.qp_kernel == "pallas" or (
        cfg.qp_kernel == "auto"
        and jax.default_backend() == "tpu"
        and batch % cfg.pallas_block == 0
    )


def _fused_eligible(cfg: NmpcConfig, batch: int) -> bool:
    """True when the fully fused linearize+Riccati kernel
    (ops/sqp_pallas.py) should solve the QP — the fastest TPU path."""
    return cfg.qp_kernel == "fused" or (
        cfg.qp_kernel == "auto"
        and jax.default_backend() == "tpu"
        and batch % cfg.pallas_block == 0
        and cfg.refine == 0
        and cfg.sensitivity == "euler"
    )


def _pscan_selected(cfg: NmpcConfig) -> bool:
    """True when the stage-parallel (associative-scan) Riccati should solve
    the QP: forced by qp_kernel="pscan", or picked by the auto rule at
    long horizons (where the sequential scan's O(N) depth dominates)."""
    return cfg.qp_kernel == "pscan" or (
        cfg.qp_kernel == "auto" and cfg.refine == 0 and cfg.N >= cfg.pscan_min_N
    )


def _merit_fast(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
                x: jnp.ndarray, u: jnp.ndarray, x_ref: jnp.ndarray,
                with_grad: bool = False):
    """Merit with reduced diagnostics: returns (theta, phi, max|defect|,
    min(con)[, Jphi_x, Jphi_u]). Routes through the fused Pallas merit
    kernel on the batched TPU path (models/merit_pallas.py: the RK4 defect
    chain accumulates per-scenario sums in VMEM — measured 1.75 ms vs
    2.69 ms XLA at B=4096)."""
    if x.ndim == 3 and x_ref.ndim == 2 and _pallas_eligible(cfg, x.shape[0]):
        from srbd_nmpc_tpu.models import merit_pallas

        B = x.shape[0]
        Ac, bc = srbd.constraint_matrix(params)
        xs = jnp.transpose(x, (1, 2, 0))
        us = jnp.transpose(u, (1, 2, 0))
        xr = jnp.broadcast_to(
            jnp.transpose(x_ref[None], (1, 2, 0)), (cfg.N + 1, srbd.NX, B)
        )
        th, ph, Jx, Ju, md, mc = merit_pallas.merit_pallas(
            params, weights.Q, weights.Qf, weights.R, Ac, bc, xs, us, xr,
            cfg.mu_barrier, cfg.theta_barrier, block=cfg.pallas_block,
        )
        if with_grad:
            return th, ph, md, mc, jnp.transpose(Jx, (2, 0, 1)), jnp.transpose(Ju, (2, 0, 1))
        return th, ph, md, mc

    out = merit(params, weights, cfg, x, u, x_ref, with_grad=with_grad)
    theta, phi, defects, con = out[:4]
    md = jnp.max(jnp.abs(defects), axis=(-2, -1))
    mc = jnp.min(con, axis=(-2, -1))
    if with_grad:
        return theta, phi, md, mc, out[4], out[5]
    return theta, phi, md, mc


def _linearize_soa(params: srbd.SRBDParams, weights: NmpcWeights,
                   cfg: NmpcConfig, state: NmpcState, x_ref: jnp.ndarray,
                   build_QS: bool = True):
    """Batched linearization directly in the Riccati kernel's SoA layout.

    Input state [B, N+1, nx]; returns stage-stacked SoA arrays
    (A,B,b [N,...,B], Q,q [N+1,...,B], S,R,r [N,...,B]) — same math as
    ``linearize`` (prepareQpStructures, NMPC_solver.cpp:276-314) with zero
    AoS<->SoA transposes of the big Jacobian tensors — plus a ``aux``
    merit tuple (theta, phi, max|defect|, min constraint) at the current
    iterate, reusing the RK4/barrier evaluation the linearization already
    performed. The merit *gradients* are exactly the QP gradients
    (Jphi_x == q, Jphi_u == r_eff — the reference computes the same
    quantities twice in linearSearch, NMPC_solver.cpp:168-189), so a
    separate merit-with-grad sweep per SQP iteration is never needed.
    """
    dtype = state.x.dtype
    N = cfg.N
    Bn = state.x.shape[0]

    xs = jnp.moveaxis(state.x[:, :-1, :], -1, 0)     # [nx, B, N]
    xn = jnp.moveaxis(state.x[:, 1:, :], -1, 0)
    us = jnp.moveaxis(state.u, -1, 0)                # [nu, B, N]

    if cfg.sensitivity == "euler":
        A_s, B_s = srbd_soa.euler_AB(params, xs, us)     # [12,12,B,N]
    else:
        A_aos, B_aos, _, _ = srbd.linearize_shooting(
            params, state.x[:, :-1, :], state.x[:, 1:, :], state.u,
            cfg.sensitivity,
        )
        A_s = jnp.moveaxis(jnp.moveaxis(A_aos, 0, -1), 0, -1)  # [12,12,B,N]
        B_s = jnp.moveaxis(jnp.moveaxis(B_aos, 0, -1), 0, -1)
    # A/B/b to stage-major [N, ..., B]; b = -f with f = x_next - RK4(x, u)
    A = jnp.moveaxis(A_s, -1, 0)
    Bm = jnp.moveaxis(B_s, -1, 0)
    b = jnp.moveaxis(srbd_soa.rk4(params, xs, us) - xn, -1, 0)

    nb = (1, 1)
    Ac, bc = srbd.constraint_matrix(params)
    Ac_b = Ac.reshape(Ac.shape + nb)                  # [24,12,1,1]
    con = sm.mv(Ac_b, us) + bc.reshape(bc.shape + nb)  # [24, B, N]
    b_bar, db, ddb = relaxed_log_barrier(con, cfg.mu_barrier, cfg.theta_barrier)

    # R_eff = R + Ac' diag(ddb) Ac ; r_eff = R u + Ac' db
    R_w = weights.R.reshape(weights.R.shape + nb)
    R_eff = R_w + sm.mtm(Ac_b, Ac_b * ddb[:, None])   # [12,12,B,N]
    Ru = sm.mv(R_w, us)                               # [12, B, N]
    r_eff = Ru + sm.mtv(Ac_b, db)                     # [12, B, N]
    R_eff = jnp.moveaxis(R_eff, -1, 0)
    r_eff = jnp.moveaxis(r_eff, -1, 0)

    ex = jnp.moveaxis(state.x - x_ref, -1, 0)         # [nx, B, N+1]
    Q_w = weights.Q.reshape(weights.Q.shape + nb)
    Qf_w = weights.Qf.reshape(weights.Qf.shape + nb)
    q_run = sm.mv(Q_w, ex[:, :, :-1])                 # [nx, B, N]
    q_term = sm.mv(Qf_w, ex[:, :, -1:])               # [nx, B, 1]
    q = jnp.moveaxis(jnp.concatenate([q_run, q_term], axis=-1), -1, 0)

    if build_QS:
        Q = jnp.broadcast_to(
            weights.Q.reshape((1,) + weights.Q.shape + (1,)),
            (N, srbd.NX, srbd.NX, Bn),
        )
        Q = jnp.concatenate(
            [Q, jnp.broadcast_to(
                weights.Qf.reshape((1,) + weights.Qf.shape + (1,)),
                (1, srbd.NX, srbd.NX, Bn))],
            axis=0,
        )
        S = jnp.zeros((N, srbd.NU, srbd.NX, Bn), dtype)
    else:
        # the fused const-Q Pallas kernel takes (Q, Qf) directly; never
        # materialize the [N+1,12,12,B] broadcast or the all-zero S
        Q, S = None, None

    # merit at the current iterate from byproducts (defect f = -b):
    theta = 0.5 * jnp.sum(b * b, axis=(0, 1))                        # [B]
    phi = (0.5 * jnp.sum(ex[:, :, :-1] * q_run, axis=(0, 2))
           + 0.5 * jnp.sum(ex[:, :, -1] * q_term[:, :, 0], axis=0)
           + jnp.sum(b_bar, axis=(0, 2))
           + 0.5 * jnp.sum(us * Ru, axis=(0, 2)))
    max_defect = jnp.max(jnp.abs(b), axis=(0, 1))
    min_con = jnp.min(con, axis=(0, 2))
    aux = (theta, phi, max_defect, min_con)
    return A, Bm, b, Q, S, R_eff, q, r_eff, aux


def _linearize_pallas_soa(params: srbd.SRBDParams, weights: NmpcWeights,
                          cfg: NmpcConfig, xa: jnp.ndarray, us: jnp.ndarray,
                          xra: jnp.ndarray, block: int = 256):
    """Fused Pallas linearization, SoA in/out: one kernel per
    (scenario-block, stage) evaluates the whole prepareQpStructures stage
    math plus the current-point merit partials (models/srbd_pallas.py), so
    the [N,12,12,B] Jacobian tensors are written to HBM exactly once and
    no separate XLA linearize/merit sweeps run. Inputs xa [N+1,12,B],
    us [N,12,B], xra [N+1,12,B]; returns (A, B, b, R_eff, q, r_eff, aux)
    with aux = (theta, phi, max|defect|, min constraint), all [B]."""
    from srbd_nmpc_tpu.models import srbd_pallas

    Ac, bc = srbd.constraint_matrix(params)
    A, Bm, b, q_run, r_eff, R_eff, mer = srbd_pallas.linearize_pallas(
        params, weights.Q, weights.R, Ac, bc,
        xa[:-1], xa[1:], us, xra[:-1],
        cfg.mu_barrier, cfg.theta_barrier, block=block,
    )
    # terminal tracking gradient + cost (tiny [12, B] math, outside Pallas)
    eN = xa[-1] - xra[-1]
    q_term = jnp.einsum("ij,jb->ib", weights.Qf, eN)
    q = jnp.concatenate([q_run, q_term[None]], axis=0)

    theta = jnp.sum(mer[:, 0], axis=0)
    phi = (jnp.sum(mer[:, 1] + mer[:, 4] + mer[:, 5], axis=0)
           + 0.5 * jnp.sum(eN * q_term, axis=0))
    max_defect = jnp.max(mer[:, 3], axis=0)
    min_con = jnp.min(mer[:, 2], axis=0)
    return A, Bm, b, R_eff, q, r_eff, (theta, phi, max_defect, min_con)


def _linearize_pallas(params: srbd.SRBDParams, weights: NmpcWeights,
                      cfg: NmpcConfig, state: NmpcState, x_ref: jnp.ndarray,
                      block: int = 256):
    """AoS-state wrapper around ``_linearize_pallas_soa`` (tests/tools)."""
    Bn = state.x.shape[0]
    xa = jnp.transpose(state.x, (1, 2, 0))            # [N+1, 12, B]
    us = jnp.transpose(state.u, (1, 2, 0))            # [N, 12, B]
    if x_ref.ndim == 2:
        xra = jnp.broadcast_to(x_ref[:, :, None], (cfg.N + 1, srbd.NX, Bn))
    else:
        xra = jnp.transpose(x_ref, (1, 2, 0))
    return _linearize_pallas_soa(params, weights, cfg, xa, us, xra, block)


def linearize(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
              state: NmpcState, x_ref: jnp.ndarray) -> OcpQp:
    """Build the delta-form OCP-QP around the current trajectory; batched.

    Ref: prepareQpStructures (NMPC_solver.cpp:276-314) — dynamics rows from
    the shooting linearization, barrier curvature folded into (R_eff, r_eff),
    no hard constraint rows.
    """
    if state.x.ndim == 3:
        A, B, b, Q, S, R, q, r, _ = _linearize_soa(params, weights, cfg, state, x_ref)
        f = lambda z: jnp.moveaxis(z, -1, 0)  # [N,...,B] -> [B,N,...]
        return OcpQp(A=f(A), B=f(B), b=f(b), Q=f(Q), S=f(S), R=f(R),
                     q=f(q), r=f(r))
    dtype = state.x.dtype
    N = cfg.N
    lead = state.x.shape[:-2]

    A, B, b, _ = srbd.linearize_shooting(
        params, state.x[..., :-1, :], state.x[..., 1:, :], state.u, cfg.sensitivity
    )

    Ac, bc = srbd.constraint_matrix(params)
    con = jnp.einsum("...ni,gi->...ng", state.u, Ac) + bc     # [..., N, 24]
    _, db, ddb = relaxed_log_barrier(con, cfg.mu_barrier, cfg.theta_barrier)

    # R_eff_k = R + Ac' diag(ddb_k) Ac ; r_eff_k = R u_k + Ac' db_k
    R_eff = weights.R + jnp.einsum("gi,...ng,gj->...nij", Ac, ddb, Ac)
    r_eff = jnp.einsum("...ni,ij->...nj", state.u, weights.R) + jnp.einsum(
        "...ng,gi->...ni", db, Ac
    )

    ex = state.x - x_ref
    Q = jnp.broadcast_to(weights.Q, lead + (N, srbd.NX, srbd.NX))
    Q = jnp.concatenate(
        [Q, jnp.broadcast_to(weights.Qf, lead + (1, srbd.NX, srbd.NX))], axis=-3
    )
    q = jnp.concatenate(
        [
            jnp.einsum("...ni,ij->...nj", ex[..., :-1, :], weights.Q),
            jnp.einsum("...i,ij->...j", ex[..., -1, :], weights.Qf)[..., None, :],
        ],
        axis=-2,
    )

    return OcpQp(
        A=A, B=B, b=b,
        Q=Q, q=q,
        S=jnp.zeros(lead + (N, srbd.NU, srbd.NX), dtype),
        R=R_eff, r=r_eff,
    )


def _line_search(params, weights, cfg, state: NmpcState, x_ref,
                 dx, du, theta0, phi0, dphi, active0):
    """Backtracking filter line search with per-scenario masking.

    Per scenario this is exactly the reference's sequential loop
    (NMPC_solver.cpp:200-264): evaluate at alpha; accept (alpha kept) or
    halve. The batch iterates until every active scenario accepted or
    bottomed out; already-converged scenarios (``~active0``) don't move.
    """
    dtype = state.x.dtype

    def accept(theta_a, phi_a, alpha):
        case_infeasible = theta_a > cfg.theta_max
        acc_infeasible = theta_a < (1.0 - cfg.beta_theta) * theta0
        case_small = (jnp.maximum(theta_a, theta0) < cfg.theta_min) & (dphi < 0.0)
        acc_small = phi_a < phi0 + cfg.eta * alpha * dphi
        acc_mixed = (phi_a < phi0 - cfg.beta_phi * theta0) | (
            theta_a < (1.0 - cfg.beta_theta) * theta0
        )
        return jnp.where(
            case_infeasible, acc_infeasible, jnp.where(case_small, acc_small, acc_mixed)
        )

    alpha0 = state.alpha if cfg.persistent_alpha else jnp.ones_like(state.alpha)

    def cond(carry):
        alpha, accepted, _, _, _ = carry
        searching = active0 & jnp.logical_not(accepted) & (alpha > cfg.alpha_min)
        return jnp.any(searching)

    def body(carry):
        alpha, accepted, x_best, u_best, trips = carry
        a = alpha[..., None, None]
        x_a = state.x + a * dx
        u_a = state.u + a * du
        theta_a, phi_a, _, _ = _merit_fast(params, weights, cfg, x_a, u_a, x_ref)
        searching = active0 & jnp.logical_not(accepted) & (alpha > cfg.alpha_min)
        ok = accept(theta_a, phi_a, alpha) & searching
        okk = ok[..., None, None]
        x_best = jnp.where(okk, x_a, x_best)
        u_best = jnp.where(okk, u_a, u_best)
        new_alpha = jnp.where(searching & jnp.logical_not(ok),
                              cfg.beta_alpha * alpha, alpha)
        return (new_alpha, accepted | ok, x_best, u_best, trips + 1)

    init = (alpha0, jnp.zeros_like(alpha0, dtype=bool), state.x, state.u,
            jnp.asarray(0, jnp.int32))
    alpha_f, accepted, x_new, u_new, trips = lax.while_loop(cond, body, init)
    return NmpcState(x=x_new, u=u_new, alpha=alpha_f), trips


def _accept(cfg: NmpcConfig, theta_a, phi_a, alpha, theta0, phi0, dphi):
    """Filter acceptance 3-case rule (NMPC_solver.cpp:200-264)."""
    case_infeasible = theta_a > cfg.theta_max
    acc_infeasible = theta_a < (1.0 - cfg.beta_theta) * theta0
    case_small = (jnp.maximum(theta_a, theta0) < cfg.theta_min) & (dphi < 0.0)
    acc_small = phi_a < phi0 + cfg.eta * alpha * dphi
    acc_mixed = (phi_a < phi0 - cfg.beta_phi * theta0) | (
        theta_a < (1.0 - cfg.beta_theta) * theta0
    )
    return jnp.where(
        case_infeasible, acc_infeasible, jnp.where(case_small, acc_small, acc_mixed)
    )


def _merit_soa(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
               xa: jnp.ndarray, us: jnp.ndarray, xra: jnp.ndarray):
    """(theta, phi) [B] at an SoA iterate (xa [N+1,12,B], us [N,12,B]) —
    the XLA fallback for the line-search candidate evaluation; the Pallas
    path goes through models/merit_pallas directly (same layout)."""
    x_in = jnp.moveaxis(xa[:-1], 1, 0)                 # [12, N, B]
    x_nx = jnp.moveaxis(xa[1:], 1, 0)
    u_in = jnp.moveaxis(us, 1, 0)
    d = x_nx - srbd_soa.rk4(params, x_in, u_in)        # [12, N, B]
    theta = 0.5 * jnp.sum(d * d, axis=(0, 1))

    ex = xa - xra                                      # [N+1, 12, B]
    Qe = jnp.einsum("ij,njb->nib", weights.Q, ex[:-1])
    phi_x = 0.5 * jnp.sum(ex[:-1] * Qe, axis=(0, 1))
    eN = ex[-1]
    QfeN = jnp.einsum("ij,jb->ib", weights.Qf, eN)
    phi_N = 0.5 * jnp.sum(eN * QfeN, axis=0)

    Ac, bc = srbd.constraint_matrix(params)
    con = jnp.einsum("gi,nib->ngb", Ac, us) + bc[:, None]  # [N, 24, B]
    b_bar, _, _ = relaxed_log_barrier(con, cfg.mu_barrier, cfg.theta_barrier)
    Ru = jnp.einsum("ij,njb->nib", weights.R, us)
    phi_u = jnp.sum(b_bar, axis=(0, 1)) + 0.5 * jnp.sum(us * Ru, axis=(0, 1))
    return theta, phi_x + phi_N + phi_u


def _merit_candidate_soa(params, weights, cfg, xa, us, xra,
                         dx, du, alpha, use_pallas: bool):
    """(theta, phi) [B] at the candidate (xa + alpha dx, us + alpha du).
    The Pallas route folds the alpha-scaling into the merit kernel
    (merit_pallas.merit_alpha_pallas) so candidate trajectories never
    materialize in HBM; the XLA fallback forms them inline (fused by XLA
    into the defect evaluation anyway)."""
    if use_pallas:
        from srbd_nmpc_tpu.models import merit_pallas

        Ac, bc = srbd.constraint_matrix(params)
        return merit_pallas.merit_alpha_pallas(
            params, weights.Q, weights.Qf, weights.R, Ac, bc, xa, us, xra,
            dx, du, alpha, cfg.mu_barrier, cfg.theta_barrier,
            block=cfg.pallas_block,
        )
    a = alpha[None, None, :]
    return _merit_soa(params, weights, cfg, xa + a * dx, us + a * du, xra)


def _line_search_soa(params, weights, cfg, xa, us, alpha0, xra,
                     dx, du, theta0, phi0, dphi, active0, use_pallas: bool):
    """SoA twin of ``_line_search`` — trajectories [stages, 12, B],
    alphas/merits [B]. The loop carries ONLY (alpha, accepted) per
    scenario; the accepted trajectory is reconstructed once afterwards as
    xa + alpha dx (bitwise the same expression the merit evaluated), so
    no [N,12,B] tensors live in the while-loop carry."""

    def cond(carry):
        alpha, accepted, _ = carry
        searching = active0 & jnp.logical_not(accepted) & (alpha > cfg.alpha_min)
        return jnp.any(searching)

    def body(carry):
        alpha, accepted, trips = carry
        theta_a, phi_a = _merit_candidate_soa(
            params, weights, cfg, xa, us, xra, dx, du, alpha, use_pallas)
        searching = active0 & jnp.logical_not(accepted) & (alpha > cfg.alpha_min)
        ok = _accept(cfg, theta_a, phi_a, alpha, theta0, phi0, dphi) & searching
        new_alpha = jnp.where(searching & jnp.logical_not(ok),
                              cfg.beta_alpha * alpha, alpha)
        return (new_alpha, accepted | ok, trips + 1)

    init = (alpha0, jnp.zeros(alpha0.shape, dtype=bool),
            jnp.asarray(0, jnp.int32))
    alpha_f, accepted, trips = lax.while_loop(cond, body, init)
    am = accepted[None, None, :]
    af = alpha_f[None, None, :]
    # where-guarded (not alpha*0): a frozen/NaN scenario's dx may be NaN
    x_new = jnp.where(am, xa + af * dx, xa)
    u_new = jnp.where(am, us + af * du, us)
    return x_new, u_new, alpha_f, trips


def _sqp_step_soa(params, weights, cfg, xa, us, alpha, x0s, xra, active):
    """One SQP iteration entirely in SoA layout (xa [N+1,12,B],
    us [N,12,B], x0s [12,B], xra [N+1,12,B]); returns (xa', us', alpha',
    (theta0, phi0, dphi, max_defect, min_con, nan)). This is the batched
    hot path: on the Pallas route the iteration runs with ZERO layout
    transposes (round-1 profiling attributed ~30% of solve time to the
    per-iteration AoS<->SoA relayouts of the trajectory tensors)."""
    Bn = xa.shape[-1]
    use_pscan = _pscan_selected(cfg)
    use_fused = (not use_pscan) and _fused_eligible(cfg, Bn)
    use_pallas = ((not use_pscan) and (not use_fused)
                  and _pallas_eligible(cfg, Bn) and cfg.refine == 0)
    dx0s = x0s - xa[0]
    if use_pscan:
        from srbd_nmpc_tpu.ops.riccati_pscan import lqr_solve_pscan

        state_aos = NmpcState(x=jnp.transpose(xa, (2, 0, 1)),
                              u=jnp.transpose(us, (2, 0, 1)), alpha=alpha)
        x_ref_aos = jnp.transpose(xra, (2, 0, 1))
        A, B, b, Q, S, R, q, r, aux = _linearize_soa(
            params, weights, cfg, state_aos, x_ref_aos)
        f = lambda z: jnp.moveaxis(z, -1, 0)  # [N,...,B] -> [B,N,...]
        qp = OcpQp(A=f(A), B=f(B), b=f(b), Q=f(Q), S=f(S), R=f(R),
                   q=f(q), r=f(r))
        sol = jax.vmap(lambda qq, d: lqr_solve_pscan(qq, d, reg=cfg.reg))(
            qp, jnp.moveaxis(dx0s, -1, 0))
        dx = jnp.transpose(sol.x, (1, 2, 0))   # back to SoA [N+1, nx, B]
        du = jnp.transpose(sol.u, (1, 2, 0))
        dphi = jnp.sum(dx * q, axis=(0, 1)) + jnp.sum(du * r, axis=(0, 1))
    elif use_fused:
        Ac, bc = srbd.constraint_matrix(params)
        # one-pass variant: stage tensors VMEM-resident; matches the
        # dense two-pass kernel to ~1e-12 in f64 (the structured-product
        # reassociation rounds differently; test_sqp_qp_solve_onepass_
        # matches_twopass) and beats it end-to-end (74.3k two-pass-era,
        # 99.6k with structured products — README perf table). With
        # cfg.planes the plane-phase kernel (ops/sqp_planes) is used at
        # alpha=0 (bootstrap mode) — 5.82 vs 8.79 ms/launch at B=16384.
        if cfg.planes:
            from srbd_nmpc_tpu.ops import sqp_planes

            dx, du, dphi, aux = sqp_planes.sqp_qp_solve_onepass_planes(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra, jnp.zeros_like(xa), jnp.zeros_like(us),
                jnp.zeros(Bn, xa.dtype), x0s,
                cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=cfg.pallas_block,
                factor=cfg.park_factor,
            )
        else:
            from srbd_nmpc_tpu.ops import sqp_pallas

            dx, du, dphi, aux = sqp_pallas.sqp_qp_solve_onepass(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra, dx0s, cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=cfg.pallas_block, fold=cfg.fold_forward,
            )
    elif use_pallas:
        from srbd_nmpc_tpu.ops import riccati_pallas

        A, B, b, R, q, r, aux = _linearize_pallas_soa(
            params, weights, cfg, xa, us, xra, block=cfg.pallas_block)
        dx, du = riccati_pallas.lqr_solve_pallas(
            A, B, b, (weights.Q, weights.Qf), R, q, r, dx0s,
            reg=cfg.reg, block=cfg.pallas_block,
        )
        dphi = jnp.sum(dx * q, axis=(0, 1)) + jnp.sum(du * r, axis=(0, 1))
    else:
        state_aos = NmpcState(x=jnp.transpose(xa, (2, 0, 1)),
                              u=jnp.transpose(us, (2, 0, 1)), alpha=alpha)
        x_ref_aos = jnp.transpose(xra, (2, 0, 1))
        A, B, b, Q, S, R, q, r, aux = _linearize_soa(
            params, weights, cfg, state_aos, x_ref_aos)
        dx, du, _ = riccati_soa.lqr_solve(
            A, B, b, Q, S, R, q, r, dx0s, reg=cfg.reg, refine=cfg.refine,
        )
        dphi = jnp.sum(dx * q, axis=(0, 1)) + jnp.sum(du * r, axis=(0, 1))
    theta0, phi0, max_defect, min_con = aux

    nan = jnp.logical_not(jnp.isfinite(theta0 + phi0 + dphi))
    alpha0 = alpha if cfg.persistent_alpha else jnp.ones_like(alpha)
    xa_n, us_n, alpha_n, trips = _line_search_soa(
        params, weights, cfg, xa, us, alpha0, xra, dx, du,
        theta0, phi0, dphi, active & jnp.logical_not(nan),
        use_pallas or use_fused,
    )
    return xa_n, us_n, alpha_n, (theta0, phi0, dphi, max_defect, min_con, nan,
                                 trips)


def sqp_step(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
             state: NmpcState, x0: jnp.ndarray, x_ref: jnp.ndarray,
             active=None) -> Tuple[NmpcState, NmpcInfo]:
    """One SQP iteration: linearize, QP-solve, line-search, convergence test.

    Ref: the body of the SQP loop (NMPC_solver.cpp:367-374) plus
    checkConvergence/linearSearch (:143-274). ``active`` masks scenarios
    still iterating (None = all).
    """
    with jax.default_matmul_precision("float32"):
        return _sqp_step(params, weights, cfg, state, x0, x_ref, active)


def _sqp_step(params, weights, cfg, state, x0, x_ref, active):
    if state.x.ndim == 3:
        # batched: transpose to SoA at the boundary and run the all-SoA
        # step (engine.solve's batched loop stays in SoA across ALL
        # iterations and skips these boundary transposes entirely)
        Bn = state.x.shape[0]
        xa = jnp.transpose(state.x, (1, 2, 0))
        us = jnp.transpose(state.u, (1, 2, 0))
        if x_ref.ndim == 2:
            xra = jnp.broadcast_to(x_ref[:, :, None], (cfg.N + 1, srbd.NX, Bn))
        else:
            xra = jnp.transpose(x_ref, (1, 2, 0))
        if active is None:
            active = jnp.ones((Bn,), dtype=bool)
        xa_n, us_n, alpha_n, aux = _sqp_step_soa(
            params, weights, cfg, xa, us, state.alpha,
            jnp.moveaxis(x0, 0, -1), xra, active)
        theta0, phi0, dphi, max_defect, min_con, nan, trips = aux
        new_state = NmpcState(x=jnp.transpose(xa_n, (2, 0, 1)),
                              u=jnp.transpose(us_n, (2, 0, 1)), alpha=alpha_n)
    else:
        dx0 = x0 - state.x[..., 0, :]
        qp = linearize(params, weights, cfg, state, x_ref)
        if _pscan_selected(cfg):
            from srbd_nmpc_tpu.ops.riccati_pscan import lqr_solve_pscan

            sol = lqr_solve_pscan(qp, dx0, reg=cfg.reg)
        else:
            sol = lqr_solve(qp, dx0, reg=cfg.reg, refine=cfg.refine)
        dx, du = sol.x, sol.u
        theta0, phi0, max_defect, min_con = _merit_fast(
            params, weights, cfg, state.x, state.u, x_ref
        )
        # merit gradients == QP gradients (qp.q, qp.r)
        dphi = (jnp.sum(dx * qp.q, axis=(-2, -1))
                + jnp.sum(du * qp.r, axis=(-2, -1)))

        # non-finite merit or direction: the reference would throw inside
        # HPIPM or stall silently (NMPC_solver.cpp:383-392); we flag
        # NAN_DETECTED and freeze the scenario at its last finite iterate.
        nan = jnp.logical_not(jnp.isfinite(theta0 + phi0 + dphi))
        if active is None:
            active = jnp.ones(theta0.shape, dtype=bool)
        new_state, trips = _line_search(
            params, weights, cfg, state, x_ref, dx, du, theta0, phi0, dphi,
            active & jnp.logical_not(nan)
        )
    converged = (dphi > cfg.conv_dphi) & (theta0 < cfg.conv_theta)
    status = jnp.where(
        converged, STATUS_SUCCESS,
        jnp.where(nan, STATUS_NAN_DETECTED, STATUS_RUNNING),
    ).astype(jnp.int32)
    info = NmpcInfo(
        converged=converged,
        sqp_iters=jnp.ones(theta0.shape, jnp.int32),
        theta=theta0, phi=phi0, dphi=dphi, alpha=new_state.alpha,
        max_defect=max_defect,
        min_constraint=min_con,
        status=status,
        ls_trips=jnp.broadcast_to(trips, theta0.shape),
    )
    return new_state, info


def solve(params: srbd.SRBDParams, weights: NmpcWeights, cfg: NmpcConfig,
          state: NmpcState, x0: jnp.ndarray, x_ref: jnp.ndarray
          ) -> Tuple[NmpcState, NmpcInfo]:
    """Full NMPC solve: SQP iterations until convergence or sqp_max_iter.

    Ref: the per-repetition work of controlLoop (NMPC_solver.cpp:359-375).
    A `lax.while_loop` with per-scenario masks: each scenario freezes once
    converged (the reference's early `break`); the batch stops when all
    have (or sqp_max_iter is hit).

    The whole solve is pinned to exact-f32 matmul precision: TPU's default
    bf16 multiply passes are too coarse for the theta < 1e-6 convergence
    test (defects would carry ~1e-2-scale rounding).
    """
    with jax.default_matmul_precision("float32"):
        return _solve(params, weights, cfg, state, x0, x_ref)


def _solve_batched_soa(params, weights, cfg, state, x0, x_ref):
    """Batched solve loop, trajectories in SoA for the WHOLE descent:
    one transpose in, one transpose out, zero relayouts per SQP iteration
    (the AoS-carry loop spent ~30% of solve time on them)."""
    Bn = state.x.shape[0]
    dtype = state.x.dtype
    xa0 = jnp.transpose(state.x, (1, 2, 0))
    us0 = jnp.transpose(state.u, (1, 2, 0))
    x0s = jnp.moveaxis(x0, 0, -1)
    if x_ref.ndim == 2:
        xra = jnp.broadcast_to(x_ref[:, :, None], (cfg.N + 1, srbd.NX, Bn))
    else:
        xra = jnp.transpose(x_ref, (1, 2, 0))
    zeros = jnp.zeros((Bn,), dtype)

    def cond(carry):
        _, _, _, info, it = carry
        return (it < cfg.sqp_max_iter) & jnp.any(info.status == STATUS_RUNNING)

    def body(carry):
        xa, us, alpha, info, it = carry
        act = info.status == STATUS_RUNNING
        xa_n, us_n, alpha_n, aux = _sqp_step_soa(
            params, weights, cfg, xa, us, alpha, x0s, xra, act)
        theta0, phi0, dphi, max_defect, min_con, nan, trips = aux
        converged = (dphi > cfg.conv_dphi) & (theta0 < cfg.conv_theta)
        step_status = jnp.where(
            converged, STATUS_SUCCESS,
            jnp.where(nan, STATUS_NAN_DETECTED, STATUS_RUNNING),
        ).astype(jnp.int32)

        m = act[None, None, :]
        xa2 = jnp.where(m, xa_n, xa)
        us2 = jnp.where(m, us_n, us)
        alpha2 = jnp.where(act, alpha_n, alpha)

        def upd(new, old):
            return jnp.where(act, new, old)

        info2 = NmpcInfo(
            converged=info.converged | (converged & act),
            sqp_iters=info.sqp_iters + act.astype(jnp.int32),
            theta=upd(theta0, info.theta),
            phi=upd(phi0, info.phi),
            dphi=upd(dphi, info.dphi),
            alpha=upd(alpha2, info.alpha),
            max_defect=upd(max_defect, info.max_defect),
            min_constraint=upd(min_con, info.min_constraint),
            status=jnp.where(act, step_status, info.status),
            ls_trips=info.ls_trips + trips,
        )
        return (xa2, us2, alpha2, info2, it + 1)

    dummy = NmpcInfo(
        converged=jnp.zeros((Bn,), bool),
        sqp_iters=jnp.zeros((Bn,), jnp.int32),
        theta=zeros + jnp.inf, phi=zeros + jnp.inf, dphi=zeros - jnp.inf,
        alpha=state.alpha,
        max_defect=zeros + jnp.inf, min_constraint=zeros - jnp.inf,
        status=jnp.full((Bn,), STATUS_RUNNING, jnp.int32),
        ls_trips=jnp.zeros((Bn,), jnp.int32),
    )
    xa_f, us_f, alpha_f, info_f, _ = lax.while_loop(
        cond, body, (xa0, us0, state.alpha, dummy, jnp.asarray(0, jnp.int32))
    )
    stalled = (info_f.status == STATUS_RUNNING) & (info_f.alpha <= cfg.alpha_min)
    info_f = dataclasses.replace(
        info_f,
        status=jnp.where(stalled, STATUS_MIN_STEP, info_f.status).astype(jnp.int32),
    )
    state_f = NmpcState(x=jnp.transpose(xa_f, (2, 0, 1)),
                        u=jnp.transpose(us_f, (2, 0, 1)), alpha=alpha_f)
    return state_f, info_f


def _solve_batched_soa_spec(params, weights, cfg, state, x0, x_ref):
    """Speculative-acceptance batched solve for the fused kernel path.

    The iteration-synchronous loop (``_solve_batched_soa``) pays, per SQP
    iteration, one fused QP kernel PLUS ~1.13 merit-kernel launches for
    the backtracking line search. But the fused kernel already evaluates
    the merit at the point it linearizes — so evaluate each scenario's
    NEXT line-search candidate (x + alpha dx) directly with the fused
    kernel (`sqp_qp_solve_onepass_cand`): its (theta, phi) decide the
    filter acceptance, and on acceptance its QP solution IS the next
    iteration's direction. Accepted trips (the common case) cost one
    launch; rejected trips only halve alpha (the launch's QP outputs are
    discarded, exactly the work the sequential loop would redo anyway at
    the next accepted point).

    Per-scenario semantics are exactly the reference's sequential SQP +
    backtracking filter line search (NMPC_solver.cpp:200-274): candidates
    are tried in the same alpha order with the same acceptance rule and
    the same freeze/convergence transitions (verified bitwise against the
    synchronous loop in tests/test_sqp_pallas.py). Two DIAGNOSTIC-only
    differences: ``ls_trips`` counts fused-kernel launches (not merit
    evaluations), and a scenario whose line search bottoms out at
    alpha_min freezes immediately with ``sqp_iters = sqp_max_iter``
    instead of burning the remaining iterations re-linearizing the same
    point (identical trajectories/status either way).
    """
    from srbd_nmpc_tpu.ops import sqp_pallas

    Bn = state.x.shape[0]
    dtype = state.x.dtype
    xa0 = jnp.transpose(state.x, (1, 2, 0))
    us0 = jnp.transpose(state.u, (1, 2, 0))
    x0s = jnp.moveaxis(x0, 0, -1)
    if x_ref.ndim == 2:
        xra = jnp.broadcast_to(x_ref[:, :, None], (cfg.N + 1, srbd.NX, Bn))
    else:
        xra = jnp.transpose(x_ref, (1, 2, 0))
    Ac, bc = srbd.constraint_matrix(params)
    max_it = jnp.asarray(cfg.sqp_max_iter, jnp.int32)

    if cfg.planes:
        # plane-phase kernel (ops/sqp_planes): one kernel serves both the
        # bootstrap (alpha = 0) and the candidate trips
        from srbd_nmpc_tpu.ops import sqp_planes

        def _boot(xa, us):
            return sqp_planes.sqp_qp_solve_onepass_planes(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra, jnp.zeros_like(xa), jnp.zeros_like(us),
                jnp.zeros(Bn, dtype), x0s, cfg.mu_barrier,
                cfg.theta_barrier, reg=cfg.reg, block=cfg.pallas_block,
                factor=cfg.park_factor)

        def _cand_at(xa, us, dx_p, du_p, alpha_cand, xra_, x0s_):
            return sqp_planes.sqp_qp_solve_onepass_planes(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra_, dx_p, du_p, alpha_cand, x0s_,
                cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=cfg.pallas_block,
                factor=cfg.park_factor)
    else:
        def _boot(xa, us):
            return sqp_pallas.sqp_qp_solve_onepass(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra, x0s - xa[0], cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=cfg.pallas_block, fold=cfg.fold_forward)

        def _cand_at(xa, us, dx_p, du_p, alpha_cand, xra_, x0s_):
            return sqp_pallas.sqp_qp_solve_onepass_cand(
                params, weights.Q, weights.Qf, weights.R, Ac, bc,
                xa, us, xra_, dx_p, du_p, alpha_cand, x0s_,
                cfg.mu_barrier, cfg.theta_barrier,
                reg=cfg.reg, block=cfg.pallas_block, fold=cfg.fold_forward)

    # --- straggler compaction tiers (cfg.compact): PHASE-structured.
    # TPU gathers run at ~5 GB/s (tools/probe_gather.py), so per-trip
    # gather/scatter is ruinous (the round-5 first cut regressed the
    # bench 192k -> 128k). Instead the solve runs a SEQUENCE of while
    # loops at shrinking widths: the full-width loop exits once the live
    # count fits the next tier, the whole carry is compacted ONCE (live
    # lanes first — stable argsort preserves lane order), the same loop
    # body resumes at the smaller width, and the final results are
    # scattered back outermost-last. Lanes never unfreeze, so a
    # compacted phase never needs lanes it left behind; per-lane kernel
    # math has no cross-lane ops, so results are bitwise identical
    # (tests/test_sqp_planes.py::test_engine_compaction_is_bitwise...).
    tiers = []
    if cfg.compact:
        # tier sweep measurements + the default's rationale: see the
        # compact_tiers field docstring
        for f in cfg.compact_tiers:
            if not isinstance(f, int) or f < 2:
                raise ValueError(
                    f"compact_tiers must be ints >= 2, got {f!r} in "
                    f"{cfg.compact_tiers!r}")
            Bc = Bn // f
            if Bc >= cfg.pallas_block and Bc % cfg.pallas_block == 0:
                tiers.append(Bc)
    tiers.sort(reverse=True)

    # ---- bootstrap: iteration 1's linearize+QP at the initial iterate ----
    dx_p, du_p, dphi_p, aux = _boot(xa0, us0)
    th_p, ph_p, md_p, mc_p = aux
    nan0 = jnp.logical_not(jnp.isfinite(th_p + ph_p + dphi_p))
    conv_p = (dphi_p > cfg.conv_dphi) & (th_p < cfg.conv_theta)
    live = jnp.logical_not(nan0)
    status = jnp.where(nan0, STATUS_NAN_DETECTED, STATUS_RUNNING
                       ).astype(jnp.int32)
    iters = jnp.where(nan0, 1, 0).astype(jnp.int32)
    alpha_acc = state.alpha
    alpha_cand = (state.alpha if cfg.persistent_alpha
                  else jnp.ones_like(state.alpha))
    # info fields (written at freeze/acceptance transitions)
    i_th, i_ph, i_dphi = th_p, ph_p, dphi_p
    i_md, i_mc = md_p, mc_p
    converged = jnp.zeros((Bn,), bool)
    trips = jnp.asarray(0, jnp.int32)
    # safety cap derived from the config: alpha can be halved at most
    # `halvings` times before hitting alpha_min (with persistent alpha
    # the halvings happen once TOTAL across the solve, not per
    # iteration), plus one accepting trip per SQP iteration and slack
    # for the bootstrap/straggler trips. A user-configured tiny
    # alpha_min therefore widens the cap instead of stranding live
    # scenarios mid-line-search at the cap (ADVICE r3).
    import math

    halvings = max(1, int(math.ceil(
        math.log(max(cfg.alpha_min, 1e-30))
        / math.log(min(max(cfg.beta_alpha, 1e-6), 0.999999)))))
    trip_cap = (cfg.sqp_max_iter * (1 if cfg.persistent_alpha
                                    else halvings) + halvings + 16)

    def _run_phase(carry, xra_p, x0s_p, thresh):
        """One while-loop phase at the carry's (static) width; exits when
        the live count fits ``thresh`` (the next tier) or all lanes are
        frozen or the trip cap is hit."""

        def cond(carry):
            _, live, _, trips = carry
            n_live = jnp.sum(live.astype(jnp.int32))
            return (n_live > thresh) & (trips < trip_cap)

        def body(carry):
            (xa, us, dx_p, du_p, dphi_p, th_p, ph_p, md_p, mc_p), live, \
                (status, iters, conv_p, alpha_acc, alpha_cand,
                 i_th, i_ph, i_dphi, i_md, i_mc, converged), trips = carry

            searching = live & (alpha_cand > cfg.alpha_min)
            dx_c, du_c, dphi_c, aux_c = _cand_at(
                xa, us, dx_p, du_p, alpha_cand, xra_p, x0s_p)
            th_c, ph_c, md_c, mc_c = aux_c

            ok = _accept(cfg, th_c, ph_c, alpha_cand, th_p, ph_p, dphi_p) \
                & searching
            reject = searching & jnp.logical_not(ok)
            alpha_next = jnp.where(reject, cfg.beta_alpha * alpha_cand,
                                   alpha_cand)

            # --- acceptance: step, then freeze/continue transitions ---------
            m3 = ok[None, None, :]
            af = alpha_cand[None, None, :]
            xa2 = jnp.where(m3, xa + af * dx_p, xa)
            us2 = jnp.where(m3, us + af * du_p, us)
            alpha_acc2 = jnp.where(ok, alpha_cand, alpha_acc)
            iters2 = iters + ok.astype(jnp.int32)

            conv_c = (dphi_c > cfg.conv_dphi) & (th_c < cfg.conv_theta)
            nan_c = jnp.logical_not(jnp.isfinite(th_c + ph_c + dphi_c))

            succ = ok & conv_p                       # converged at prev iterate
            maxed = ok & jnp.logical_not(conv_p) & (iters2 >= max_it)
            nanfr = (ok & jnp.logical_not(conv_p) & (iters2 < max_it) & nan_c)
            cont = ok & jnp.logical_not(succ | maxed | nanfr)

            # --- rejection bottoming out at alpha_min (or entering the loop
            # already at the floor, e.g. a warm start with a tiny persistent
            # alpha: the synchronous loop burns iterations without moving) ---
            stalled = ((reject & (alpha_next <= cfg.alpha_min))
                       | (live & jnp.logical_not(searching)))
            succ2 = stalled & conv_p
            minstep = stalled & jnp.logical_not(conv_p)
            alpha_acc2 = jnp.where(stalled, alpha_next, alpha_acc2)

            status2 = jnp.where(
                succ | succ2, STATUS_SUCCESS,
                jnp.where(nanfr, STATUS_NAN_DETECTED,
                          jnp.where(minstep, STATUS_MIN_STEP, status))
            ).astype(jnp.int32)
            iters3 = jnp.where(nanfr | succ2, iters2 + 1,
                               jnp.where(minstep, max_it, iters2))
            live2 = live & jnp.logical_not(succ | succ2 | maxed | nanfr
                                           | minstep)
            converged2 = converged | succ | succ2

            # --- info bookkeeping (match the synchronous loop's final info:
            # acceptance-frozen scenarios report the PRE-step point's values;
            # nan/stall-frozen ones report the current pending values) -------
            acc_info = succ | maxed | cont           # pre-step values + alpha
            oth_info = nanfr | succ2 | minstep       # current pending values
            def wr(prev_val, pend_val, cand_val):
                return jnp.where(acc_info, pend_val,
                                 jnp.where(oth_info, cand_val, prev_val))
            i_th2 = wr(i_th, th_p, jnp.where(nanfr, th_c, th_p))
            i_ph2 = wr(i_ph, ph_p, jnp.where(nanfr, ph_c, ph_p))
            i_dphi2 = wr(i_dphi, dphi_p, jnp.where(nanfr, dphi_c, dphi_p))
            i_md2 = wr(i_md, md_p, jnp.where(nanfr, md_c, md_p))
            i_mc2 = wr(i_mc, mc_p, jnp.where(nanfr, mc_c, mc_p))

            # --- pending state: accepted scenarios adopt the candidate ------
            mp = (cont | nanfr)[None, None, :]
            dx_p2 = jnp.where(mp, dx_c, dx_p)
            du_p2 = jnp.where(mp, du_c, du_p)
            up = cont | nanfr
            th_p2 = jnp.where(up, th_c, th_p)
            ph_p2 = jnp.where(up, ph_c, ph_p)
            dphi_p2 = jnp.where(up, dphi_c, dphi_p)
            md_p2 = jnp.where(up, md_c, md_p)
            mc_p2 = jnp.where(up, mc_c, mc_p)
            conv_p2 = jnp.where(cont, conv_c, conv_p)

            alpha_cand2 = jnp.where(
                ok, alpha_cand if cfg.persistent_alpha
                else jnp.ones_like(alpha_cand), alpha_next)

            return ((xa2, us2, dx_p2, du_p2, dphi_p2, th_p2, ph_p2, md_p2,
                     mc_p2), live2,
                    (status2, iters3, conv_p2, alpha_acc2, alpha_cand2,
                     i_th2, i_ph2, i_dphi2, i_md2, i_mc2, converged2),
                    trips + 1)

        return lax.while_loop(cond, body, carry)

    # crossing gathers/scatters: trajectory-sized f32 arrays ride the
    # one-hot-matmul permute kernels (ops/permute_pallas — XLA lane
    # gathers run at ~5 GB/s on TPU; the kernels are bitwise-exact and
    # fall back to jnp.take off-TPU / for small or non-f32 arrays)
    from srbd_nmpc_tpu.ops import permute_pallas as _pp

    def _take_carry(carry, idx):
        S, live, Bk, trips = carry
        g = lambda a: _pp.take_lanes(a, idx)
        return (tuple(g(a) for a in S), g(live),
                tuple(g(a) for a in Bk), trips)

    def _scatter_carry(dst, src, idx):
        # dx_p/du_p (S[2], S[3]) are deliberately NOT scattered back:
        # a frozen lane's pending direction is never read after the loop,
        # and they are the two largest arrays
        S_d, live_d, Bk_d, _ = dst
        S_s, live_s, Bk_s, trips_s = src
        s = lambda d, c: _pp.set_lanes(d, c, idx)
        S_o = tuple(
            d if i in (2, 3) else s(d, c)
            for i, (d, c) in enumerate(zip(S_d, S_s)))
        return (S_o, s(live_d, live_s),
                tuple(s(d, c) for d, c in zip(Bk_d, Bk_s)), trips_s)

    # when x_ref is shared across scenarios (the common case), the phase
    # reference is re-broadcast at each width instead of gathered — xra
    # is one of the largest arrays and its lanes are identical
    shared_ref = x_ref.ndim == 2

    def _xra_at(width):
        return jnp.broadcast_to(x_ref[:, :, None], (cfg.N + 1, srbd.NX,
                                                    width)).astype(dtype)

    carry = ((xa0, us0, dx_p, du_p, dphi_p, th_p, ph_p, md_p, mc_p), live,
             (status, iters, conv_p, alpha_acc, alpha_cand,
              i_th, i_ph, i_dphi, i_md, i_mc, converged),
             trips)
    carry = _run_phase(carry, xra, x0s,
                       thresh=tiers[0] if tiers else 0)
    if tiers:
        # compacted phases: gather the carry once per tier crossing, run
        # the same loop at the smaller width, scatter back afterwards
        # (innermost first: a lane's latest state lives in the innermost
        # tier it entered)
        stack = []  # (outer_carry, idx)
        xra_p, x0s_p = xra, x0s
        for i, Bc in enumerate(tiers):
            live_o = carry[1]
            order = jnp.argsort(jnp.logical_not(live_o))
            # re-sort the selected lanes: the live prefix of `order` is
            # ascending but the dead PAD lanes wrap back to low indices,
            # and the permute kernels require a fully monotonic index
            # list (which pad lanes fill the spare slots is irrelevant)
            idx = jnp.sort(jax.lax.slice_in_dim(order, 0, Bc, axis=0))
            stack.append((carry, idx))
            carry = _take_carry(carry, idx)
            xra_p = (_xra_at(Bc) if shared_ref
                     else _pp.take_lanes(xra_p, idx))
            x0s_p = _pp.take_lanes(x0s_p, idx)
            nxt = tiers[i + 1] if i + 1 < len(tiers) else 0
            carry = _run_phase(carry, xra_p, x0s_p, thresh=nxt)
        for outer, idx in reversed(stack):
            carry = _scatter_carry(outer, carry, idx)

    (xa_f, us_f, *_), live_f, \
        (status_f, iters_f, _, alpha_f, alpha_cand_f,
         f_th, f_ph, f_dphi, f_md, f_mc, converged_f), trips_f = carry

    # live scenarios that hit the trip cap (shouldn't happen) and any
    # residual RUNNING-at-alpha-floor cases report the stall distinctly
    stalled = ((status_f == STATUS_RUNNING)
               & (alpha_cand_f <= cfg.alpha_min))
    status_f = jnp.where(stalled, STATUS_MIN_STEP, status_f
                         ).astype(jnp.int32)
    info = NmpcInfo(
        converged=converged_f,
        sqp_iters=iters_f,
        theta=f_th, phi=f_ph, dphi=f_dphi,
        alpha=alpha_f,
        max_defect=f_md, min_constraint=f_mc,
        status=status_f,
        ls_trips=jnp.broadcast_to(1 + trips_f, (Bn,)).astype(jnp.int32),
    )
    state_f = NmpcState(x=jnp.transpose(xa_f, (2, 0, 1)),
                        u=jnp.transpose(us_f, (2, 0, 1)), alpha=alpha_f)
    return state_f, info


def _solve(params, weights, cfg, state, x0, x_ref):
    if state.x.ndim == 3:
        Bn = state.x.shape[0]
        if (cfg.speculative and not _pscan_selected(cfg)
                and _fused_eligible(cfg, Bn)):
            return _solve_batched_soa_spec(params, weights, cfg, state,
                                           x0, x_ref)
        return _solve_batched_soa(params, weights, cfg, state, x0, x_ref)
    zeros = jnp.zeros(state.alpha.shape, state.x.dtype)

    def cond(carry):
        _, info, it = carry
        return (it < cfg.sqp_max_iter) & jnp.any(info.status == STATUS_RUNNING)

    def body(carry):
        st, info, it = carry
        act = info.status == STATUS_RUNNING
        new_state, step = sqp_step(params, weights, cfg, st, x0, x_ref, active=act)

        def upd(new, old):
            mask = act.reshape(act.shape + (1,) * (new.ndim - act.ndim))
            return jnp.where(mask, new, old)

        st2 = jax.tree.map(upd, new_state, st)
        info2 = NmpcInfo(
            converged=info.converged | (step.converged & act),
            sqp_iters=info.sqp_iters + act.astype(jnp.int32),
            theta=upd(step.theta, info.theta),
            phi=upd(step.phi, info.phi),
            dphi=upd(step.dphi, info.dphi),
            alpha=upd(st2.alpha, info.alpha),
            max_defect=upd(step.max_defect, info.max_defect),
            min_constraint=upd(step.min_constraint, info.min_constraint),
            status=jnp.where(act, step.status, info.status),
            ls_trips=info.ls_trips + step.ls_trips,
        )
        return (st2, info2, it + 1)

    dummy = NmpcInfo(
        converged=jnp.zeros(state.alpha.shape, bool),
        sqp_iters=jnp.zeros(state.alpha.shape, jnp.int32),
        theta=zeros + jnp.inf, phi=zeros + jnp.inf, dphi=zeros - jnp.inf,
        alpha=state.alpha,
        max_defect=zeros + jnp.inf, min_constraint=zeros - jnp.inf,
        status=jnp.full(state.alpha.shape, STATUS_RUNNING, jnp.int32),
        ls_trips=jnp.zeros(state.alpha.shape, jnp.int32),
    )
    state_f, info_f, _ = lax.while_loop(
        cond, body, (state, dummy, jnp.asarray(0, jnp.int32))
    )
    # scenarios still RUNNING ran out of SQP iterations; those whose line
    # search bottomed out report the stall distinctly (the silent-stall
    # failure mode flagged in round 1: a NaN merit used to exhaust
    # iterations indistinguishably from slow convergence).
    stalled = (info_f.status == STATUS_RUNNING) & (info_f.alpha <= cfg.alpha_min)
    info_f = dataclasses.replace(
        info_f,
        status=jnp.where(stalled, STATUS_MIN_STEP, info_f.status).astype(jnp.int32),
    )
    return state_f, info_f


def shift_state(state: NmpcState, steps: int = 1) -> NmpcState:
    """Receding-horizon warm start: shift trajectories ``steps`` stages
    forward, repeating the terminal entries.

    The reference warm-starts only implicitly (x_nmpc_/u_nmpc_ persist
    across controlLoop repetitions, NMPC_solver.h:70-71); for real
    receding-horizon use the shifted previous solution is the standard
    initializer — it keeps theta tiny so the SQP typically converges in
    1-2 iterations per cycle.
    """
    x = jnp.concatenate(
        [state.x[..., steps:, :],
         jnp.repeat(state.x[..., -1:, :], steps, axis=-2)], axis=-2)
    u = jnp.concatenate(
        [state.u[..., steps:, :],
         jnp.repeat(state.u[..., -1:, :], steps, axis=-2)], axis=-2)
    return NmpcState(x=x, u=u, alpha=jnp.ones_like(state.alpha))


def make_benchmark_problem(cfg: NmpcConfig, dtype=jnp.float32):
    """The reference benchmark scenario: stance with a yaw/forward/height
    reference step. Ref: setupDynamics/setupReference (NMPC_solver.cpp:332-351)."""
    x0 = jnp.zeros(srbd.NX, dtype).at[8].set(1.0)
    x_ref_k = jnp.zeros(srbd.NX, dtype).at[2].set(0.2).at[6].set(0.5).at[8].set(1.0)
    x_ref = jnp.broadcast_to(x_ref_k, (cfg.N + 1, srbd.NX))
    return x0, x_ref
