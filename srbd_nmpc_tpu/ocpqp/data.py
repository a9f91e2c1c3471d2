"""OCP-QP data model: stage-stacked arrays as a JAX pytree.

Replaces the reference's per-stage ``std::vector<hpipm::OcpQp>``
(/root/reference/hpipm-cpp/include/hpipm-cpp/ocp_qp.hpp:15-177) with one
pytree of stacked arrays so the full horizon is a single `lax.scan` operand
and scenario batches are `vmap`ped without Python loops.

The QP solved over stages i = 0..N-1 (terminal N):

    min  sum_i 1/2 x_i' Q_i x_i + u_i' S_i x_i + 1/2 u_i' R_i u_i
              + q_i' x_i + r_i' u_i      (+ terminal 1/2 x_N' Q_N x_N + q_N' x_N)
    s.t. x_{i+1} = A_i x_i + B_i u_i + b_i
         lbx <= x[idxbx] <= ubx          (stages 1..N; stage 0 is eliminated
                                          by the fixed initial state, as in
                                          ocp_qp_ipm_solver.cpp:127-139)
         lbu <= u[idxbu] <= ubu          (stages 0..N-1)
         lg  <= C x + D u <= ug          (stages 0..N; D only < N)

Masks (0 disables a bound, 1 keeps it) follow HPIPM semantics
(ocp_qp.hpp:74-141, applied at ocp_qp_ipm_solver.cpp:292-321).

Dimension bookkeeping note: the reference infers ``nbx/nbu/ng`` per stage
(ocp_qp_dim.cpp:32-56) and allows them to vary; for static-shape XLA
compilation this pytree fixes one ``(nbx, nbu, ng)`` triple for the whole
horizon — per-stage variation is expressed with masks instead. This is a
deliberate TPU-first redesign, not an omission.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OcpQpDims:
    """Static dimensions of an OCP-QP.

    Ref: ``hpipm::OcpQpDim`` (ocp_qp_dim.hpp / ocp_qp_dim.cpp:19-246) —
    but uniform across stages (see module docstring).
    """

    N: int = _field(metadata=dict(static=True))
    nx: int = _field(metadata=dict(static=True))
    nu: int = _field(metadata=dict(static=True))
    nbx: int = _field(metadata=dict(static=True), default=0)
    nbu: int = _field(metadata=dict(static=True), default=0)
    ng: int = _field(metadata=dict(static=True), default=0)
    ns: int = _field(metadata=dict(static=True), default=0)

    @property
    def n_ineq_per_stage(self) -> int:
        return self.nbx + self.nbu + self.ng

    @property
    def has_constraints(self) -> bool:
        return self.n_ineq_per_stage > 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OcpQp:
    """Stage-stacked OCP-QP data (one scenario; vmap for batches).

    Shapes (N = horizon):
      A [N,nx,nx]  B [N,nx,nu]  b [N,nx]
      Q [N+1,nx,nx]  q [N+1,nx]  S [N,nu,nx]  R [N,nu,nu]  r [N,nu]
      lbx/ubx/lbx_mask/ubx_mask [N+1,nbx]   (row 0 is ignored: x0 is fixed)
      lbu/ubu/lbu_mask/ubu_mask [N,nbu]
      C [N+1,ng,nx]  D [N,ng,nu]  lg/ug/lg_mask/ug_mask [N+1,ng]
    ``idxbx``/``idxbu`` are static index tuples (uniform across stages).

    Ref fields: ocp_qp.hpp:15-177, including the soft-constraint surface
    (Zl/Zu/zl/zu/idxs/lls/lus — fields below, solved by ocpqp.ipm via
    slack elimination, validated in tests/test_ipm_soft.py).
    """

    A: jnp.ndarray
    B: jnp.ndarray
    b: jnp.ndarray
    Q: jnp.ndarray
    S: jnp.ndarray
    R: jnp.ndarray
    q: jnp.ndarray
    r: jnp.ndarray

    idxbx: Tuple[int, ...] = _field(metadata=dict(static=True), default=())
    lbx: Optional[jnp.ndarray] = None
    ubx: Optional[jnp.ndarray] = None
    lbx_mask: Optional[jnp.ndarray] = None
    ubx_mask: Optional[jnp.ndarray] = None

    idxbu: Tuple[int, ...] = _field(metadata=dict(static=True), default=())
    lbu: Optional[jnp.ndarray] = None
    ubu: Optional[jnp.ndarray] = None
    lbu_mask: Optional[jnp.ndarray] = None
    ubu_mask: Optional[jnp.ndarray] = None

    C: Optional[jnp.ndarray] = None
    D: Optional[jnp.ndarray] = None
    lg: Optional[jnp.ndarray] = None
    ug: Optional[jnp.ndarray] = None
    lg_mask: Optional[jnp.ndarray] = None
    ug_mask: Optional[jnp.ndarray] = None

    # Soft constraints (ocp_qp.hpp:144-176): constraints listed in ``idxs``
    # are relaxed by slack variables s_l, s_u >= lls/lus with penalty
    # 1/2 s_l' Zl s_l + zl' s_l + 1/2 s_u' Zu s_u + zu' s_u.
    # ``idxs`` indexes into this package's stacked per-stage constraint
    # ordering [box-x rows, box-u rows, general rows] (HPIPM's own order is
    # box-u-first; translate indices when porting problems).
    idxs: Tuple[int, ...] = _field(metadata=dict(static=True), default=())
    Zl: Optional[jnp.ndarray] = None   # [N+1, ns]
    Zu: Optional[jnp.ndarray] = None
    zl: Optional[jnp.ndarray] = None
    zu: Optional[jnp.ndarray] = None
    lls: Optional[jnp.ndarray] = None
    lus: Optional[jnp.ndarray] = None

    @property
    def dims(self) -> OcpQpDims:
        N, nx, nu = self.A.shape[-3], self.A.shape[-1], self.B.shape[-1]
        nbx = len(self.idxbx)
        nbu = len(self.idxbu)
        ng = 0 if self.C is None else self.C.shape[-2]
        return OcpQpDims(N=N, nx=nx, nu=nu, nbx=nbx, nbu=nbu, ng=ng,
                         ns=len(self.idxs))

    def check(self) -> None:
        """Shape validation mirroring ``OcpQpDim::checkSize``
        (ocp_qp_dim.cpp:59-246): every stacked array must agree with the
        dims inferred from A/B; raises ValueError otherwise."""
        d = self.dims
        N, nx, nu, nbx, nbu, ng = d.N, d.nx, d.nu, d.nbx, d.nbu, d.ng

        def want(name, arr, shape):
            if arr is None:
                return
            if tuple(arr.shape[-len(shape):]) != shape:
                raise ValueError(
                    f"OcpQp.{name}: expected trailing shape {shape}, got {tuple(arr.shape)}"
                )

        want("A", self.A, (N, nx, nx))
        want("B", self.B, (N, nx, nu))
        want("b", self.b, (N, nx))
        want("Q", self.Q, (N + 1, nx, nx))
        want("q", self.q, (N + 1, nx))
        want("S", self.S, (N, nu, nx))
        want("R", self.R, (N, nu, nu))
        want("r", self.r, (N, nu))
        if nbx:
            if not all(0 <= i < nx for i in self.idxbx):
                raise ValueError("OcpQp.idxbx entries must be in [0, nx)")
            want("lbx", self.lbx, (N + 1, nbx))
            want("ubx", self.ubx, (N + 1, nbx))
            want("lbx_mask", self.lbx_mask, (N + 1, nbx))
            want("ubx_mask", self.ubx_mask, (N + 1, nbx))
        if nbu:
            if not all(0 <= i < nu for i in self.idxbu):
                raise ValueError("OcpQp.idxbu entries must be in [0, nu)")
            want("lbu", self.lbu, (N, nbu))
            want("ubu", self.ubu, (N, nbu))
            want("lbu_mask", self.lbu_mask, (N, nbu))
            want("ubu_mask", self.ubu_mask, (N, nbu))
        if ng:
            want("C", self.C, (N + 1, ng, nx))
            want("D", self.D, (N, ng, nu))
            want("lg", self.lg, (N + 1, ng))
            want("ug", self.ug, (N + 1, ng))
            want("lg_mask", self.lg_mask, (N + 1, ng))
            want("ug_mask", self.ug_mask, (N + 1, ng))
        ns = d.ns
        if ns:
            m = nbx + nbu + ng
            if not all(0 <= i < m for i in self.idxs):
                raise ValueError(
                    "OcpQp.idxs entries must index the stacked "
                    "[box-x, box-u, general] rows"
                )
            want("Zl", self.Zl, (N + 1, ns))
            want("Zu", self.Zu, (N + 1, ns))
            want("zl", self.zl, (N + 1, ns))
            want("zu", self.zu, (N + 1, ns))
            want("lls", self.lls, (N + 1, ns))
            want("lus", self.lus, (N + 1, ns))


def unconstrained_qp(A, B, b, Q, S, R, q, r) -> OcpQp:
    """Build an equality-constrained (LQR) OCP-QP from stacked arrays."""
    qp = OcpQp(
        A=jnp.asarray(A), B=jnp.asarray(B), b=jnp.asarray(b),
        Q=jnp.asarray(Q), S=jnp.asarray(S), R=jnp.asarray(R),
        q=jnp.asarray(q), r=jnp.asarray(r),
    )
    qp.check()
    return qp
