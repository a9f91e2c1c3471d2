"""Fused Pallas TPU kernel for the batched Riccati solve.

The XLA SoA path (ops.riccati_soa) runs the backward/forward recursions as
`lax.scan`s whose carries and per-stage intermediates round-trip through
HBM every stage; at nx=nu=12 that leaves it far from the memory roofline.
This kernel runs the ENTIRE solve — backward factorization, vector
recursion and forward rollout — inside one `pallas_call` per scenario
block: the value matrix P, gains K/k and all temporaries live in VMEM, and
HBM is touched exactly once per stage datum.

Layout: SoA with the scenario block in the lanes — stage arrays
``[N, 12, 12, BLOCK]`` (BLOCK lanes per grid step). All matrix products
are expanded as k-loops of rank-1 [12,12,BLOCK] updates (the same
batch-in-lanes trick as ops.smallmat, here guaranteed to stay in VMEM).
The Cholesky factorization is the right-looking rank-1 form, 12 columns
unrolled, division-free via `rsqrt`.

Specialized to the NMPC hot path: S = 0 (the engine's delta-QPs have no
cross term, NMPC_solver.cpp:55-58 sets S=0). The generic fallback is the
XLA path in ops.riccati_soa.

STATUS: numerically validated (interpret mode == riccati_soa to f32
rounding, tests/test_riccati_pallas.py) and compiles+runs on TPU for
horizons up to N~5. At N=20 the Mosaic compiler in this image's
remote-compile toolchain fails on both the fully-unrolled and the
fori_loop-with-scratch variants (tpu_compile_helper exit 1 / hang), so the
engine keeps the XLA SoA kernel as the production path — which already
exceeds the throughput target. Revisit with a newer Mosaic; the win at
stake is removing per-stage HBM round-trips of the scan carries
(~10x headroom per the memory roofline).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 12


# static-integer indexing helpers that lower to slices (plain jnp int
# indexing mixed with None lowers to `gather`, which Mosaic rejects)
def _row(a, i):
    """a[i] keeping dims: [n, ...] -> [1, ...]."""
    return jax.lax.slice_in_dim(a, i, i + 1, axis=0)


def _col(a, k):
    """a[:, k] keeping dims: [n, m, ...] -> [n, 1, ...]."""
    return jax.lax.slice_in_dim(a, k, k + 1, axis=1)


def _at(a, *idx):
    """a[i, j, ...] with static ints, squeezing the indexed axes."""
    out = a
    for ax, i in enumerate(idx):
        out = jax.lax.slice_in_dim(out, i, i + 1, axis=ax)
    return out.reshape(a.shape[len(idx):])


def _mm(a, b):
    """[n,k,B] @ [k,m,B] -> [n,m,B], k-loop of rank-1 updates."""
    nk = a.shape[1]
    acc = _col(a, 0) * _row(b, 0)
    for k in range(1, nk):
        acc = acc + _col(a, k) * _row(b, k)
    return acc


def _mtm(a, b):
    """a' @ b: [k,n,B]' @ [k,m,B] -> [n,m,B]."""
    nk = a.shape[0]
    acc = jnp.swapaxes(_row(a, 0), 0, 1) * _row(b, 0)
    for k in range(1, nk):
        acc = acc + jnp.swapaxes(_row(a, k), 0, 1) * _row(b, k)
    return acc


def _mv(a, v):
    """[n,k,B] @ [k,B] -> [n,B]."""
    nk = a.shape[1]
    acc = jnp.squeeze(_col(a, 0), 1) * _row(v, 0)
    for k in range(1, nk):
        acc = acc + jnp.squeeze(_col(a, k), 1) * _row(v, k)
    return acc


def _mtv(a, v):
    """a' @ v: [k,n,B]' @ [k,B] -> [n,B]."""
    nk = a.shape[0]
    acc = jnp.squeeze(_row(a, 0), 0) * _row(v, 0)
    for k in range(1, nk):
        acc = acc + jnp.squeeze(_row(a, k), 0) * _row(v, k)
    return acc


def _chol(G):
    """Right-looking Cholesky of [n,n,B]; returns (L, dinv [n,B])."""
    n = G.shape[0]
    S = G
    cols = []
    dinvs = []
    for j in range(n):
        dinv = jax.lax.rsqrt(_at(S, j, j))            # [B]
        col_full = jnp.squeeze(_col(S, j), 1) * dinv[None]    # [n,B]
        mask = (jnp.arange(n) >= j).astype(G.dtype)[:, None]
        col = col_full * mask
        cols.append(col)
        dinvs.append(dinv)
        if j + 1 < n:
            S = S - col[:, None, :] * col[None, :, :]
    L = jnp.stack(cols, axis=1)
    return L, jnp.stack(dinvs, axis=0)


def _chol_solve_mat(L, dinv, R):
    """(L L') X = R for R [n,m,B]."""
    n = L.shape[0]
    Y = R
    ys = []
    for i in range(n):
        yi = jnp.squeeze(_row(Y, i), 0) * _row(dinv, i)             # [m,B]
        ys.append(yi)
        if i + 1 < n:
            Y = Y - _col(L, i) * yi[None, :, :]
    X = jnp.stack(ys)
    xs = [None] * n
    for i in reversed(range(n)):
        xi = jnp.squeeze(_row(X, i), 0) * _row(dinv, i)
        xs[i] = xi
        if i > 0:
            X = X - jnp.swapaxes(_row(L, i), 0, 1) * xi[None, :, :]
    return jnp.stack(xs)


def _kernel(A_ref, B_ref, b_ref, Q_ref, R_ref, q_ref, r_ref, x0_ref,
            x_ref, u_ref, K_scr, k_scr, reg: float, N: int):
    """Stage loops as `fori_loop`s with dynamic ref slicing, so the Mosaic
    program size is independent of the horizon (an unrolled version blows
    the compiler past N~10)."""
    dtype = x0_ref.dtype
    reg_c = jnp.asarray(reg, dtype)
    eye_reg = reg_c * jnp.eye(NX, dtype=dtype)[:, :, None]

    def load3(ref, t):
        return jnp.squeeze(ref[pl.ds(t, 1)], 0)

    # ---- backward: carry (P, p); gains stored to VMEM scratch ----
    def back_body(i, carry):
        P, p = carry
        t = N - 1 - i
        A = load3(A_ref, t)
        B = load3(B_ref, t)
        PA = _mm(P, A)
        PB = _mm(P, B)
        G = load3(R_ref, t) + _mtm(B, PB) + eye_reg
        H = _mtm(B, PA)
        L, dinv = _chol(G)
        K = -_chol_solve_mat(L, dinv, H)
        Pb_p = _mv(P, load3(b_ref, t)) + p
        kv = -jnp.squeeze(
            _chol_solve_mat(L, dinv, (_mtv(B, Pb_p) + load3(r_ref, t))[:, None, :]), 1)
        P_new = load3(Q_ref, t) + _mtm(A, PA) + _mtm(H, K)
        P = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
        p = load3(q_ref, t) + _mtv(A, Pb_p) + _mtv(H, kv)
        K_scr[pl.ds(t, 1)] = K[None]
        k_scr[pl.ds(t, 1)] = kv[None]
        return (P, p)

    P0 = load3(Q_ref, N)
    p0 = load3(q_ref, N)
    jax.lax.fori_loop(0, N, back_body, (P0, p0))

    # ---- forward rollout ----
    x0 = x0_ref[:]
    x_ref[pl.ds(0, 1)] = x0[None]

    def fwd_body(t, x):
        u = _mv(load3(K_scr, t), x) + load3(k_scr, t)
        u_ref[pl.ds(t, 1)] = u[None]
        x_next = _mv(load3(A_ref, t), x) + _mv(load3(B_ref, t), u) + load3(b_ref, t)
        x_ref[pl.ds(t + 1, 1)] = x_next[None]
        return x_next

    jax.lax.fori_loop(0, N, fwd_body, x0)


def lqr_solve_pallas(
    A: jnp.ndarray, B: jnp.ndarray, b: jnp.ndarray,
    Q: jnp.ndarray, R: jnp.ndarray, q: jnp.ndarray, r: jnp.ndarray,
    x0: jnp.ndarray, reg: float = 0.0, block: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused LQR solve (S = 0). SoA inputs:
    A,B [N,12,12,Bt], b [N,12,Bt], Q [N+1,12,12,Bt], R [N,12,12,Bt],
    q [N+1,12,Bt], r [N,12,Bt], x0 [12,Bt]. Returns (x [N+1,12,Bt],
    u [N,12,Bt]).
    """
    N = A.shape[0]
    Bt = A.shape[-1]
    assert Bt % block == 0, (Bt, block)
    grid = (Bt // block,)
    dtype = A.dtype

    def im_stage(i):  # [N, 12, 12, Bt] blocked on lanes
        return lambda g: (0, 0, 0, g)

    specs = [
        pl.BlockSpec((N, NX, NX, block), lambda g: (0, 0, 0, g)),      # A
        pl.BlockSpec((N, NX, NX, block), lambda g: (0, 0, 0, g)),      # B
        pl.BlockSpec((N, NX, block), lambda g: (0, 0, g)),             # b
        pl.BlockSpec((N + 1, NX, NX, block), lambda g: (0, 0, 0, g)),  # Q
        pl.BlockSpec((N, NX, NX, block), lambda g: (0, 0, 0, g)),      # R
        pl.BlockSpec((N + 1, NX, block), lambda g: (0, 0, g)),         # q
        pl.BlockSpec((N, NX, block), lambda g: (0, 0, g)),             # r
        pl.BlockSpec((NX, block), lambda g: (0, g)),                   # x0
    ]
    out_specs = [
        pl.BlockSpec((N + 1, NX, block), lambda g: (0, 0, g)),
        pl.BlockSpec((N, NX, block), lambda g: (0, 0, g)),
    ]
    kernel = functools.partial(_kernel, reg=reg, N=N)
    x, u = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, NX, Bt), dtype),
            jax.ShapeDtypeStruct((N, NX, Bt), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, NX, NX, block), dtype),   # K
            pltpu.VMEM((N, NX, block), dtype),       # k
        ],
    )(A, B, b, Q, R, q, r, x0)
    return x, u
