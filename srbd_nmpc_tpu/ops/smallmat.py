"""Small-matrix kernels in SoA ("batch-in-lanes") layout.

TPU-native replacement for what BLASFEO's panel-major small-matrix kernels
do for the reference stack (SURVEY.md C7): the OCP stage matrices are tiny
(12x12, 12x24 — SRBD_model.cpp:21-23), which maps catastrophically onto
XLA's default layouts — a batched [B,12,12] dot_general pads each 12x12 to
MXU tiles (~100x wasted bandwidth; measured ~2 ms for B=4096 where the
roofline is ~10 us). These kernels instead store matrices as
``[n, m, B]`` — batch in the trailing (lane) dimension — and expand the
contraction as an unrolled k-loop of rank-1 outer products, so XLA emits
~n fused [n,m,B] VPU ops: measured 0.037 ms for the same matmul (~50x).

All functions take/return arrays with TRAILING batch axes (any number,
usually one) and leading static matrix dims. The contraction loops are
Python-unrolled over static dims (n <= ~32), keeping compile time modest.

Indexing discipline: static integer indices are expressed through
`lax.slice_in_dim` + reshape (`_row`/`_col`/`_at`), never `a[i]` mixed
with `None` — the latter lowers to `gather`, which the Mosaic (Pallas TPU)
compiler rejects. This keeps every helper here usable INSIDE Pallas
kernels as well as in plain XLA code (ops.riccati_pallas builds on them).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _row(a: jnp.ndarray, i: int) -> jnp.ndarray:
    """a[i:i+1] — row i keeping dims: [n, ...] -> [1, ...]."""
    return jax.lax.slice_in_dim(a, i, i + 1, axis=0)


def _col(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a[:, k:k+1] — column k keeping dims: [n, m, ...] -> [n, 1, ...]."""
    return jax.lax.slice_in_dim(a, k, k + 1, axis=1)


def _at(a: jnp.ndarray, *idx: int) -> jnp.ndarray:
    """a[i, j, ...] with static ints, squeezing the indexed axes."""
    out = a
    for ax, i in enumerate(idx):
        out = jax.lax.slice_in_dim(out, i, i + 1, axis=ax)
    return out.reshape(a.shape[len(idx):])


def row(a: jnp.ndarray, i: int) -> jnp.ndarray:
    """a[i] squeezed: [n, ...] -> [...]."""
    return jnp.squeeze(_row(a, i), 0)


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """C[i,j,...] = sum_k a[i,k,...] b[k,j,...]  (SoA matmul)."""
    n_k = a.shape[1]
    acc = _col(a, 0) * _row(b, 0)
    for k in range(1, n_k):
        acc = acc + _col(a, k) * _row(b, k)
    return acc


def mtm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """C[i,j,...] = sum_k a[k,i,...] b[k,j,...]  (a' @ b)."""
    n_k = a.shape[0]
    acc = jnp.swapaxes(_row(a, 0), 0, 1) * _row(b, 0)
    for k in range(1, n_k):
        acc = acc + jnp.swapaxes(_row(a, k), 0, 1) * _row(b, k)
    return acc


def mmt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """C[i,j,...] = sum_k a[i,k,...] b[j,k,...]  (a @ b')."""
    n_k = a.shape[1]
    acc = _col(a, 0) * jnp.swapaxes(_col(b, 0), 0, 1)
    for k in range(1, n_k):
        acc = acc + _col(a, k) * jnp.swapaxes(_col(b, k), 0, 1)
    return acc


def mv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """y[i,...] = sum_k a[i,k,...] v[k,...]."""
    n_k = a.shape[1]
    acc = jnp.squeeze(_col(a, 0), 1) * _row(v, 0)
    for k in range(1, n_k):
        acc = acc + jnp.squeeze(_col(a, k), 1) * _row(v, k)
    return acc


def mtv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """y[i,...] = sum_k a[k,i,...] v[k,...]  (a' @ v)."""
    n_k = a.shape[0]
    acc = jnp.squeeze(_row(a, 0), 0) * _row(v, 0)
    for k in range(1, n_k):
        acc = acc + jnp.squeeze(_row(a, k), 0) * _row(v, k)
    return acc


def transpose(a: jnp.ndarray) -> jnp.ndarray:
    """Swap the two leading (matrix) axes."""
    return jnp.swapaxes(a, 0, 1)


def gram(y: jnp.ndarray) -> jnp.ndarray:
    """y' y for SoA y [k, n, ...], exploiting symmetry: computes the top
    [h, n] strip and the bottom-right [n-h, n-h] block (h = n//2) and
    mirrors the off-diagonal block — 25 % fewer FMAs at n = 12 than
    ``mtm(y, y)`` for one cheap [h, n-h] leading<->second-minor swap.

    BITWISE-identical to ``mtm(y, y)`` followed by any downstream
    0.5*(X + X') symmetrization: each computed entry uses the same
    k-order as mtm, entry (i,j) and (j,i) of mtm(y, y) are already
    bitwise equal (same products — fp multiply is commutative — summed
    in the same order), and the mirror copies bits instead of
    recombining them."""
    n = y.shape[1]
    h = n // 2
    yt = jax.lax.slice_in_dim(y, 0, h, axis=1)
    yb = jax.lax.slice_in_dim(y, h, n, axis=1)
    top = mtm(yt, y)                                   # [h, n, ...]
    br = mtm(yb, yb)                                   # [n-h, n-h, ...]
    tr = jax.lax.slice_in_dim(top, h, n, axis=1)       # [h, n-h, ...]
    bottom = jnp.concatenate([jnp.swapaxes(tr, 0, 1), br], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def sym(a: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (a + transpose(a))


def add_diag(a: jnp.ndarray, val) -> jnp.ndarray:
    """a + val * I on the leading two axes."""
    n = a.shape[0]
    eye = jnp.eye(n, dtype=a.dtype).reshape((n, n) + (1,) * (a.ndim - 2))
    return a + val * eye


def cholesky(G: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Right-looking Cholesky of an SPD [n,n,...] SoA matrix.

    Returns (L, dinv) where L is lower-triangular (zeros above) and
    dinv[j,...] = 1/L[j,j,...] (precomputed with `rsqrt`, division-free —
    divisions are several times costlier than multiplies on the VPU).
    """
    n = G.shape[0]
    dtype = G.dtype
    batch_nd = G.ndim - 2
    S = G
    cols = []
    dinvs = []
    idx = jnp.arange(n)
    for j in range(n):
        dinv = jax.lax.rsqrt(_at(S, j, j))
        mask = (idx >= j).astype(dtype).reshape((n,) + (1,) * batch_nd)
        col = jnp.squeeze(_col(S, j), 1) * dinv[None] * mask   # [n, ...]
        cols.append(col)
        dinvs.append(dinv)
        if j + 1 < n:
            S = S - col[:, None] * col[None, :]
    L = jnp.stack(cols, axis=1)              # [n, n, ...]
    dinv = jnp.stack(dinvs, axis=0)          # [n, ...]
    return L, dinv


def fwd_subst(L: jnp.ndarray, dinv: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Solve L Y = R (lower-triangular forward substitution) for SoA rhs
    R [n, m, ...], given ``cholesky`` output. Y = L^-1 R satisfies
    Y'Y = R' (L L')^-1 R — enough for Schur-complement downdates without
    the backward pass (see sqp_pallas._riccati_stage_structured)."""
    n = L.shape[0]
    Y = R
    ys = []
    for i in range(n):
        yi = jnp.squeeze(_row(Y, i), 0) * _row(dinv, i)
        ys.append(yi)
        if i + 1 < n:
            Y = Y - _col(L, i) * yi[None]
    return jnp.stack(ys, axis=0)


def bwd_subst(L: jnp.ndarray, dinv: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Solve L' X = Y (upper-triangular backward substitution)."""
    n = L.shape[0]
    xs = [None] * n
    X = Y
    for i in reversed(range(n)):
        xi = jnp.squeeze(_row(X, i), 0) * _row(dinv, i)
        xs[i] = xi
        if i > 0:
            X = X - jnp.swapaxes(_row(L, i), 0, 1) * xi[None]
    return jnp.stack(xs, axis=0)


def chol_solve(L: jnp.ndarray, dinv: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L') X = R for SoA rhs R [n, m, ...], given ``cholesky`` output."""
    return bwd_subst(L, dinv, fwd_subst(L, dinv, R))


def chol_solve_vec(L: jnp.ndarray, dinv: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L') x = r for a vector rhs r [n, ...]."""
    return jnp.squeeze(chol_solve(L, dinv, r[:, None]), 1)


def to_soa(a: jnp.ndarray, batch_axes: int = 1) -> jnp.ndarray:
    """Move ``batch_axes`` leading axes to the back: [B, n, m] -> [n, m, B]."""
    perm = tuple(range(batch_axes, a.ndim)) + tuple(range(batch_axes))
    return jnp.transpose(a, perm)


def from_soa(a: jnp.ndarray, batch_axes: int = 1) -> jnp.ndarray:
    """Inverse of ``to_soa``: [n, m, B] -> [B, n, m]."""
    nb = a.ndim - batch_axes
    perm = tuple(range(nb, a.ndim)) + tuple(range(nb))
    return jnp.transpose(a, perm)
