"""Fast lane-dimension compaction permutes as Pallas TPU kernels.

XLA's gather/scatter on the minor (lane) axis runs at ~5 GB/s on this
chip (tools/probe_gather.py) — it scalarizes the lane shuffle. The
straggler-compaction crossings of the speculative NMPC solve
(nmpc/engine._solve_batched_soa_spec) need exactly one restricted form:
a permutation by a MONOTONICALLY INCREASING index list (stable
compaction: live lanes first, original order preserved). Monotonicity
makes the shuffle local — the source lanes of one 256-lane output block
span a short contiguous window of input blocks — so it can be written
as a windowed ONE-HOT MATMUL that rides the MXU:

  gather  out[:, j] = a[:, idx[j]]:
      for output block j, for window step w:
          X   = input tile at block sb[j] + w            [R, 256]
          S   = (global source ids of X == idx tile j)   [256, 256] one-hot
          acc += X @ S                                   (MXU)
      one-hot matmuls are EXACT in any precision (each output sums one
      x*1.0 term; bf16(1.0) is exact and the f32 split x_hi + x_lo
      re-adds exactly), so the result is bitwise the jnp.take result.

  scatter dst[:, idx[p]] = src[:, p], other lanes from ``orig``:
      the source positions feeding one destination block are <= 256
      consecutive p (idx strictly increasing), i.e. AT MOST 2 source
      blocks — a fixed window-2 kernel with a coverage mask, no
      fallback needed.

The gather's window is static; if the live set is locally sparser than
window/1 (span overflow), the caller falls back to jnp.take inside a
lax.cond — correctness never depends on the window.

Used by the engine for the f32 trajectory-sized carries; [B]-sized
bookkeeping stays on jnp.take (sub-ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 256


def _gather_kernel(sb_ref, idx_ref, a_ref, out_ref, acc,
                   *, block: int, window: int, nin: int):
    j = pl.program_id(0)
    w = pl.program_id(1)
    intended = sb_ref[j] + w
    X = a_ref[...]                               # [R, block]
    idxt = idx_ref[...]                          # [1, block] int32
    # compare against the INTENDED global source ids: a clamped fetch
    # (intended >= nin) compares ids >= B against idx < B -> all-zero S,
    # so out-of-range window steps contribute nothing
    rows = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            + intended * block)
    S = (rows == idxt).astype(X.dtype)
    part = jax.lax.dot_general(
        X, S, (((1,), (0,)), ((), ())),
        preferred_element_type=X.dtype,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(w == 0)
    def _():
        acc[...] = part

    @pl.when(w > 0)
    def _():
        acc[...] = acc[...] + part

    @pl.when(w == window - 1)
    def _():
        out_ref[...] = acc[...]


def _gather_pallas(a2: jnp.ndarray, idx: jnp.ndarray, sb: jnp.ndarray,
                   window: int) -> jnp.ndarray:
    R, B = a2.shape
    Bc = idx.shape[0]
    block = _BLOCK
    nin, nout = B // block, Bc // block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nout, window),
        in_specs=[
            pl.BlockSpec((1, block), lambda j, w, sb: (0, j)),
            pl.BlockSpec(
                (R, block),
                lambda j, w, sb: (0, jnp.minimum(sb[j] + w, nin - 1))),
        ],
        out_specs=pl.BlockSpec((R, block), lambda j, w, sb: (0, j)),
        scratch_shapes=[pltpu.VMEM((R, block), a2.dtype)],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, block=block, window=window,
                          nin=nin),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, Bc), a2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(sb, idx.reshape(1, Bc), a2)


def take_lanes(a: jnp.ndarray, idx: jnp.ndarray, window: int = 8,
               force: bool = False) -> jnp.ndarray:
    """``jnp.take(a, idx, axis=-1)`` for SORTED-ascending unique ``idx``,
    via the one-hot-matmul Pallas kernel when eligible (TPU backend or
    ``force``, f32, widths divisible by 256); falls back to jnp.take
    otherwise, and dynamically (lax.cond) when the local live density is
    below 256/(window*256) so a source span overflows the window."""
    B = a.shape[-1]
    Bc = idx.shape[0]
    eligible = (
        (force or jax.default_backend() == "tpu")
        and a.dtype == jnp.float32
        and a.ndim >= 2
        and B % _BLOCK == 0 and Bc % _BLOCK == 0
        and B >= Bc and Bc >= _BLOCK
    )
    if not eligible:
        return jnp.take(a, idx, axis=-1)

    idx = idx.astype(jnp.int32)
    nin = B // _BLOCK
    starts = idx[:: _BLOCK] // _BLOCK                      # [nout]
    ends = idx[_BLOCK - 1:: _BLOCK] // _BLOCK
    sb = jnp.minimum(starts, nin - window) if nin > window else \
        jnp.zeros_like(starts)
    sb = jnp.maximum(sb, 0)
    fits = jnp.all(ends - sb <= window - 1)

    shape = a.shape
    a2 = a.reshape((-1, B))

    def fast(_):
        return _gather_pallas(a2, idx, sb, window)

    def slow(_):
        return jnp.take(a2, idx, axis=-1)

    out2 = jax.lax.cond(fits, fast, slow, None)
    return out2.reshape(shape[:-1] + (Bc,))


def _scatter_kernel(sb_ref, idx_ref, src_ref, orig_ref, out_ref,
                    acc, cov, *, block: int, ns: int):
    i = pl.program_id(0)
    w = pl.program_id(1)
    intended = sb_ref[i] + w
    T = src_ref[...]                             # [R, block] src tile
    idxt = idx_ref[...]                          # [1, block] dst lane ids
    # S1[ld, ls] = (dst lane base+ld == idx of src position ls); the
    # scatter is then T @ S1' via a dim-1/dim-1 contraction — no
    # materialized transpose, and the one-hot matmul is exact. A clamped
    # re-fetch (intended >= ns) would double-count tile ns-1, so S1 is
    # zeroed for out-of-range window steps.
    rows = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            + i * block)
    S1 = jnp.where(intended < ns, (rows == idxt).astype(T.dtype),
                   jnp.zeros((block, block), T.dtype))
    part = jax.lax.dot_general(
        T, S1, (((1,), (1,)), ((), ())),
        preferred_element_type=T.dtype,
        precision=jax.lax.Precision.HIGHEST)
    c_part = jax.lax.dot_general(
        jnp.ones((1, block), T.dtype), S1, (((1,), (1,)), ((), ())),
        preferred_element_type=T.dtype,
        precision=jax.lax.Precision.HIGHEST)    # [1, block] coverage

    @pl.when(w == 0)
    def _():
        acc[...] = part
        cov[...] = c_part

    @pl.when(w == 1)
    def _():
        O = orig_ref[...]
        c = cov[...] + c_part
        out_ref[...] = O * (1.0 - c) + acc[...] + part


def set_lanes(orig: jnp.ndarray, src: jnp.ndarray, idx: jnp.ndarray,
              force: bool = False) -> jnp.ndarray:
    """``orig.at[..., idx].set(src)`` for SORTED-ascending unique ``idx``
    via the window-2 one-hot scatter kernel (a destination block's source
    positions are <= 256 consecutive entries of ``src``, so two source
    blocks always suffice — no fallback path needed when eligible)."""
    B = orig.shape[-1]
    Bc = idx.shape[0]
    eligible = (
        (force or jax.default_backend() == "tpu")
        and orig.dtype == jnp.float32 and src.dtype == jnp.float32
        and orig.ndim >= 2
        and B % _BLOCK == 0 and Bc % _BLOCK == 0
        and B >= Bc and Bc >= _BLOCK
    )
    if not eligible:
        return orig.at[..., idx].set(src)

    idx = idx.astype(jnp.int32)
    ns = Bc // _BLOCK
    nfull = B // _BLOCK
    # first src position landing in dst block i, as a src-block index
    lo = jnp.searchsorted(idx, jnp.arange(nfull, dtype=jnp.int32) * _BLOCK
                          ).astype(jnp.int32)
    sb = jnp.minimum(lo // _BLOCK, ns - 1)

    shape = orig.shape
    o2 = orig.reshape((-1, B))
    s2 = src.reshape((-1, Bc))
    R = o2.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nfull, 2),
        in_specs=[
            pl.BlockSpec(
                (1, _BLOCK),
                lambda i, w, sb: (0, jnp.minimum(sb[i] + w, ns - 1))),
            pl.BlockSpec(
                (R, _BLOCK),
                lambda i, w, sb: (0, jnp.minimum(sb[i] + w, ns - 1))),
            pl.BlockSpec((R, _BLOCK), lambda i, w, sb: (0, i)),
        ],
        out_specs=pl.BlockSpec((R, _BLOCK), lambda i, w, sb: (0, i)),
        scratch_shapes=[pltpu.VMEM((R, _BLOCK), jnp.float32),
                        pltpu.VMEM((1, _BLOCK), jnp.float32)],
    )
    out2 = pl.pallas_call(
        functools.partial(_scatter_kernel, block=_BLOCK, ns=ns),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(sb, idx.reshape(1, Bc), s2, o2)
    return out2.reshape(shape)
