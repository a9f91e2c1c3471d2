"""SO(3) / so(3) Lie-algebra toolbox, batched and autodiff-safe.

Functional parity surface with the reference header-only toolbox
(``/root/reference/dynamics/orientation_tool.h``): ``skew``/``unskew``
(:56-71), ``expm`` (:76-86), ``logm`` (:91-124), left Jacobian ``jl``
(:129-140), its inverse ``jl_inv`` (a.k.a. ``jlt``, :145-157), derivatives
``djl`` (:165-204) and ``djl_inv`` (``djlt``, :212-227), and the elementary
rotations ``rotx/roty/rotz`` (:20-51).

Design differences from the reference (TPU-first, not a translation):

- every function broadcasts over arbitrary leading batch dimensions and is
  ``vmap``/``jit``/``grad`` friendly — branches are `jnp.where` selects, not
  Python ``if``;
- the small-angle guard uses the same clamp ``theta >= 1e-10`` as the
  reference (orientation_tool.h:79-81) but is implemented as a *branchless*
  clamped square to keep reverse-mode gradients finite at ``theta == 0``;
- derivative tensors (``djl``/``djl_inv``) are returned stacked on a leading
  axis of size 3 (d/dv_x, d/dv_y, d/dv_z) instead of via output pointers.
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle clamp. The reference uses 1e-10 in double precision
# (orientation_tool.h:79-81); in f32 that would make theta^2 = 1e-20
# underflow to 0 (-> 0/0 = NaN), so the clamp is dtype-aware: below the
# clamp every coefficient is already equal to its theta->0 limit to within
# the dtype's epsilon, so no accuracy is lost.
_THETA_MIN_F64 = 1e-10
_THETA_MIN_F32 = 1e-4


def _theta_min(dtype) -> float:
    return _THETA_MIN_F64 if jnp.dtype(dtype).itemsize >= 8 else _THETA_MIN_F32


def _safe_theta(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle ``max(|v|, theta_min)`` with autodiff-safe sqrt.

    ``sqrt`` has an infinite derivative at 0; clamping the squared norm
    *before* the sqrt keeps both the value and its gradient finite, while
    being bit-identical to the reference clamp for ``|v| > theta_min``.
    """
    h = _theta_min(v.dtype)
    sq = jnp.sum(v * v, axis=-1)
    sq = jnp.maximum(sq, jnp.asarray(h * h, dtype=sq.dtype))
    return jnp.sqrt(sq)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix. Ref: orientation_tool.h:56-63."""
    z = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )
    return rows


def unskew(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3]; inverse of ``skew`` for antisymmetric input.

    Ref: ``skewt``, orientation_tool.h:67-71.
    """
    return jnp.stack([-m[..., 1, 2], m[..., 0, 2], -m[..., 0, 1]], axis=-1)


def _eye_like(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.broadcast_to(
        jnp.eye(3, dtype=v.dtype), v.shape[:-1] + (3, 3)
    )


def expm(v: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3) via Rodrigues' formula. Ref: orientation_tool.h:76-86.

    ``R = I + sin(t)/t * V + (1-cos(t))/t^2 * V @ V`` with ``V = skew(v)``
    (un-normalised, as in the reference).
    """
    t = _safe_theta(v)[..., None, None]
    V = skew(v)
    VV = V @ V
    return _eye_like(v) + (jnp.sin(t) / t) * V + ((1.0 - jnp.cos(t)) / (t * t)) * VV


def logm(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) -> so(3). Ref: orientation_tool.h:91-124.

    Branchless version of the reference's three-case formula:
    - trace near +3 (identity): returns 0
    - trace near -1 (angle pi): axis from the dominant column
    - otherwise: ``t/(2 sin t) * unskew(R - R^T)``
    """
    dtype = R.dtype
    tr = (R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) / 2.0
    h = jnp.asarray(_theta_min(dtype), dtype)

    # Generic branch: clamp acos input strictly inside (-1, 1) so the
    # division is always finite; the result is then selected against the
    # two degenerate branches.
    tr_c = jnp.clip(tr, -1.0 + 1e-12, 1.0 - 1e-12)
    theta = jnp.arccos(tr_c)
    coef = theta / (2.0 * jnp.sin(theta))
    generic = coef[..., None] * unskew(R - jnp.swapaxes(R, -1, -2))

    # angle == pi branch: pick the numerically safest column (the reference
    # tries z, then y, then x — orientation_tool.h:101-114).
    def _axis(col: int) -> jnp.ndarray:
        d = 1.0 + R[..., col, col]
        d_safe = jnp.maximum(d, jnp.asarray(1e-24, dtype))
        scale = 1.0 / jnp.sqrt(2.0 * d_safe)
        vec = jnp.stack(
            [R[..., 0, col], R[..., 1, col], R[..., 2, col]], axis=-1
        ).at[..., col].add(1.0)
        return scale[..., None] * vec

    use_z = jnp.abs(1.0 + R[..., 2, 2]) > h
    use_y = jnp.abs(1.0 + R[..., 1, 1]) > h
    pi_axis = jnp.where(
        use_z[..., None], _axis(2), jnp.where(use_y[..., None], _axis(1), _axis(0))
    )
    pi_branch = jnp.pi * pi_axis

    out = jnp.where((tr <= -1.0)[..., None], pi_branch, generic)
    out = jnp.where((tr >= 1.0)[..., None], jnp.zeros_like(out), out)
    return out


def jl(v: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3). Ref: orientation_tool.h:129-140.

    ``w = jl(v) @ d(v)/dt`` maps so(3) rates to world angular velocity.
    Uses the normalised ``V = skew(v)/t`` as the reference does.
    """
    t = _safe_theta(v)[..., None, None]
    V = skew(v) / t
    VV = V @ V
    I = _eye_like(v)
    s = jnp.sin(t) / t
    return s * I + (1.0 - s) * (VV + I) + ((1.0 - jnp.cos(t)) / t) * V


def jl_inv(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the left Jacobian. Ref: ``jlt``, orientation_tool.h:145-157."""
    t = _safe_theta(v)[..., None, None]
    V = skew(v) / t
    VV = V @ V
    I = _eye_like(v)
    half_t_cot = 0.5 * t / jnp.tan(0.5 * t)
    return half_t_cot * I + (1.0 - half_t_cot) * (VV + I) - (0.5 * t) * V


def _basis_skews(dtype) -> jnp.ndarray:
    e = jnp.eye(3, dtype=dtype)
    return skew(e)  # [3, 3, 3]: skew(e_x), skew(e_y), skew(e_z)


def djl(v: jnp.ndarray) -> jnp.ndarray:
    """d(jl)/dv, stacked: out[..., a, :, :] = d jl(v) / d v_a.

    Closed-form as in the reference (orientation_tool.h:165-204):
      d jl/d v_a = (t - sin t)/t^3 * (E_a W + W E_a)
                 + (1 - cos t)/t^2 * E_a
                 + v_a * [ (t sin t + 2(cos t - 1))/t^3 * V
                         + (-(2t - 3 sin t + t cos t)/t^3) * V @ V ]
    with W = skew(v) (unnormalised), V = skew(v)/t, E_a basis skews.
    """
    dtype = v.dtype
    t = _safe_theta(v)[..., None, None]
    W = skew(v)
    V = W / t
    VV = V @ V
    s, c = jnp.sin(t), jnp.cos(t)
    t2, t3 = t * t, t * t * t

    base = ((t * s + 2.0 * (c - 1.0)) / t3) * V + (
        -(2.0 * t - 3.0 * s + t * c) / t3
    ) * VV  # [..., 3, 3]

    E = _basis_skews(dtype)  # [3, 3, 3]
    # anticommutator term per axis a: E_a @ W + W @ E_a
    Wb = W[..., None, :, :]  # [..., 1, 3, 3]
    anti = E @ Wb + Wb @ E  # [..., 3, 3, 3]
    coef1 = ((t - s) / t3)[..., None, :, :]
    coef2 = ((1.0 - c) / t2)[..., None, :, :]
    per_axis = coef1 * anti + coef2 * E
    return per_axis + v[..., :, None, None] * base[..., None, :, :]


def djl_inv(v: jnp.ndarray) -> jnp.ndarray:
    """d(jl_inv)/dv stacked on leading axis: -Jlt @ djl_a @ Jlt.

    Ref: ``djlt``, orientation_tool.h:212-227.
    """
    Jinv = jl_inv(v)[..., None, :, :]
    return -(Jinv @ djl(v) @ Jinv)


def rotx(a: jnp.ndarray) -> jnp.ndarray:
    """Rotation about x. Ref: orientation_tool.h:20-27."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def roty(a: jnp.ndarray) -> jnp.ndarray:
    """Rotation about y. Ref: orientation_tool.h:32-39."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rotz(a: jnp.ndarray) -> jnp.ndarray:
    """Rotation about z. Ref: orientation_tool.h:44-51."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
