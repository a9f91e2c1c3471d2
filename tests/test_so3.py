"""SO(3) toolbox tests: analytic identities + finite differences.

Mirrors the implicit contract of the reference header
(/root/reference/dynamics/orientation_tool.h): Rodrigues expm, three-branch
logm, left Jacobian and inverse, and their closed-form derivatives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbd_nmpc_tpu.ops import so3


RNG = np.random.default_rng(0)


def rand_vecs(n, scale=1.0):
    return jnp.asarray(RNG.normal(size=(n, 3)) * scale)


class TestSkew:
    def test_skew_cross(self):
        a = rand_vecs(8)
        b = rand_vecs(8)
        got = jnp.einsum("nij,nj->ni", so3.skew(a), b)
        want = jnp.cross(a, b)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_unskew_roundtrip(self):
        v = rand_vecs(5)
        np.testing.assert_allclose(so3.unskew(so3.skew(v)), v, atol=1e-12)


class TestExpmLogm:
    def test_rotation_properties(self):
        v = rand_vecs(16, scale=2.0)
        R = so3.expm(v)
        RtR = jnp.einsum("nji,njk->nik", R, R)
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (16, 1, 1)), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-12)

    def test_expm_small_angle(self):
        v = rand_vecs(4, scale=1e-12)
        R = so3.expm(v)
        np.testing.assert_allclose(R, np.tile(np.eye(3), (4, 1, 1)), atol=1e-10)

    def test_log_exp_roundtrip(self):
        # |v| < pi so that logm is the inverse of expm.
        v = rand_vecs(32, scale=0.8)
        got = so3.logm(so3.expm(v))
        np.testing.assert_allclose(got, v, atol=1e-9)

    def test_logm_identity(self):
        np.testing.assert_allclose(so3.logm(jnp.eye(3)), np.zeros(3), atol=1e-12)

    def test_logm_pi_rotation(self):
        # 180-degree rotation about z: trace == -1 branch.
        v = jnp.asarray([0.0, 0.0, np.pi])
        R = so3.expm(v)
        w = so3.logm(R)
        np.testing.assert_allclose(np.abs(w), [0, 0, np.pi], atol=1e-6)

    def test_matches_axis_angle_rotations(self):
        a = jnp.asarray(0.7)
        np.testing.assert_allclose(
            so3.expm(jnp.asarray([0.7, 0.0, 0.0])), so3.rotx(a), atol=1e-12
        )
        np.testing.assert_allclose(
            so3.expm(jnp.asarray([0.0, 0.7, 0.0])), so3.roty(a), atol=1e-12
        )
        np.testing.assert_allclose(
            so3.expm(jnp.asarray([0.0, 0.0, 0.7])), so3.rotz(a), atol=1e-12
        )


class TestLeftJacobian:
    def test_jl_jl_inv_inverse(self):
        v = rand_vecs(16, scale=2.0)
        prod = so3.jl(v) @ so3.jl_inv(v)
        np.testing.assert_allclose(prod, np.tile(np.eye(3), (16, 1, 1)), atol=1e-10)

    def test_jl_is_expm_derivative(self):
        # d/ds expm(v + s*dv)|_{s=0} = skew(jl(v) @ dv) @ expm(v)
        # (left Jacobian definition).
        v = rand_vecs(8, scale=1.0)
        dv = rand_vecs(8)

        def f(vv):
            return so3.expm(vv)

        J = jax.vmap(jax.jacfwd(f))(v)  # [n,3,3,3]
        dR = jnp.einsum("nijk,nk->nij", J, dv)
        want = so3.skew(jnp.einsum("nij,nj->ni", so3.jl(v), dv)) @ so3.expm(v)
        np.testing.assert_allclose(dR, want, atol=1e-8)

    def test_small_angle_limits(self):
        v = rand_vecs(4, scale=1e-13)
        np.testing.assert_allclose(so3.jl(v), np.tile(np.eye(3), (4, 1, 1)), atol=1e-9)
        np.testing.assert_allclose(
            so3.jl_inv(v), np.tile(np.eye(3), (4, 1, 1)), atol=1e-9
        )


class TestDerivatives:
    @pytest.mark.parametrize("fn,dfn", [(so3.jl, so3.djl), (so3.jl_inv, so3.djl_inv)])
    def test_closed_form_matches_autodiff(self, fn, dfn):
        v = rand_vecs(8, scale=1.5)
        # autodiff jacobian: [n, 3, 3, 3] with last axis = d/dv_a
        J = jax.vmap(jax.jacfwd(fn))(v)
        want = jnp.moveaxis(J, -1, 1)  # -> [n, a, 3, 3]
        got = jax.vmap(dfn)(v)
        np.testing.assert_allclose(got, want, atol=1e-8)

    @pytest.mark.parametrize("fn,dfn", [(so3.jl, so3.djl), (so3.jl_inv, so3.djl_inv)])
    def test_closed_form_matches_finite_difference(self, fn, dfn):
        v = rand_vecs(4, scale=1.0)
        eps = 1e-6
        got = jax.vmap(dfn)(v)
        for a in range(3):
            e = jnp.zeros(3).at[a].set(eps)
            fd = (fn(v + e) - fn(v - e)) / (2 * eps)
            np.testing.assert_allclose(got[:, a], fd, atol=1e-7)


class TestBatchingAndJit:
    def test_arbitrary_leading_dims(self):
        v = jnp.asarray(RNG.normal(size=(2, 5, 3)))
        R = so3.expm(v)
        assert R.shape == (2, 5, 3, 3)
        flat = so3.expm(v.reshape(-1, 3)).reshape(2, 5, 3, 3)
        np.testing.assert_allclose(R, flat, atol=1e-14)

    def test_grad_finite_at_zero(self):
        # The safe-theta clamp must keep gradients finite at v == 0.
        g = jax.grad(lambda vv: jnp.sum(so3.expm(vv)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        g2 = jax.grad(lambda vv: jnp.sum(so3.jl(vv)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g2)))

    def test_jit_compiles(self):
        v = rand_vecs(4)
        np.testing.assert_allclose(jax.jit(so3.expm)(v), so3.expm(v), atol=1e-14)
