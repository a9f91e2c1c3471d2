"""SoA dynamics kernels vs the reference-parity AoS implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.models import srbd, srbd_soa

RNG = np.random.default_rng(21)


def make_batch(M=64):
    params = srbd.SRBDParams.create(dtype=jnp.float64)
    xs = jnp.asarray(RNG.normal(size=(M, 12)) * 0.4)
    us = jnp.asarray(RNG.normal(size=(M, 12)) * 40.0)
    return params, xs, us


def soa(v):  # [M, d] -> [d, M]
    return jnp.moveaxis(v, 0, -1)


class TestSoaEquivalence:
    def test_dynamics(self):
        params, xs, us = make_batch()
        ref = srbd.continuous_dynamics(params, xs, us)
        got = srbd_soa.dynamics(params, soa(xs), soa(us))
        np.testing.assert_allclose(jnp.moveaxis(got, -1, 0), ref, atol=1e-12)

    def test_jacobians(self):
        params, xs, us = make_batch()
        ref_Jx, ref_Ju = srbd.continuous_jacobians(params, xs, us)
        Jx, Ju = srbd_soa.jacobians(params, soa(xs), soa(us))
        np.testing.assert_allclose(jnp.moveaxis(Jx, -1, 0), ref_Jx, atol=1e-11)
        np.testing.assert_allclose(jnp.moveaxis(Ju, -1, 0), ref_Ju, atol=1e-12)

    def test_rk4(self):
        params, xs, us = make_batch()
        ref = srbd.rk4_step(params, xs, us)
        got = srbd_soa.rk4(params, soa(xs), soa(us))
        np.testing.assert_allclose(jnp.moveaxis(got, -1, 0), ref, atol=1e-12)

    def test_euler_AB(self):
        params, xs, us = make_batch()
        A_ref, B_ref, _, _ = srbd.linearize_shooting(params, xs, xs, us, "euler")
        A, B = srbd_soa.euler_AB(params, soa(xs), soa(us))
        np.testing.assert_allclose(jnp.moveaxis(A, -1, 0), A_ref, atol=1e-11)
        np.testing.assert_allclose(jnp.moveaxis(B, -1, 0), B_ref, atol=1e-12)

    def test_multi_dim_trailing_batch(self):
        params, xs, us = make_batch(M=24)
        x2 = soa(xs).reshape(12, 4, 6)
        u2 = soa(us).reshape(12, 4, 6)
        got = srbd_soa.dynamics(params, x2, u2).reshape(12, 24)
        ref = srbd_soa.dynamics(params, soa(xs), soa(us))
        np.testing.assert_allclose(got, ref, atol=1e-14)

    def test_zero_orientation(self):
        params = srbd.SRBDParams.create(dtype=jnp.float64)
        x = jnp.zeros((12, 3), jnp.float64)
        u = jnp.asarray(RNG.normal(size=(12, 3)) * 30.0)
        got = srbd_soa.dynamics(params, x, u)
        ref = srbd.continuous_dynamics(params, x.T, u.T)
        np.testing.assert_allclose(got.T, ref, atol=1e-10)
        Jx, Ju = srbd_soa.jacobians(params, x, u)
        Jxr, Jur = srbd.continuous_jacobians(params, x.T, u.T)
        np.testing.assert_allclose(jnp.moveaxis(Jx, -1, 0), Jxr, atol=1e-8)

    def test_linearize_stage_matches_separate_calls(self):
        # linearize_stage shares the so3 chain / RIRt / w between the
        # Jacobian blocks and RK4's first dynamics eval; must match the
        # separate jacobian_blocks + rk4 calls to rounding (k1's R/Jlt
        # use the chain's (1-ct)/t^2 form vs dynamics' (1-ct)*inv_t^2)
        params, xs, us = make_batch()
        D1, D2, SF, Sr, Sl, x_next = srbd_soa.linearize_stage(
            params, soa(xs), soa(us))
        D1r, D2r, SFr, Srr, Slr = srbd_soa.jacobian_blocks(
            params, soa(xs), soa(us))
        x_next_ref = srbd_soa.rk4(params, soa(xs), soa(us))
        for got, ref in ((D1, D1r), (D2, D2r), (SF, SFr), (Sr, Srr),
                         (Sl, Slr)):
            np.testing.assert_allclose(got, ref, atol=1e-13)
        np.testing.assert_allclose(x_next, x_next_ref, rtol=1e-12,
                                   atol=1e-12)
