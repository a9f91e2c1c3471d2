"""Stage-parallel (associative-scan) Riccati vs the sequential kernel."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srbd_nmpc_tpu.ops.riccati import lqr_solve
from srbd_nmpc_tpu.ops.riccati_pscan import (
    lqr_backward_pscan,
    lqr_solve_pscan,
)

from test_riccati import random_qp


class TestPscanEquivalence:
    def test_backward_matches_sequential(self):
        qp = random_qp(N=32, seed=11)
        from srbd_nmpc_tpu.ops.riccati import lqr_backward
        P1, p1, K1, k1 = lqr_backward(qp)
        P2, p2, K2, k2 = lqr_backward_pscan(qp)
        np.testing.assert_allclose(P2, P1, atol=1e-8)
        np.testing.assert_allclose(p2, p1, atol=1e-8)
        np.testing.assert_allclose(K2, K1, atol=1e-8)
        np.testing.assert_allclose(k2, k1, atol=1e-8)

    def test_full_solve_matches(self):
        qp = random_qp(N=17, seed=12)   # non-power-of-two horizon
        x0 = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, size=5))
        s1 = lqr_solve(qp, x0)
        s2 = jax.jit(lqr_solve_pscan)(qp, x0)
        np.testing.assert_allclose(s2.x, s1.x, atol=1e-8)
        np.testing.assert_allclose(s2.u, s1.u, atol=1e-8)
        np.testing.assert_allclose(s2.pi, s1.pi, atol=1e-7)

    def test_srbd_sized_horizon(self):
        qp = random_qp(N=20, nx=12, nu=12, seed=13)
        x0 = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, size=12))
        s1 = lqr_solve(qp, x0)
        s2 = lqr_solve_pscan(qp, x0)
        np.testing.assert_allclose(s2.u, s1.u, atol=1e-7)


class TestStageSharded:
    def test_stage_axis_sharding(self):
        """2-D (scenario x stage) mesh: the stage-stacked QP data sharded
        along the horizon, batch along scenarios — XLA partitions the
        associative scan with collectives; numerics must be unchanged."""
        devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
        mesh = Mesh(devs, axis_names=("scenario", "stage"))

        Bn = 8
        qp = random_qp(N=16, seed=14)
        x0s = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, size=(Bn, 5)))

        batched = jax.vmap(lambda x0: lqr_solve_pscan(qp, x0))
        ref = batched(x0s)

        stage_shard = NamedSharding(mesh, P(None, "stage"))
        batch_shard = NamedSharding(mesh, P("scenario"))

        def constrained(x0s):
            qp_s = type(qp)(
                A=jax.lax.with_sharding_constraint(qp.A, stage_shard),
                B=jax.lax.with_sharding_constraint(qp.B, stage_shard),
                b=jax.lax.with_sharding_constraint(qp.b, stage_shard),
                Q=qp.Q, S=qp.S, R=qp.R, q=qp.q, r=qp.r,
            )
            x0s = jax.lax.with_sharding_constraint(x0s, batch_shard)
            return jax.vmap(lambda x0: lqr_solve_pscan(qp_s, x0))(x0s)

        with mesh:
            out = jax.jit(constrained)(x0s)
        np.testing.assert_allclose(out.u, ref.u, atol=1e-9)
        np.testing.assert_allclose(out.x, ref.x, atol=1e-9)
