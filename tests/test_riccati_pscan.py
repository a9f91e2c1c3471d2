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
        associative scan with collectives; numerics must be unchanged.

        Runs in a fresh subprocess: this GSPMD partitioning compile
        segfaults/aborts inside jaxlib's backend_compile when it runs late
        in a long pytest process that has already compiled ~100 programs
        (reproduced 3x at tests/ ~54%: SIGSEGV/SIGABRT in
        backend_compile_and_load; the identical test passes every time in
        a fresh process — a compiler-state bug in this image's jaxlib, not
        a numerics issue). Subprocess isolation keeps the coverage without
        the flaky crash taking down the whole suite.
        """
        import os
        import subprocess
        import sys

        res = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             f"{__file__}::TestStageSharded::test_stage_axis_sharding_inner"],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "PSCAN_SHARD_INNER": "1"},
        )
        assert res.returncode == 0, (
            f"stage-sharded pscan subprocess failed:\n{res.stdout[-2000:]}\n"
            f"{res.stderr[-2000:]}"
        )

    def test_stage_axis_sharding_inner(self):
        # only meaningful as the subprocess target (the wrapper sets the
        # env var); skip the in-suite run so the flaky GSPMD compile never
        # executes inline in a long pytest process
        import os

        import pytest as _pytest

        if not os.environ.get("PSCAN_SHARD_INNER"):
            _pytest.skip("covered via subprocess wrapper")
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


class TestEnginePscanKernel:
    """qp_kernel="pscan" must reproduce the sequential-kernel engine bit
    for bit at convergence (it is the same QP, solved at O(log N) depth).
    Covers verdict-r1 #9: pscan as an engine option, incl. the auto rule.
    """

    def _setup(self, N, dtype=jnp.float64, **kw):
        from srbd_nmpc_tpu.models import srbd
        from srbd_nmpc_tpu.nmpc import engine

        cfg = engine.NmpcConfig(N=N, sqp_max_iter=10, **kw)
        params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
        weights = engine.NmpcWeights.create(
            Q_diag=[0] * 11 + [10], R_scalar=1e-4,
            Qf_diag=[.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100],
            N=N, dtype=dtype)
        x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
        return engine, params, weights, cfg, x0, x_ref

    def test_unbatched_solve_matches_sequential(self):
        import dataclasses

        engine, params, weights, cfg, x0, x_ref = self._setup(
            N=12, qp_kernel="pscan")
        state = engine.NmpcState.initial(cfg.N, jnp.float64)
        st_p, info_p = jax.jit(engine.solve, static_argnums=2)(
            params, weights, cfg, state, x0, x_ref)
        cfg_x = dataclasses.replace(cfg, qp_kernel="xla")
        st_x, info_x = jax.jit(engine.solve, static_argnums=2)(
            params, weights, cfg_x, state, x0, x_ref)
        assert bool(info_p.converged) and bool(info_x.converged)
        np.testing.assert_allclose(st_p.u, st_x.u, atol=1e-7)
        np.testing.assert_allclose(st_p.x, st_x.x, atol=1e-7)

    def test_batched_soa_path_matches_sequential(self):
        import dataclasses

        engine, params, weights, cfg, x0, x_ref = self._setup(
            N=12, qp_kernel="pscan")
        Bn = 4
        rng = np.random.default_rng(21)
        x0s = jnp.asarray(np.asarray(x0)[None]
                          + 0.01 * rng.normal(size=(Bn, 12)))
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (Bn,) + a.shape),
            engine.NmpcState.initial(cfg.N, jnp.float64))
        st_p, info_p = jax.jit(engine.solve, static_argnums=2)(
            params, weights, cfg, states, x0s, x_ref)
        cfg_x = dataclasses.replace(cfg, qp_kernel="xla")
        st_x, info_x = jax.jit(engine.solve, static_argnums=2)(
            params, weights, cfg_x, states, x0s, x_ref)
        assert bool(jnp.all(info_p.converged))
        assert bool(jnp.all(info_x.converged))
        np.testing.assert_allclose(st_p.u, st_x.u, atol=1e-7)
        np.testing.assert_allclose(st_p.x, st_x.x, atol=1e-7)

    def test_auto_rule_threshold(self):
        from srbd_nmpc_tpu.nmpc import engine

        assert engine._pscan_selected(
            engine.NmpcConfig(N=256, qp_kernel="auto", pscan_min_N=128))
        # default threshold never auto-engages pscan on a single chip
        # (tools/bench_pscan.py: the sequential kernel wins at every
        # tested horizon; pscan exists for stage-axis sharding)
        assert not engine._pscan_selected(
            engine.NmpcConfig(N=200, qp_kernel="auto"))
        assert not engine._pscan_selected(
            engine.NmpcConfig(N=20, qp_kernel="auto"))
        # refinement is a sequential-kernel feature; auto must not pick
        # pscan when refine > 0, and explicitly forcing pscan with
        # refine > 0 is rejected rather than silently dropping refinement
        assert not engine._pscan_selected(
            engine.NmpcConfig(N=256, qp_kernel="auto", refine=1))
        import pytest

        with pytest.raises(ValueError, match="pscan"):
            engine.NmpcConfig(N=20, qp_kernel="pscan", refine=1)
