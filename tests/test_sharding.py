"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed anything (SURVEY.md §2); the contract here
is internal consistency: a sharded batched solve must produce numerics
identical to the unsharded one, with the batch actually partitioned across
devices (same-numerics test pattern from SURVEY.md §4d).
"""

import jax
import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine
from srbd_nmpc_tpu.parallel import mesh as mesh_lib
from srbd_nmpc_tpu.parallel import sharded


def setup(batch, dtype=jnp.float64):
    cfg = engine.NmpcConfig(N=10, sqp_max_iter=10)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        Q_diag=[0] * 11 + [10], R_scalar=1e-4,
        Qf_diag=[0.5, 0.5, 0.5, 0.01, 0.01, 0.01, 100, 100, 100, 0, 0, 100],
        N=cfg.N, dtype=dtype,
    )
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(batch, 12)),
                      dtype)
    states = sharded.broadcast_state(engine.NmpcState.initial(cfg.N, dtype), batch)
    return params, weights, cfg, states, x0s, x_ref


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_shardmap_compaction_matches_unsharded(monkeypatch):
    """The shard_map solver (per-device engine: while phases, straggler
    compaction tiers, permute crossings all device-local) must be BITWISE
    identical to the unsharded fused solve — per-lane kernel math has no
    cross-lane ops and compaction is bitwise-neutral
    (test_sqp_planes.py::test_engine_compaction_is_bitwise_identical),
    so sharding the batch must change nothing. Local batch 64/8 = 8 with
    pallas_block=2 engages the B/4 tier on every device."""
    import dataclasses
    import functools

    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))

    dtype = jnp.float64
    cfg = engine.NmpcConfig(N=5, sqp_max_iter=12, pallas_block=2,
                            qp_kernel="fused", compact=True)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        Q_diag=[0] * 11 + [10], R_scalar=1e-4,
        Qf_diag=[.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100],
        N=cfg.N, dtype=dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(21)
    B = 64
    # varied perturbation scales -> per-scenario iteration spread, so the
    # live set shrinks into the compacted tier on each device
    scales = np.concatenate([np.full(40, 0.002), np.full(12, 0.05),
                             np.full(8, 0.2), np.full(4, 0.5)])
    x0s = jnp.asarray(np.asarray(x0)[None]
                      + scales[:, None] * rng.normal(size=(B, 12)), dtype)
    states = sharded.broadcast_state(engine.NmpcState.initial(cfg.N, dtype), B)

    st_ref, info_ref = engine.solve(params, weights, cfg, states, x0s, x_ref)

    mesh = mesh_lib.make_mesh()
    states_sh = mesh_lib.shard_scenario_batch(states, mesh)
    x0s_sh = jax.device_put(x0s, mesh_lib.scenario_sharding(mesh))
    solver = sharded.make_shardmap_solver(cfg, mesh, donate_state=False)
    st_sh, info_sh, summ = jax.block_until_ready(
        solver(params, weights, states_sh, x0s_sh, x_ref))

    np.testing.assert_array_equal(np.asarray(st_sh.u), np.asarray(st_ref.u))
    np.testing.assert_array_equal(np.asarray(st_sh.x), np.asarray(st_ref.x))
    np.testing.assert_array_equal(np.asarray(info_sh.sqp_iters),
                                  np.asarray(info_ref.sqp_iters))
    np.testing.assert_array_equal(np.asarray(info_sh.status),
                                  np.asarray(info_ref.status))
    # the batch really is partitioned across all 8 devices
    assert len(st_sh.u.sharding.device_set) == 8
    assert int(summ.n_converged) == int(np.sum(np.asarray(info_ref.converged)))
    # sanity: there was a straggler tail for the tiers to compact
    it = np.asarray(info_ref.sqp_iters)
    assert int(it.max()) > int(it.min())

    # per-scenario x_ref (sharded [B, N+1, nx]) takes the other in_spec leg
    x_ref_b = jnp.broadcast_to(x_ref, (B,) + x_ref.shape)
    st_b, _, _ = jax.block_until_ready(solver(
        params, weights, states_sh, x0s_sh,
        jax.device_put(x_ref_b, mesh_lib.scenario_sharding(mesh))))
    np.testing.assert_array_equal(np.asarray(st_b.u), np.asarray(st_ref.u))


def test_sharded_matches_unsharded():
    params, weights, cfg, states, x0s, x_ref = setup(batch=16)

    solo = sharded.make_sharded_solver(cfg, mesh=None, donate_state=False)
    s_ref, i_ref, sum_ref = jax.block_until_ready(
        solo(params, weights, states, x0s, x_ref))

    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    states_sh = mesh_lib.shard_scenario_batch(states, mesh)
    x0s_sh = jax.device_put(x0s, mesh_lib.scenario_sharding(mesh))
    dist = sharded.make_sharded_solver(cfg, mesh=mesh, donate_state=False)
    s_sh, i_sh, sum_sh = jax.block_until_ready(
        dist(params, weights, states_sh, x0s_sh, x_ref))

    np.testing.assert_allclose(s_sh.u, s_ref.u, atol=1e-10)
    np.testing.assert_allclose(s_sh.x, s_ref.x, atol=1e-10)
    assert int(sum_sh.n_converged) == int(sum_ref.n_converged)
    np.testing.assert_allclose(float(sum_sh.max_theta), float(sum_ref.max_theta),
                               rtol=1e-9)


def test_output_actually_sharded():
    params, weights, cfg, states, x0s, x_ref = setup(batch=16)
    mesh = mesh_lib.make_mesh()
    states_sh = mesh_lib.shard_scenario_batch(states, mesh)
    x0s_sh = jax.device_put(x0s, mesh_lib.scenario_sharding(mesh))
    dist = sharded.make_sharded_solver(cfg, mesh=mesh, donate_state=False)
    s_sh, _, _ = dist(params, weights, states_sh, x0s_sh, x_ref)
    # the state trajectory output must be partitioned over all 8 devices
    assert len(s_sh.u.sharding.device_set) == 8
    shard_rows = {sh.index[0] for sh in s_sh.u.addressable_shards}
    assert len(shard_rows) == 8  # 8 distinct batch slices


def test_summary_aggregates():
    params, weights, cfg, states, x0s, x_ref = setup(batch=8)
    _, infos, summary = sharded.solve_batch(params, weights, cfg, states, x0s, x_ref)
    assert int(summary.n_converged) == int(np.sum(np.asarray(infos.converged)))
    np.testing.assert_allclose(
        float(summary.max_defect), float(np.max(np.asarray(infos.max_defect)))
    )


def test_batched_engine_matches_vmap():
    """The SoA batch-in-lanes fast path must agree with vmap of the
    single-scenario engine (same math, different layout/kernels)."""
    params, weights, cfg, states, x0s, x_ref = setup(batch=8)
    batched_state, batched_info = engine.solve(params, weights, cfg, states, x0s, x_ref)
    vmapped = jax.vmap(engine.solve, in_axes=(None, None, None, 0, 0, None))
    v_state, v_info = vmapped(params, weights, cfg, states, x0s, x_ref)
    np.testing.assert_allclose(batched_state.u, v_state.u, atol=1e-8)
    np.testing.assert_allclose(batched_state.x, v_state.x, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(batched_info.converged),
                                  np.asarray(v_info.converged))
    np.testing.assert_array_equal(np.asarray(batched_info.sqp_iters),
                                  np.asarray(v_info.sqp_iters))


def test_multihost_helpers_single_process():
    """Single-process degradation of the multi-host tier: initialize is a
    no-op, the global mesh covers local devices, and
    distribute_scenarios assembles a correctly sharded global array."""
    from srbd_nmpc_tpu.parallel import multihost

    multihost.initialize_cluster()
    mesh = multihost.global_scenario_mesh()
    assert mesh.devices.size == len(jax.devices())

    local = {"x0": np.arange(16 * 12, dtype=np.float32).reshape(16, 12)}
    dist = multihost.distribute_scenarios(local, mesh)
    assert dist["x0"].shape == (16, 12)
    assert len(dist["x0"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(dist["x0"]), local["x0"])


def test_profiling_helpers(tmp_path):
    from srbd_nmpc_tpu.utils import profiling
    from srbd_nmpc_tpu.utils.timing import benchmark

    with profiling.annotate("test-span"):
        y = jnp.sum(jnp.ones((64, 64)) * 2.0)
    assert float(y) == 8192.0
    res = benchmark(lambda: jnp.ones(8) * 3.0, reps=3, warmup=1)
    assert profiling.solves_per_second(res, batch=4) > 0


def test_make_mesh_multi_axis():
    """make_mesh builds the 2-D scenario x stage grid the stage-parallel
    Riccati dryrun uses (VERDICT r3 #6), with -1 size inference."""
    m = mesh_lib.make_mesh(axis_names=("scenario", "stage"),
                           axis_sizes=(-1, 2))
    assert m.axis_names == ("scenario", "stage")
    assert m.devices.shape == (4, 2)

    m1 = mesh_lib.make_mesh(axis_names=("scenario", "stage"))
    assert m1.devices.shape == (8, 1)   # degenerate stage axis

    m2 = mesh_lib.make_mesh(n_devices=4, axis_names=("a", "b"),
                            axis_sizes=(2, 2))
    assert m2.devices.shape == (2, 2)

    import pytest
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(axis_names=("a", "b"), axis_sizes=(3, -1))
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(axis_names=("a", "b"), axis_sizes=(2, 2))
