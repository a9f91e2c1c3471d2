"""Closed-loop receding-horizon SRBD MPC: the real control-cycle usage.

The reference only benchmarks repeated open-loop solves
(NMPC_solver.cpp:353-380); this exercises the intended deployment loop:
solve -> apply u_0 to the 'plant' (RK4 of the true dynamics) -> shift ->
warm-started re-solve, and checks the closed loop actually tracks the
reference command.
"""

import jax
import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine


def test_closed_loop_tracks_reference():
    dtype = jnp.float64
    cfg = engine.NmpcConfig(N=20, sqp_max_iter=15)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    # The reference's YAML weights have no running cost on orientation or
    # angular momentum (they were only ever used open-loop,
    # NMPC_solver.cpp:353-380); in closed loop they ring in yaw. Add
    # momentum damping + orientation tracking so the loop is well posed.
    weights = engine.NmpcWeights.create(
        [1.0] * 3 + [0.5] * 3 + [0, 0, 0, 0, 0, 10],
        1e-4,
        [0.5, 0.5, 0.5, 0.1, 0.1, 0.1, 100, 100, 100, 0, 0, 100],
        N=cfg.N, dtype=dtype)
    x0, _ = engine.make_benchmark_problem(cfg, dtype)
    # a gentle command step (the benchmark's 0.5 m / 0.2 rad step is an
    # open-loop stress case and rings for seconds in closed loop)
    x_ref_k = jnp.zeros(12, dtype).at[2].set(0.05).at[6].set(0.1).at[8].set(1.0)
    x_ref = jnp.broadcast_to(x_ref_k, (cfg.N + 1, 12))
    target = np.asarray(x_ref[0])

    solve = jax.jit(engine.solve, static_argnums=(2,))
    state = engine.NmpcState.initial(cfg.N, dtype)
    x_plant = x0
    iters = []
    errs = []
    for cycle in range(60):
        state, info = solve(params, weights, cfg, state, x_plant, x_ref)
        iters.append(int(info.sqp_iters))
        u0 = state.u[0]
        x_plant = srbd.rk4_step(params, x_plant, u0)
        errs.append(float(jnp.linalg.norm(
            (x_plant - jnp.asarray(target))[jnp.asarray([0, 1, 2, 6, 7, 8])])))
        state = engine.shift_state(state)

    # tracking: walked most of the way to the 0.1 m target, height held
    # (total error norm is NOT monotone — the body pitches while
    # accelerating, which dominates the transient; assert the steady
    # quantities instead)
    xp = np.asarray(x_plant)
    assert abs(xp[6] - 0.1) < 0.05, xp[6]          # px near target
    assert abs(xp[8] - 1.0) < 0.02, xp[8]          # height held
    assert xp[6] > 0.09, xp[6]                     # actually moved
    assert min(errs[30:]) < 0.5 * errs[0], errs[0]
    # warm-started cycles converge fast (shifted solution keeps theta tiny)
    assert np.mean(iters[5:]) <= 4.0, iters
    # plant state bounded & sane
    assert np.all(np.isfinite(np.asarray(state.x)))


def test_shift_state_shapes():
    st = engine.NmpcState.initial(10, jnp.float32)
    sh = engine.shift_state(st, steps=2)
    assert sh.x.shape == st.x.shape and sh.u.shape == st.u.shape
    np.testing.assert_allclose(sh.x[:-2], st.x[2:])
    np.testing.assert_allclose(sh.u[-1], st.u[-1])
    # batched
    stb = engine.NmpcState(
        x=jnp.zeros((4, 11, 12)), u=jnp.ones((4, 10, 12)),
        alpha=0.5 * jnp.ones(4))
    shb = engine.shift_state(stb)
    assert shb.x.shape == (4, 11, 12)
    np.testing.assert_allclose(np.asarray(shb.alpha), np.ones(4))
