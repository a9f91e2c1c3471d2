"""Fully fused SQP-iteration Pallas kernels vs the XLA SoA path.

Covers ops/sqp_pallas.py (linearize + backward Riccati + forward rollout
in two kernels) and models/merit_pallas.merit_alpha_pallas (line-search
candidate merit with per-scenario alpha folded into the kernel).
Validated in interpreter mode (same kernel program); TPU parity is gated
end-to-end by bench.py's pallas-vs-xla full-solve check.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine
from srbd_nmpc_tpu.ops import riccati_soa


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield
    monkeypatch.undo()


def test_gram_bitwise_through_symmetrization():
    """sm.gram (symmetric Y'Y, 25 % fewer FMAs — used for the Schur
    downdate H'G^-1 H in _riccati_stage_structured) must be bitwise
    interchangeable with mtm(Y, Y) through the kernel's 0.5*(X + X')
    stage symmetrization, in both dtypes."""
    from srbd_nmpc_tpu.ops import smallmat as sm

    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.float64):
        Y = jnp.asarray(rng.normal(size=(12, 12, 9)), dtype)
        A = jnp.asarray(rng.normal(size=(12, 12, 9)), dtype)
        s_g = 0.5 * ((A - sm.gram(Y)) + jnp.swapaxes(A - sm.gram(Y), 0, 1))
        s_m = 0.5 * ((A - sm.mtm(Y, Y)) + jnp.swapaxes(A - sm.mtm(Y, Y), 0, 1))
        np.testing.assert_array_equal(np.asarray(s_g), np.asarray(s_m))
        # odd inner dim exercises the uneven split
        Y5 = jnp.asarray(rng.normal(size=(4, 5, 3)), dtype)
        np.testing.assert_allclose(np.asarray(sm.gram(Y5)),
                                   np.asarray(sm.mtm(Y5, Y5)), rtol=1e-6)


def _setup(B, N, dtype=jnp.float32, seed=0):
    cfg = engine.NmpcConfig(N=N)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], N, dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(seed)
    states = engine.NmpcState(
        x=jnp.asarray(rng.normal(size=(B, N + 1, 12)) * 0.3, dtype),
        u=jnp.asarray(rng.normal(size=(B, N, 12)) * 30 + 80, dtype),
        alpha=jnp.ones(B, dtype))
    return cfg, params, weights, x0, x_ref, states, rng


def _to_soa(states, x_ref, x0s, N, B):
    xa = jnp.transpose(states.x, (1, 2, 0))
    us = jnp.transpose(states.u, (1, 2, 0))
    xra = jnp.broadcast_to(x_ref[:, :, None], (N + 1, srbd.NX, B))
    return xa, us, xra, x0s.T - xa[0]


def test_sqp_qp_solve_matches_xla(interpret_pallas):
    from srbd_nmpc_tpu.ops import sqp_pallas

    B, N = 128, 12
    cfg, params, weights, x0, x_ref, states, rng = _setup(B, N)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.02 * rng.normal(size=(B, 12)),
                      jnp.float32)

    A, Bm, b, Q, S, R, q, r, aux = engine._linearize_soa(
        params, weights, cfg, states, x_ref)
    xa, us, xra, dx0 = _to_soa(states, x_ref, x0s, N, B)
    dx_s, du_s, _ = riccati_soa.lqr_solve(
        A, Bm, b, Q, S, R, q, r, dx0, reg=cfg.reg)
    dphi_s = jnp.sum(dx_s * q, axis=(0, 1)) + jnp.sum(du_s * r, axis=(0, 1))

    Ac, bc = srbd.constraint_matrix(params)
    dx_p, du_p, dphi_p, aux_p = sqp_pallas.sqp_qp_solve(
        params, weights.Q, weights.Qf, weights.R, Ac, bc,
        xa, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier,
        reg=cfg.reg, block=128)

    np.testing.assert_allclose(dx_p, dx_s, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(du_p, du_s, rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(dphi_p, dphi_s, rtol=1e-3, atol=1e-2)
    # aux = (theta, phi, max|defect|, min constraint) at the current iterate
    for got, want, tol in zip(aux_p, aux, (2e-4, 2e-2, 1e-5, 1e-4)):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=tol)


def test_sqp_qp_solve_f64_exact(interpret_pallas):
    """In f64 the fused kernel must agree with the XLA path to ~1e-9 —
    the kernel runs the algebraically identical recursion."""
    from srbd_nmpc_tpu.ops import sqp_pallas

    B, N = 8, 6
    cfg, params, weights, x0, x_ref, states, rng = _setup(B, N, jnp.float64)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.02 * rng.normal(size=(B, 12)))

    A, Bm, b, Q, S, R, q, r, _ = engine._linearize_soa(
        params, weights, cfg, states, x_ref)
    xa, us, xra, dx0 = _to_soa(states, x_ref, x0s, N, B)
    dx_s, du_s, _ = riccati_soa.lqr_solve(
        A, Bm, b, Q, S, R, q, r, dx0, reg=cfg.reg)

    Ac, bc = srbd.constraint_matrix(params)
    dx_p, du_p, _, _ = sqp_pallas.sqp_qp_solve(
        params, weights.Q, weights.Qf, weights.R, Ac, bc,
        xa, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier,
        reg=cfg.reg, block=8)
    np.testing.assert_allclose(dx_p, dx_s, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(du_p, du_s, rtol=1e-9, atol=1e-7)


def test_sqp_qp_solve_onepass_matches_twopass(interpret_pallas):
    """The single-kernel (VMEM-resident stages) variant must match the
    two-kernel fused path to machine precision in f64 — identical
    recursion, only the residency of the intermediate tensors differs
    (tolerances absorb per-program XLA fma/fusion differences)."""
    from srbd_nmpc_tpu.ops import sqp_pallas

    B, N = 8, 6
    cfg, params, weights, x0, x_ref, states, rng = _setup(B, N, jnp.float64)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.02 * rng.normal(size=(B, 12)))
    xa, us, xra, dx0 = _to_soa(states, x_ref, x0s, N, B)
    Ac, bc = srbd.constraint_matrix(params)

    args = (params, weights.Q, weights.Qf, weights.R, Ac, bc,
            xa, us, xra, dx0, cfg.mu_barrier, cfg.theta_barrier)
    dx2, du2, dphi2, aux2 = sqp_pallas.sqp_qp_solve(*args, reg=cfg.reg, block=8)
    # both grid layouts: fold=True (forward rollout as the unrolled
    # epilogue of the last backward step, N grid steps) and fold=False
    # (separate N forward grid steps) must match the two-pass oracle
    for fold in (True, False):
        dx1, du1, dphi1, aux1 = sqp_pallas.sqp_qp_solve_onepass(
            *args, reg=cfg.reg, block=8, fold=fold)
        np.testing.assert_allclose(dx1, dx2, rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(du1, du2, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(dphi1, dphi2, rtol=1e-12, atol=1e-12)
        for a1, a2 in zip(aux1, aux2):
            np.testing.assert_allclose(a1, a2, rtol=1e-12, atol=1e-13)


def test_merit_alpha_matches_soa(interpret_pallas):
    from srbd_nmpc_tpu.models import merit_pallas

    B, N = 128, 12
    cfg, params, weights, _, x_ref, states, rng = _setup(B, N, seed=3)
    xa, us, xra, _ = _to_soa(states, x_ref, jnp.zeros((B, 12)), N, B)
    dx = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.05, jnp.float32)
    du = jnp.asarray(rng.normal(size=(N, 12, B)) * 5.0, jnp.float32)
    alpha = jnp.asarray(0.5 ** rng.integers(0, 6, size=B), jnp.float32)

    th_s, ph_s = engine._merit_soa(
        params, weights, cfg, xa + alpha[None, None] * dx,
        us + alpha[None, None] * du, xra)
    Ac, bc = srbd.constraint_matrix(params)
    th_p, ph_p = merit_pallas.merit_alpha_pallas(
        params, weights.Q, weights.Qf, weights.R, Ac, bc, xa, us, xra,
        dx, du, alpha, cfg.mu_barrier, cfg.theta_barrier, block=128)
    np.testing.assert_allclose(th_p, th_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ph_p, ph_s, rtol=1e-4, atol=2e-2)


def test_engine_fused_solve_matches_xla(interpret_pallas):
    """End-to-end: qp_kernel='fused' must reproduce the XLA engine bit
    for bit in trajectory terms (f64: everything is the same recursion)."""
    B = 4
    cfg, params, weights, x0, x_ref, _, rng = _setup(B, 12, jnp.float64)
    cfg = dataclasses.replace(cfg, qp_kernel="fused", pallas_block=4)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 12)))
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        engine.NmpcState.initial(cfg.N, jnp.float64))
    st_f, info_f = jax.jit(engine.solve, static_argnums=2)(
        params, weights, cfg, states, x0s, x_ref)
    cfg_x = dataclasses.replace(cfg, qp_kernel="xla")
    st_x, info_x = jax.jit(engine.solve, static_argnums=2)(
        params, weights, cfg_x, states, x0s, x_ref)
    assert bool(jnp.all(info_f.converged))
    assert bool(jnp.all(info_x.converged))
    np.testing.assert_allclose(st_f.u, st_x.u, rtol=1e-8, atol=1e-7)
    np.testing.assert_allclose(st_f.x, st_x.x, rtol=1e-8, atol=1e-9)


def test_fused_eligibility_rules():
    assert engine._fused_eligible(
        engine.NmpcConfig(qp_kernel="fused"), 100)
    # auto only engages on a TPU backend (tests run on CPU)
    assert not engine._fused_eligible(
        engine.NmpcConfig(qp_kernel="auto"), 4096)
    with pytest.raises(ValueError, match="fused"):
        engine.NmpcConfig(qp_kernel="fused", refine=1)
    with pytest.raises(ValueError, match="fused"):
        engine.NmpcConfig(qp_kernel="fused", sensitivity="rk4")


def test_engine_speculative_matches_synchronous(interpret_pallas):
    """The speculative-acceptance loop must reproduce the
    iteration-synchronous fused loop exactly: same trajectories, same
    converged set, same status, same final alpha (it evaluates the same
    candidate sequence with the same acceptance rule, just pipelined into
    the fused kernel). Perturbed x0 batch so scenarios take different
    trip patterns; tight sqp_max_iter so some scenarios exhaust it."""
    B = 8
    cfg, params, weights, x0, x_ref, _, rng = _setup(B, 12, jnp.float64)
    cfg = dataclasses.replace(cfg, qp_kernel="fused", pallas_block=4,
                              sqp_max_iter=6)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.05 * rng.normal(size=(B, 12)))
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        engine.NmpcState.initial(cfg.N, jnp.float64))
    cfg_spec = dataclasses.replace(cfg, speculative=True)
    cfg_sync = dataclasses.replace(cfg, speculative=False)
    st_s, info_s = jax.jit(engine.solve, static_argnums=2)(
        params, weights, cfg_spec, states, x0s, x_ref)
    st_y, info_y = jax.jit(engine.solve, static_argnums=2)(
        params, weights, cfg_sync, states, x0s, x_ref)
    np.testing.assert_allclose(st_s.u, st_y.u, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(st_s.x, st_y.x, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(info_s.converged),
                                  np.asarray(info_y.converged))
    np.testing.assert_array_equal(np.asarray(info_s.status),
                                  np.asarray(info_y.status))
    np.testing.assert_allclose(np.asarray(st_s.alpha), np.asarray(st_y.alpha),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(info_s.theta),
                               np.asarray(info_y.theta), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(info_s.dphi),
                               np.asarray(info_y.dphi), rtol=1e-9, atol=1e-12)
