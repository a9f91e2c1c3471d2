"""Plane-phase one-pass SQP kernel (ops/sqp_planes) vs the dense-layout
one-pass kernels (ops/sqp_pallas), interpreter mode, f64."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield
    monkeypatch.undo()


def _setup(B, N, dtype, seed=0):
    cfg = engine.NmpcConfig(N=N)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], N, dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(seed)
    xa = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.3, dtype)
    us = jnp.asarray(rng.normal(size=(N, 12, B)) * 30 + 80, dtype)
    xra = jnp.broadcast_to(x_ref[:, :, None], (N + 1, srbd.NX, B)
                           ).astype(dtype)
    x0s = jnp.asarray(np.asarray(x0)[:, None]
                      + 0.01 * rng.normal(size=(12, B)), dtype)
    return cfg, params, weights, xa, us, xra, x0s, rng


def test_planes_matches_onepass_cand(interpret_pallas):
    from srbd_nmpc_tpu.ops import sqp_pallas, sqp_planes

    B, N = 8, 5
    dtype = jnp.float64
    cfg, params, weights, xa, us, xra, x0s, rng = _setup(B, N, dtype)
    Ac, bc = srbd.constraint_matrix(params)
    dxc = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.05, dtype)
    duc = jnp.asarray(rng.normal(size=(N, 12, B)) * 2.0, dtype)
    alpha = jnp.asarray(0.25 + 0.5 * rng.random(B), dtype)

    args = (params, weights.Q, weights.Qf, weights.R, Ac, bc,
            xa, us, xra, dxc, duc, alpha, x0s,
            cfg.mu_barrier, cfg.theta_barrier)
    dx_r, du_r, dphi_r, aux_r = sqp_pallas.sqp_qp_solve_onepass_cand(
        *args, reg=1e-9, block=B)
    dx_p, du_p, dphi_p, aux_p = sqp_planes.sqp_qp_solve_onepass_planes(
        *args, reg=1e-9, block=B)

    np.testing.assert_allclose(dx_p, dx_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(du_p, du_r, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dphi_p, dphi_r, rtol=1e-9, atol=1e-9)
    for got, ref in zip(aux_p, aux_r):
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_planes_alpha_zero_matches_onepass(interpret_pallas):
    # bootstrap mode: alpha = 0 must reproduce the plain one-pass kernel
    from srbd_nmpc_tpu.ops import sqp_pallas, sqp_planes

    B, N = 8, 5
    dtype = jnp.float64
    cfg, params, weights, xa, us, xra, x0s, rng = _setup(B, N, dtype, seed=3)
    Ac, bc = srbd.constraint_matrix(params)

    dx_r, du_r, dphi_r, aux_r = sqp_pallas.sqp_qp_solve_onepass(
        params, weights.Q, weights.Qf, weights.R, Ac, bc,
        xa, us, xra, x0s - xa[0], cfg.mu_barrier, cfg.theta_barrier,
        reg=1e-9, block=B)
    zx = jnp.zeros_like(xa)
    zu = jnp.zeros_like(us)
    dx_p, du_p, dphi_p, aux_p = sqp_planes.sqp_qp_solve_onepass_planes(
        params, weights.Q, weights.Qf, weights.R, Ac, bc,
        xa, us, xra, zx, zu, jnp.zeros(B, dtype), x0s,
        cfg.mu_barrier, cfg.theta_barrier, reg=1e-9, block=B)

    np.testing.assert_allclose(dx_p, dx_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(du_p, du_r, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dphi_p, dphi_r, rtol=1e-9, atol=1e-9)
    for got, ref in zip(aux_p, aux_r):
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_engine_planes_matches_dense_paths(interpret_pallas):
    # full batched speculative solve: planes kernel vs dense one-pass
    # kernels (cfg.planes toggles), f64, must agree to tight tolerance
    import dataclasses

    dtype = jnp.float64
    cfg = engine.NmpcConfig(N=5, sqp_max_iter=6, pallas_block=8,
                            qp_kernel="fused")
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], cfg.N, dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(11)
    B = 8
    x0s = jnp.asarray(np.asarray(x0)[None]
                      + 0.01 * rng.normal(size=(B, 12)), dtype)
    states = engine.NmpcState(
        x=jnp.zeros((B, cfg.N + 1, 12), dtype),
        u=jnp.full((B, cfg.N, 12), 100.0, dtype),
        alpha=jnp.ones(B, dtype))

    outs = {}
    for planes in (True, False):
        cfg_k = dataclasses.replace(cfg, planes=planes)
        st, info = engine.solve(params, weights, cfg_k, states, x0s, x_ref)
        outs[planes] = (st, info)
    st_p, info_p = outs[True]
    st_d, info_d = outs[False]
    np.testing.assert_allclose(st_p.u, st_d.u, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(st_p.x, st_d.x, rtol=1e-9, atol=1e-11)
    np.testing.assert_array_equal(info_p.sqp_iters, info_d.sqp_iters)
    np.testing.assert_array_equal(info_p.converged, info_d.converged)


def test_engine_compaction_is_bitwise_identical(interpret_pallas):
    """Straggler compaction (cfg.compact): once the live set fits a tier,
    the kernel runs on a gathered sub-batch. The kernel has no cross-lane
    ops, so the full solve must be BITWISE identical with and without
    compaction (and the tiers must actually engage at this size:
    B=32, block=2 -> tiers 8 and 2)."""
    import dataclasses

    dtype = jnp.float64
    cfg = engine.NmpcConfig(N=5, sqp_max_iter=12, pallas_block=2,
                            qp_kernel="fused")
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], cfg.N, dtype)
    x0, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(21)
    B = 32
    # varied perturbation scales -> varied per-scenario iteration counts
    # (probed: the 0.5-scale tail yields a 12-iteration straggler vs 6
    # for the rest), so the live set shrinks through both tiers
    scales = np.concatenate([np.full(20, 0.002), np.full(6, 0.05),
                             np.full(4, 0.2), np.full(2, 0.5)])
    x0s = jnp.asarray(np.asarray(x0)[None]
                      + scales[:, None] * rng.normal(size=(B, 12)), dtype)
    states = engine.NmpcState(
        x=jnp.zeros((B, cfg.N + 1, 12), dtype),
        u=jnp.full((B, cfg.N, 12), 100.0, dtype),
        alpha=jnp.ones(B, dtype))

    outs = {}
    for key, kw in {
        True: dict(compact=True),
        False: dict(compact=False),
        # custom tier divisors (NmpcConfig.compact_tiers): B=32, block=2
        # -> widths 16 and 4, both engaged
        "tiers28": dict(compact=True, compact_tiers=(2, 8)),
    }.items():
        cfg_k = dataclasses.replace(cfg, **kw)
        outs[key] = engine.solve(params, weights, cfg_k, states, x0s,
                                 x_ref)
    st_c, info_c = outs[True]
    st_f, info_f = outs[False]
    st_t, info_t = outs["tiers28"]
    np.testing.assert_array_equal(st_t.u, st_f.u)
    np.testing.assert_array_equal(info_t.sqp_iters, info_f.sqp_iters)
    np.testing.assert_array_equal(st_c.u, st_f.u)
    np.testing.assert_array_equal(st_c.x, st_f.x)
    np.testing.assert_array_equal(info_c.sqp_iters, info_f.sqp_iters)
    np.testing.assert_array_equal(info_c.status, info_f.status)
    np.testing.assert_array_equal(info_c.theta, info_f.theta)
    # sanity: the solve actually had a straggler tail for the tiers to
    # compact (not all scenarios finish on the same trip)
    assert int(np.max(np.asarray(info_f.sqp_iters))) \
        > int(np.min(np.asarray(info_f.sqp_iters)))


def test_factor_matches_gains_stage(interpret_pallas):
    """factor=True (park the Cholesky factor, back-substitute du lazily
    in the forward epilogue) vs the default K/kv parking — same linear
    algebra, different substitution order; measured non-lever on chip
    (engine.NmpcConfig.park_factor docstring) but kept validated."""
    from srbd_nmpc_tpu.ops import sqp_planes

    B, N = 8, 5
    dtype = jnp.float64
    cfg, params, weights, xa, us, xra, x0s, rng = _setup(B, N, dtype)
    Ac, bc = srbd.constraint_matrix(params)
    dxc = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.05, dtype)
    duc = jnp.asarray(rng.normal(size=(N, 12, B)) * 2.0, dtype)
    alpha = jnp.asarray(0.25 + 0.5 * rng.random(B), dtype)

    args = (params, weights.Q, weights.Qf, weights.R, Ac, bc,
            xa, us, xra, dxc, duc, alpha, x0s,
            cfg.mu_barrier, cfg.theta_barrier)
    o_k = sqp_planes.sqp_qp_solve_onepass_planes(
        *args, reg=1e-9, block=B, factor=False)
    o_f = sqp_planes.sqp_qp_solve_onepass_planes(
        *args, reg=1e-9, block=B, factor=True)
    np.testing.assert_allclose(o_f[0], o_k[0], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(o_f[1], o_k[1], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(o_f[2], o_k[2], rtol=1e-9, atol=1e-10)
    for a_f, a_k in zip(o_f[3], o_k[3]):
        np.testing.assert_allclose(a_f, a_k, rtol=1e-9, atol=1e-12)
    with pytest.raises(ValueError, match="rank-6"):
        sqp_planes.sqp_qp_solve_onepass_planes(
            *args, reg=1e-9, block=B, factor=True, rank6=True)


def test_rank6_matches_dense_stage(interpret_pallas):
    # rank-6 backward stage (push-through/Woodbury, 6x6 factorizations)
    # vs the 12x12 structured stage — same linear algebra, different
    # factorization; f64 agreement to ~1e-11
    from srbd_nmpc_tpu.ops import sqp_planes

    B, N = 8, 5
    dtype = jnp.float64
    cfg, params, weights, xa, us, xra, x0s, rng = _setup(B, N, dtype, seed=5)
    Ac, bc = srbd.constraint_matrix(params)
    dxc = jnp.asarray(rng.normal(size=(N + 1, 12, B)) * 0.05, dtype)
    duc = jnp.asarray(rng.normal(size=(N, 12, B)) * 2.0, dtype)
    alpha = jnp.asarray(0.25 + 0.5 * rng.random(B), dtype)
    args = (params, weights.Q, weights.Qf, weights.R, Ac, bc,
            xa, us, xra, dxc, duc, alpha, x0s,
            cfg.mu_barrier, cfg.theta_barrier)
    o6 = sqp_planes.sqp_qp_solve_onepass_planes(
        *args, reg=1e-9, block=B, rank6=True)
    o12 = sqp_planes.sqp_qp_solve_onepass_planes(
        *args, reg=1e-9, block=B, rank6=False)
    np.testing.assert_allclose(o6[0], o12[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(o6[1], o12[1], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(o6[2], o12[2], rtol=1e-9, atol=1e-9)
    for a, b in zip(o6[3], o12[3]):
        np.testing.assert_array_equal(a, b)  # merit: identical plane phase


def test_rank6_falls_back_on_dense_R(interpret_pallas):
    # a non-block-diagonal R weight must silently use the 12x12 path and
    # still be CORRECT (compared against the dense one-pass kernel)
    from srbd_nmpc_tpu.ops import sqp_pallas, sqp_planes

    B, N = 8, 4
    dtype = jnp.float64
    cfg, params, weights, xa, us, xra, x0s, rng = _setup(B, N, dtype, seed=9)
    Ac, bc = srbd.constraint_matrix(params)
    Rfull = weights.R + 1e-6 * jnp.ones((12, 12), dtype)  # dense coupling
    zx = jnp.zeros_like(xa)
    zu = jnp.zeros_like(us)
    za = jnp.zeros(B, dtype)
    op = sqp_planes.sqp_qp_solve_onepass_planes(
        params, weights.Q, weights.Qf, Rfull, Ac, bc, xa, us, xra,
        zx, zu, za, x0s, cfg.mu_barrier, cfg.theta_barrier,
        reg=1e-9, block=B, rank6=True)
    od = sqp_pallas.sqp_qp_solve_onepass(
        params, weights.Q, weights.Qf, Rfull, Ac, bc, xa, us, xra,
        x0s - xa[0], cfg.mu_barrier, cfg.theta_barrier, reg=1e-9, block=B)
    np.testing.assert_allclose(op[0], od[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(op[1], od[1], rtol=1e-9, atol=1e-9)
