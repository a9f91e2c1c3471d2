"""Fused Pallas linearization kernel vs the XLA SoA linearizer.

Validated in interpreter mode (same kernel program); see
models/srbd_pallas.py for TPU status.
"""

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
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    import importlib

    import srbd_nmpc_tpu.models.srbd_pallas as sp
    importlib.reload(sp)
    yield sp
    monkeypatch.undo()
    importlib.reload(sp)


def test_matches_xla_linearizer(interpret_pallas):
    sp = interpret_pallas
    B, N = 128, 12
    dtype = jnp.float32
    cfg = engine.NmpcConfig(N=N)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], N, dtype)
    _, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(0)
    states = engine.NmpcState(
        x=jnp.asarray(rng.normal(size=(B, N + 1, 12)) * 0.3, dtype),
        u=jnp.asarray(rng.normal(size=(B, N, 12)) * 30 + 80, dtype),
        alpha=jnp.ones(B, dtype))

    A, Bm, b, Q, S, R, q, r, _ = engine._linearize_soa(params, weights, cfg, states, x_ref)

    Ac, bc = srbd.constraint_matrix(params)
    xs = jnp.transpose(states.x[:, :-1, :], (1, 2, 0))
    xn = jnp.transpose(states.x[:, 1:, :], (1, 2, 0))
    us = jnp.transpose(states.u, (1, 2, 0))
    xr = jnp.broadcast_to(
        jnp.transpose(x_ref[:-1][None], (1, 2, 0)), (N, 12, B)).copy()
    Ap, Bp, bp, qp_, rp, Rp, mer = sp.linearize_pallas(
        params, weights.Q, weights.R, Ac, bc, xs, xn, us, xr,
        cfg.mu_barrier, cfg.theta_barrier, block=128)

    np.testing.assert_allclose(Ap, A, atol=1e-5)
    np.testing.assert_allclose(Bp, Bm, atol=1e-6)
    np.testing.assert_allclose(bp, b, atol=1e-5)
    np.testing.assert_allclose(qp_, q[:-1], atol=1e-5)
    np.testing.assert_allclose(rp, r, atol=1e-5)
    np.testing.assert_allclose(Rp, R, atol=1e-5)
    assert mer.shape == (N, 8, B)


def test_engine_wrapper_matches_soa(interpret_pallas, monkeypatch):
    """engine._linearize_pallas (fused kernel + terminal/reduction glue)
    must reproduce _linearize_soa's outputs AND merit byproducts."""
    import srbd_nmpc_tpu.nmpc.engine as eng

    B, N = 128, 12
    dtype = jnp.float32
    cfg = engine.NmpcConfig(N=N)
    params = srbd.SRBDParams.create(dt=0.015, dtype=dtype)
    weights = engine.NmpcWeights.create(
        [0] * 11 + [10], 1e-4,
        [.5, .5, .5, .01, .01, .01, 100, 100, 100, 0, 0, 100], N, dtype)
    _, x_ref = engine.make_benchmark_problem(cfg, dtype)
    rng = np.random.default_rng(1)
    states = engine.NmpcState(
        x=jnp.asarray(rng.normal(size=(B, N + 1, 12)) * 0.3, dtype),
        u=jnp.asarray(rng.normal(size=(B, N, 12)) * 30 + 80, dtype),
        alpha=jnp.ones(B, dtype))

    # route the engine wrapper through the reloaded (interpret-mode) module
    monkeypatch.setattr("srbd_nmpc_tpu.models.srbd_pallas", interpret_pallas)
    import sys
    monkeypatch.setitem(sys.modules, "srbd_nmpc_tpu.models.srbd_pallas",
                        interpret_pallas)

    A, Bm, b, Q, S, R, q, r, aux = eng._linearize_soa(
        params, weights, cfg, states, x_ref)
    Ap, Bp, bp, Rp, qp_, rp, auxp = eng._linearize_pallas(
        params, weights, cfg, states, x_ref, block=128)

    np.testing.assert_allclose(Ap, A, atol=1e-5)
    np.testing.assert_allclose(bp, b, atol=1e-5)
    np.testing.assert_allclose(qp_, q, atol=1e-5)
    np.testing.assert_allclose(rp, r, atol=1e-5)
    np.testing.assert_allclose(Rp, R, atol=1e-5)
    for got, want, tol in zip(auxp, aux, (2e-4, 2e-2, 1e-5, 1e-5)):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=tol)
