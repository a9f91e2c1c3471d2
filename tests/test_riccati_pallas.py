"""Fused Pallas Riccati kernel vs the XLA SoA kernel (interpret mode).

The kernel's TPU compilation is gated by the image's Mosaic toolchain (see
module docstring of ops.riccati_pallas); numerics are validated here in
interpreter mode, which exercises the same kernel program.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from srbd_nmpc_tpu.ops import riccati_soa


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    # re-import module so the patched pallas_call is picked up
    import importlib

    import srbd_nmpc_tpu.ops.riccati_pallas as rp
    importlib.reload(rp)
    yield rp
    monkeypatch.undo()
    importlib.reload(rp)


def make_problem(N=20, B=256, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    rnd = lambda *s: jnp.asarray(rng.normal(size=s), dtype)
    A = rnd(N, 12, 12, B) * 0.2 + jnp.eye(12, dtype=dtype)[..., None]
    Bm = rnd(N, 12, 12, B) * 0.1
    b = rnd(N, 12, B) * 0.1
    Qh = rnd(N + 1, 12, 12, B)
    Q = jnp.einsum("nikb,njkb->nijb", Qh, Qh) * 0.1 + jnp.eye(12, dtype=dtype)[..., None]
    Rh = rnd(N, 12, 12, B)
    R = jnp.einsum("nikb,njkb->nijb", Rh, Rh) * 0.1 + jnp.eye(12, dtype=dtype)[..., None]
    q = rnd(N + 1, 12, B)
    r = rnd(N, 12, B)
    x0 = rnd(12, B)
    return A, Bm, b, Q, R, q, r, x0


def test_matches_soa_kernel(interpret_pallas):
    rp = interpret_pallas
    A, Bm, b, Q, R, q, r, x0 = make_problem(N=8, B=128)
    x_p, u_p = rp.lqr_solve_pallas(A, Bm, b, Q, R, q, r, x0, reg=1e-7, block=128)
    S = jnp.zeros((8, 12, 12, 128), jnp.float32)
    x_s, u_s, _ = riccati_soa.lqr_solve(A, Bm, b, Q, S, R, q, r, x0, reg=1e-7)
    np.testing.assert_allclose(x_p, x_s, atol=3e-5)
    np.testing.assert_allclose(u_p, u_s, atol=3e-5)


def test_grid_blocks_independent(interpret_pallas):
    rp = interpret_pallas
    A, Bm, b, Q, R, q, r, x0 = make_problem(N=6, B=256)
    x2, u2 = rp.lqr_solve_pallas(A, Bm, b, Q, R, q, r, x0, reg=1e-7, block=128)
    x1, u1 = rp.lqr_solve_pallas(A, Bm, b, Q, R, q, r, x0, reg=1e-7, block=256)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(u2, u1, atol=1e-6)


def test_constq_variant_matches(interpret_pallas):
    """(Q, Qf) tuple input (stage/scenario-constant costs, the NMPC
    engine's case) must match the full-Q kernel."""
    rp = interpret_pallas
    A, Bm, b, Q, R, q, r, x0 = make_problem(N=8, B=128)
    rng = np.random.default_rng(5)
    Qh = jnp.asarray(rng.normal(size=(12, 12)), jnp.float32)
    Qs = Qh @ Qh.T * 0.1 + jnp.eye(12, dtype=jnp.float32)
    Qfh = jnp.asarray(rng.normal(size=(12, 12)), jnp.float32)
    Qfs = Qfh @ Qfh.T * 0.1 + jnp.eye(12, dtype=jnp.float32)
    Qfull = jnp.concatenate(
        [jnp.broadcast_to(Qs[None, :, :, None], (8, 12, 12, 128)),
         jnp.broadcast_to(Qfs[None, :, :, None], (1, 12, 12, 128))], axis=0)
    x_c, u_c = rp.lqr_solve_pallas(A, Bm, b, (Qs, Qfs), R, q, r, x0,
                                   reg=1e-7, block=128)
    x_f, u_f = rp.lqr_solve_pallas(A, Bm, b, Qfull, R, q, r, x0,
                                   reg=1e-7, block=128)
    np.testing.assert_allclose(x_c, x_f, atol=1e-6)
    np.testing.assert_allclose(u_c, u_f, atol=1e-6)
