"""Entry-plane SRBD algebra (models.srbd_planes) vs the SoA twin."""

import jax.numpy as jnp
import numpy as np

from srbd_nmpc_tpu.models import srbd, srbd_soa, srbd_planes

RNG = np.random.default_rng(77)


def _setup(shape=(5, 16)):
    params = srbd.SRBDParams.create(dtype=jnp.float64)
    x = jnp.asarray(RNG.normal(size=(12,) + shape) * 0.3)
    u = jnp.asarray(RNG.normal(size=(12,) + shape) * 30.0 + 50.0)
    xt = tuple(x[i] for i in range(12))
    ut = tuple(u[i] for i in range(12))
    Iinv = tuple(tuple(float(params.inertia_inv[i, j]) for j in range(3))
                 for i in range(3))
    pf0 = tuple(float(params.foot_pos[0, i]) for i in range(3))
    pf1 = tuple(float(params.foot_pos[1, i]) for i in range(3))
    return params, x, u, xt, ut, Iinv, pf0, pf1


def _stackm(M):
    return jnp.stack([jnp.stack([jnp.broadcast_to(jnp.asarray(
        M[i][j], jnp.float64), M[0][0].shape if hasattr(M[0][0], "shape")
        else ()) for j in range(3)]) for i in range(3)])


def test_dynamics_matches_soa():
    params, x, u, xt, ut, Iinv, pf0, pf1 = _setup()
    got = srbd_planes.dynamics(params.mass, Iinv, pf0, pf1, xt, ut)
    ref = srbd_soa.dynamics(params, x, u)
    for i in range(12):
        np.testing.assert_allclose(got[i], ref[i], rtol=1e-13, atol=1e-13)


def test_so3_chain_matches_soa():
    params, x, u, xt, ut, *_ = _setup()
    r = xt[0:3]
    R, Jl, Jlt, djlt = srbd_planes.so3_chain(r)
    ref = srbd_soa.so3_chain(x[0:3])
    shape = x.shape[1:]
    for got, key in ((R, "R"), (Jl, "Jl"), (Jlt, "Jlt")):
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(
                    jnp.broadcast_to(jnp.asarray(got[i][j]), shape),
                    ref[key][i, j], rtol=1e-12, atol=1e-13)
    for a in range(3):
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(
                    jnp.broadcast_to(jnp.asarray(djlt[a][i][j]), shape),
                    ref["djlt"][a, i, j], rtol=1e-12, atol=1e-12)


def test_linearize_stage_matches_soa():
    params, x, u, xt, ut, Iinv, pf0, pf1 = _setup()
    D1, D2, sF, sr, sl, x_next = srbd_planes.linearize_stage(
        params.mass, float(params.dt), Iinv, pf0, pf1, xt, ut)
    D1r, D2r, SFr, Srr, Slr, x_next_r = srbd_soa.linearize_stage(
        params, x, u)
    shape = x.shape[1:]
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(
                jnp.broadcast_to(jnp.asarray(D1[i][j]), shape), D1r[i, j],
                rtol=1e-11, atol=1e-12)
            np.testing.assert_allclose(
                jnp.broadcast_to(jnp.asarray(D2[i][j]), shape), D2r[i, j],
                rtol=1e-12, atol=1e-13)
    # skew generators: SF = skew(sF), Sr = skew(sr), Sl = skew(sl)
    for vec, Mref in ((sF, SFr), (sr, Srr), (sl, Slr)):
        Mgot = srbd_planes.skew(vec)
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(
                    jnp.broadcast_to(jnp.asarray(Mgot[i][j]), shape),
                    Mref[i, j], rtol=1e-12, atol=1e-13)
    for i in range(12):
        np.testing.assert_allclose(x_next[i], x_next_r[i], rtol=1e-12,
                                   atol=1e-13)
