"""OCP-QP data-model validation + statistics surface tests.

The analogue of the reference's wrapper-semantics tier
(hpipm-cpp/test/d_ocp_qp_*_wrapper.cpp — there: RAII copy/move/resize
safety; here: pytree shape validation via OcpQp.check mirroring
OcpQpDim::checkSize, ocp_qp_dim.cpp:59-246) plus the statistics
pretty-printer (ocp_qp_ipm_solver_statistics.hpp disp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbd_nmpc_tpu.ocpqp.data import OcpQp, unconstrained_qp
from srbd_nmpc_tpu.ocpqp.ipm import ipm_solve
from srbd_nmpc_tpu.ocpqp.settings import IpmSettings

from test_riccati import random_qp


def test_dims_inference():
    qp = random_qp(N=7)
    d = qp.dims
    assert (d.N, d.nx, d.nu, d.nbx, d.nbu, d.ng, d.ns) == (7, 5, 3, 0, 0, 0, 0)
    assert not d.has_constraints


def test_check_catches_bad_shapes():
    qp = random_qp(N=5)
    bad = type(qp)(A=qp.A, B=qp.B, b=qp.b[:-1], Q=qp.Q, S=qp.S, R=qp.R,
                   q=qp.q, r=qp.r)
    with pytest.raises(ValueError, match="OcpQp.b"):
        bad.check()
    bad_q = type(qp)(A=qp.A, B=qp.B, b=qp.b, Q=qp.Q[:-1], S=qp.S, R=qp.R,
                     q=qp.q, r=qp.r)
    with pytest.raises(ValueError, match="OcpQp.Q"):
        bad_q.check()


def test_check_catches_bad_indices():
    import dataclasses
    qp = random_qp(N=4)
    bad = dataclasses.replace(
        qp, idxbu=(7,), lbu=jnp.zeros((4, 1)), ubu=jnp.ones((4, 1)),
        lbu_mask=jnp.ones((4, 1)), ubu_mask=jnp.ones((4, 1)))
    with pytest.raises(ValueError, match="idxbu"):
        bad.check()
    bad_s = dataclasses.replace(
        qp, idxs=(5,), Zl=jnp.ones((5, 1)), Zu=jnp.ones((5, 1)),
        zl=jnp.zeros((5, 1)), zu=jnp.zeros((5, 1)),
        lls=jnp.zeros((5, 1)), lus=jnp.zeros((5, 1)))
    with pytest.raises(ValueError, match="idxs"):
        bad_s.check()


def test_qp_is_a_pytree():
    qp = random_qp(N=3)
    doubled = jax.tree.map(lambda a: a * 2, qp)
    np.testing.assert_allclose(doubled.A, 2 * np.asarray(qp.A))
    # static fields survive tree ops
    assert doubled.idxbx == qp.idxbx


def test_statistics_pretty_printer():
    qp = random_qp(N=6)
    x0 = jnp.zeros(5)
    _, stats = ipm_solve(qp, x0, IpmSettings())
    text = stats.pretty()
    assert "ipm iterations: 0" in text
    assert "res_stat" in text and "obj" in text
