"""Relaxed logarithmic barrier for softened inequality constraints.

Parity with ``SRBDModel::Barrier`` (/root/reference/dynamics/SRBD_model.cpp:262-295):
for a constraint value ``v`` (feasible when v > 0), barrier weight ``mu`` and
relaxation threshold ``theta``:

    v > theta:   b = -mu log(v),      db = -mu/v,              ddb =  mu/v^2
    v <= theta:  b = mu/2 (((v-2t)/t)^2 - 1) - mu log(t)
                 db = mu (v - 2t)/t^2
                 ddb = mu/t^2

The two pieces are C^2-continuous at ``v == theta``. Branchless (`jnp.where`
with a NaN-safe log argument) so it vectorizes over the 24 constraint rows x
N stages x batch and is autodiff-clean.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def relaxed_log_barrier(
    v: jnp.ndarray, mu: float, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (b, db, ddb), elementwise over ``v``."""
    v = jnp.asarray(v)
    dtype = v.dtype
    mu = jnp.asarray(mu, dtype)
    theta = jnp.asarray(theta, dtype)

    in_log = v > theta
    # Safe argument: where the log branch is unselected, evaluate at theta
    # so no NaN leaks through jnp.where's gradient.
    v_safe = jnp.where(in_log, v, theta)

    b_log = -mu * jnp.log(v_safe)
    db_log = -mu / v_safe
    ddb_log = mu / (v_safe * v_safe)

    z = (v - 2.0 * theta) / theta
    b_quad = 0.5 * mu * (z * z - 1.0) - mu * jnp.log(theta)
    db_quad = mu * (v - 2.0 * theta) / (theta * theta)
    ddb_quad = jnp.broadcast_to(mu / (theta * theta), v.shape)

    b = jnp.where(in_log, b_log, b_quad)
    db = jnp.where(in_log, db_log, db_quad)
    ddb = jnp.where(in_log, ddb_log, ddb_quad)
    return b, db, ddb
