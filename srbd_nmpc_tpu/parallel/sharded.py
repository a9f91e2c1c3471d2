"""Sharded scenario-batched NMPC solves.

The batched solver is `vmap`(engine.solve) under `jit` with NamedSharding
constraints; on a multi-chip mesh XLA partitions the batch across chips
(pure data parallelism, zero communication in the hot loop) and inserts ICI
collectives only for the aggregate statistics — the TPU-native equivalent
of a distributed runtime, replacing nothing in the reference because the
reference has no parallelism at all (SURVEY.md §2).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from srbd_nmpc_tpu.models import srbd
from srbd_nmpc_tpu.nmpc import engine
from srbd_nmpc_tpu.parallel import mesh as mesh_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchSummary:
    """Cross-scenario aggregates. Computed inside jit so that, when the
    batch is sharded, these reductions become XLA `all-reduce`s over ICI
    (the analogue of the reference's scalar merit sums,
    NMPC_solver.cpp:152-198, lifted across the fleet)."""

    n_converged: jnp.ndarray   # [] int32
    mean_iters: jnp.ndarray    # [] float
    max_theta: jnp.ndarray     # []
    max_defect: jnp.ndarray    # []
    min_constraint: jnp.ndarray  # []


def summarize(infos: engine.NmpcInfo) -> BatchSummary:
    return BatchSummary(
        n_converged=jnp.sum(infos.converged.astype(jnp.int32)),
        mean_iters=jnp.mean(infos.sqp_iters.astype(jnp.float32)),
        max_theta=jnp.max(infos.theta),
        max_defect=jnp.max(infos.max_defect),
        min_constraint=jnp.min(infos.min_constraint),
    )


def solve_batch(
    params: srbd.SRBDParams,
    weights: engine.NmpcWeights,
    cfg: engine.NmpcConfig,
    states: engine.NmpcState,     # leading [B] axis on every leaf
    x0s: jnp.ndarray,             # [B, nx]
    x_ref: jnp.ndarray,           # [N+1, nx] (shared) or [B, N+1, nx]
) -> Tuple[engine.NmpcState, engine.NmpcInfo, BatchSummary]:
    """Batched NMPC solve (single- or multi-chip; sharding follows inputs).

    The engine is natively batch-aware: a leading scenario axis routes the
    QP solves through the SoA batch-in-lanes Riccati kernel and runs the
    SQP/line-search loops with per-scenario masks (numerically identical
    to vmap(engine.solve), ~10x faster on TPU)."""
    states_f, infos = engine.solve(params, weights, cfg, states, x0s, x_ref)
    return states_f, infos, summarize(infos)


def make_sharded_solver(
    cfg: engine.NmpcConfig,
    mesh: Optional[Mesh] = None,
    donate_state: bool = True,
):
    """Jit-compile `solve_batch` with scenario-batch shardings over ``mesh``.

    Returns ``fn(params, weights, states, x0s, x_ref)``; inputs with a
    leading batch axis are constrained to the scenario axis, model data is
    replicated. Works unchanged on 1 chip (mesh=None).
    """

    def fn(params, weights, states, x0s, x_ref):
        if mesh is not None:
            sh = mesh_lib.scenario_sharding(mesh)
            states = jax.lax.with_sharding_constraint(states, sh)
            x0s = jax.lax.with_sharding_constraint(x0s, sh)
        return solve_batch(params, weights, cfg, states, x0s, x_ref)

    donate = (2,) if donate_state else ()
    return jax.jit(fn, donate_argnums=donate)


def broadcast_state(state: engine.NmpcState, batch: int) -> engine.NmpcState:
    """Tile a single-scenario state to a [B]-leading batch."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy(), state
    )
