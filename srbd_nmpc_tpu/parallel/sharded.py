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


def make_shardmap_solver(
    cfg: engine.NmpcConfig,
    mesh: Mesh,
    donate_state: bool = True,
):
    """Jit-compile the batched solve as a ``jax.shard_map`` over ``mesh``:
    each device runs the FULL engine — while-loop phases, straggler
    compaction tiers, Pallas permute crossings — on its LOCAL scenario
    shard, with zero communication in the hot loop; only the
    ``BatchSummary`` reductions cross chips (outside the shard_map, as
    XLA all-reduces over ICI).

    This is the multi-chip form of the straggler-compaction fast path
    (``NmpcConfig.compact``). Under plain jit + NamedSharding
    (``make_sharded_solver``) the compaction crossings would be GLOBAL
    ops — a cross-device argsort and lane gathers that GSPMD turns into
    collectives, and the one-hot-matmul permute kernels
    (ops/permute_pallas) cannot be partitioned at all. shard_map makes
    the crossings device-local, which is also the right design: each
    chip compacts its own stragglers independently (per-lane math has no
    cross-lane ops, so the result is bitwise identical to the unsharded
    solve — tests/test_sharding.py::test_shardmap_compaction_matches_
    unsharded).

    Constraints: the global batch must divide evenly over the mesh's
    scenario axis, and the LOCAL batch (B / n_devices) must satisfy the
    fused-path eligibility (divisible by ``cfg.pallas_block``) for the
    Pallas kernels to engage per device. ``x_ref`` may be shared
    ``[N+1, nx]`` (replicated) or per-scenario ``[B, N+1, nx]``
    (sharded)."""
    from jax.sharding import PartitionSpec as P

    spec_b = P(mesh_lib.SCENARIO_AXIS)

    def local_solve(params, weights, states, x0s, x_ref):
        states_f, infos = engine.solve(params, weights, cfg, states, x0s,
                                       x_ref)
        return states_f, infos

    def fn(params, weights, states, x0s, x_ref):
        ref_spec = spec_b if x_ref.ndim == 3 else P()
        # check_vma=False: the Pallas kernels inside the engine don't
        # annotate varying-mesh-axes on their out_shapes (jax 0.9's
        # check would reject them); the body is communication-free so
        # the check buys nothing here
        states_f, infos = jax.shard_map(
            local_solve, mesh=mesh,
            in_specs=(P(), P(), spec_b, spec_b, ref_spec),
            out_specs=(spec_b, spec_b),
            check_vma=False,
        )(params, weights, states, x0s, x_ref)
        return states_f, infos, summarize(infos)

    donate = (2,) if donate_state else ()
    return jax.jit(fn, donate_argnums=donate)


def broadcast_state(state: engine.NmpcState, batch: int) -> engine.NmpcState:
    """Tile a single-scenario state to a [B]-leading batch."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy(), state
    )
