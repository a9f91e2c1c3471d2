"""Device mesh + sharding helpers for scenario-batched NMPC.

This layer has NO reference counterpart: the reference is single-threaded
C++ (SURVEY.md §2 'Parallelism: NONE'). The TPU-native scaling story is
scenario/batch data-parallelism over a `jax.sharding.Mesh`:

- axis "scenario": thousands of independent QPs (perturbed x0, contact
  schedules) sharded across chips; XLA/GSPMD inserts the ICI collectives
  for any cross-scenario reduction (aggregate stats, convergence counts) —
  the NCCL-equivalent of the design (SURVEY.md §5 'Distributed
  communication backend').
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (SCENARIO_AXIS,),
    devices=None,
) -> Mesh:
    """Build a 1-D (default) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(axis_names) == 1:
        arr = np.asarray(devices)
    else:
        raise NotImplementedError(
            "multi-axis meshes arrive with the stage-parallel Riccati"
        )
    return Mesh(arr, axis_names=tuple(axis_names))


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading scenario-batch axis."""
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scenario_batch(tree, mesh: Mesh):
    """Place every leaf's leading axis on the scenario axis of ``mesh``."""
    sh = scenario_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
