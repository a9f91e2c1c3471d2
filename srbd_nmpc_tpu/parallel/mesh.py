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
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a device mesh.

    1-D (default): all/first ``n_devices`` devices on one axis.

    Multi-axis (e.g. ``axis_names=("scenario", "stage")`` for the
    stage-parallel associative-scan Riccati — see
    ops/riccati_pscan.lqr_solve_pscan and __graft_entry__.
    dryrun_multichip): ``axis_sizes`` gives the grid shape; at most one
    entry may be -1 (inferred from the device count). When
    ``axis_sizes`` is omitted, every axis but the FIRST gets size 1 —
    the degenerate-but-valid mesh that lets code written against a 2-D
    mesh run unchanged on a scenario-only device set.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    axis_sizes = tuple(axis_sizes)
    if len(axis_sizes) != len(axis_names):
        raise ValueError(f"axis_sizes {axis_sizes} does not match "
                         f"axis_names {axis_names}")
    if axis_sizes.count(-1) > 1:
        raise ValueError(f"at most one -1 in axis_sizes, got {axis_sizes}")
    if -1 in axis_sizes:
        known = int(np.prod([s for s in axis_sizes if s != -1]))
        if known == 0 or n % known != 0:
            raise ValueError(
                f"cannot infer -1 in axis_sizes {axis_sizes} from "
                f"{n} devices")
        axis_sizes = tuple(n // known if s == -1 else s for s in axis_sizes)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(
            f"axis_sizes {axis_sizes} needs {int(np.prod(axis_sizes))} "
            f"devices, have {n}")
    arr = np.asarray(devices).reshape(axis_sizes)
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
