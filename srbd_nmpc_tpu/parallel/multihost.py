"""Multi-host scenario fan-out (DCN tier).

The reference has no distributed story at all (SURVEY.md §2); this module
provides the standard JAX multi-controller pattern for scaling the
scenario fleet past one host: every host runs the same program,
`jax.distributed.initialize` wires the cluster, the global mesh spans all
chips, and per-host scenario shards are assembled into one global array
with `jax.make_array_from_process_local_data`. The solver code is
unchanged — the same jit'ed `solve_batch` runs on the global mesh, with
intra-host reductions on ICI and cross-host on DCN, exactly the
GSPMD-inserts-collectives design of SURVEY.md §5.

Single-host (including this CI) degenerates gracefully: `initialize()` is
a no-op when no cluster env is present, and the "global" mesh is the local
one — covered by tests/test_sharding.py on the 8-device virtual mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srbd_nmpc_tpu.parallel.mesh import SCENARIO_AXIS


def initialize_cluster(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> None:
    """Bring up the JAX multi-controller runtime.

    With no arguments, relies on the environment (TPU pod metadata /
    JAX_COORDINATOR_ADDRESS etc.); silently does nothing if the runtime is
    already initialized or single-process.
    """
    if jax.process_count() > 1:
        return  # already distributed
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError):
        # single-process run (no cluster env): local devices only
        pass


def global_scenario_mesh() -> Mesh:
    """1-D scenario mesh over ALL devices in the cluster (all hosts)."""
    return Mesh(np.asarray(jax.devices()), axis_names=(SCENARIO_AXIS,))


def distribute_scenarios(local_batch_leaves, mesh: Mesh):
    """Assemble per-host scenario shards into global arrays.

    ``local_batch_leaves`` is a pytree whose leaves have this host's slice
    of the scenario batch on the leading axis; the result is a pytree of
    global arrays sharded over the scenario axis (global batch =
    sum of per-host batches, uniform per host).
    """
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        local_batch_leaves,
    )
