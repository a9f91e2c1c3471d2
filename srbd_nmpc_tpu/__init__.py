"""srbd_nmpc_tpu — a TPU-native SRBD NMPC engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ stack (SRBD dynamics + hpipm-cpp + HPIPM/BLASFEO OCP-QP interior-point
solver, see /root/reference):

- ``ops.so3``          : SO(3)/Lie-algebra toolbox   (ref: dynamics/orientation_tool.h)
- ``models.srbd``      : SRBD dynamics + constraints (ref: dynamics/SRBD_model.cpp)
- ``ocpqp``            : OCP-QP data model, batched Riccati + interior-point
                         solver, settings/statistics  (ref: hpipm-cpp/*, HPIPM)
- ``nmpc``             : SQP NMPC engine with filter line search
                         (ref: NMPC_solver.cpp)
- ``parallel``         : mesh/sharding layer for scenario-batched solves
                         (new; no reference counterpart — replaces nothing,
                         the reference is single-threaded)
- ``utils``            : config (YAML), timing/benchmark harness

Everything is batched by construction: solver entry points accept a leading
scenario-batch axis and are `vmap`/`pjit` friendly (static shapes, no
data-dependent Python control flow).
"""

from srbd_nmpc_tpu.ocpqp.data import OcpQp, OcpQpDims
from srbd_nmpc_tpu.ocpqp.solution import OcpQpSolution
from srbd_nmpc_tpu.ocpqp.settings import IpmMode, IpmSettings, IpmStatus
from srbd_nmpc_tpu.ocpqp.statistics import IpmStatistics

__version__ = "0.1.0"

__all__ = [
    "OcpQp",
    "OcpQpDims",
    "OcpQpSolution",
    "IpmMode",
    "IpmSettings",
    "IpmStatus",
    "IpmStatistics",
]
