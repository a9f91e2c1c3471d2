"""OCP-QP data model and solvers (Riccati LQR + interior-point).

TPU-native replacement for the reference's hpipm-cpp layer and the used
functionality of HPIPM itself (/root/reference/hpipm-cpp). Data is stored as
stage-stacked arrays (pytrees) instead of ``std::vector<OcpQp>`` so that a
whole horizon solves inside one `lax.scan` and a whole scenario batch under
one `vmap`.
"""

from srbd_nmpc_tpu.ocpqp.data import OcpQp, OcpQpDims
from srbd_nmpc_tpu.ocpqp.solution import OcpQpSolution
from srbd_nmpc_tpu.ocpqp.settings import IpmMode, IpmSettings, IpmStatus
from srbd_nmpc_tpu.ocpqp.statistics import IpmStatistics

__all__ = [
    "OcpQp",
    "OcpQpDims",
    "OcpQpSolution",
    "IpmMode",
    "IpmSettings",
    "IpmStatus",
    "IpmStatistics",
]
