from lbm_tpu.io.vtk import write_structured_points, case_vtk
from lbm_tpu.io.convlog import ConvergenceLog
from lbm_tpu.io import snapshots

__all__ = [
    "write_structured_points",
    "case_vtk",
    "ConvergenceLog",
    "snapshots",
]
