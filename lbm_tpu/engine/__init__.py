from lbm_tpu.engine.spec import CaseSpec, PlaneBC
from lbm_tpu.engine.compile import CompiledCase, compile_case
from lbm_tpu.engine.step import make_step, initial_f
from lbm_tpu.engine.runner import Simulation, RunResult
from lbm_tpu.engine.scalar import ScalarTransport, CoupledTransport
from lbm_tpu.engine.thermal import BuoyantTransport

__all__ = [
    "CaseSpec",
    "PlaneBC",
    "CompiledCase",
    "compile_case",
    "make_step",
    "initial_f",
    "Simulation",
    "RunResult",
    "ScalarTransport",
    "CoupledTransport",
    "BuoyantTransport",
]
