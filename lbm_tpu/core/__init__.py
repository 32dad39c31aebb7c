from lbm_tpu.core.lattice import D3Q19, feq, phi, moments
from lbm_tpu.core.units import UnitSystem

__all__ = ["D3Q19", "feq", "phi", "moments", "UnitSystem"]
