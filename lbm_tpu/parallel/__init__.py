from lbm_tpu.parallel.mesh import lattice_mesh, lattice_sharding, shard_compiled
from lbm_tpu.parallel.halo import make_halo_step

__all__ = [
    "lattice_mesh",
    "lattice_sharding",
    "shard_compiled",
    "make_halo_step",
]
