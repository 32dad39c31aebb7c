from lbm_tpu.kernels.collide_stream import (
    make_pallas_step,
    pack_state,
    pad_spec,
    unpack_state,
)

__all__ = ["make_pallas_step", "pack_state", "pad_spec", "unpack_state"]
