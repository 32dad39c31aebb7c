from lbm_tpu.utils.profiling import Meter, trace

__all__ = ["Meter", "trace"]
