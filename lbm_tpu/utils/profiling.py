"""Throughput metering + profiler tracing.

The reference's only observability is cudaEvent wall-clock pairs printed
at save cadence (ldc.cu:622-689); MLUPS is derived offline (thesis §4.9.1).
Here: a steps/sec -> MLUPS meter usable around any chunk, and a context
manager around jax.profiler for device traces (view with TensorBoard or
xprof).
"""

from __future__ import annotations

import contextlib
import time


class Meter:
    """Accumulating lattice-update throughput meter."""

    def __init__(self, n_sites: int):
        self.n_sites = int(n_sites)
        self.steps = 0
        self.seconds = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds += time.perf_counter() - self._t0
        self._t0 = None

    def add_steps(self, n: int):
        self.steps += n

    @property
    def mlups(self) -> float:
        if self.seconds == 0:
            return 0.0
        return self.n_sites * self.steps / self.seconds / 1e6

    def report(self) -> str:
        return (
            f"{self.steps} steps, {self.seconds*1e3:.1f} ms total, "
            f"{self.mlups:.1f} MLUPS"
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


__all__ = ["Meter", "trace"]
