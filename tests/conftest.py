"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the standard JAX trick for exercising multi-chip sharding without
hardware (SURVEY.md section 4): force the host platform and split it into
8 virtual devices BEFORE jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; force the CPU backend
# explicitly before anything initializes devices.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by the
# 10-25 s XLA compiles of the interpret-mode Pallas kernels (the kernel
# bodies are large; trace size is shape-independent). Caching them makes
# every rerun after the first finish in a fraction of the time, which is
# what the local edit-test loop actually feels. The dir is gitignored.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_root():
    path = "/root/reference"
    if not os.path.isdir(path):
        pytest.skip("reference tree not available")
    return path
