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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_root():
    path = "/root/reference"
    if not os.path.isdir(path):
        pytest.skip("reference tree not available")
    return path
