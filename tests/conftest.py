"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip behavior is exercised the way the reference exercises multi-node
MPI (oversubscribed ranks on one machine, core/tests/CMakeLists.txt:2-44):
here, XLA host devices stand in for TPU chips.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# override back to the virtual 8-device CPU mesh for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

TEST_DATA = pathlib.Path("/root/reference/test_data")


@pytest.fixture(scope="session")
def test_data():
    return TEST_DATA
