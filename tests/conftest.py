"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic fake backend for multi-chip tests (SURVEY.md §4d):
``xla_force_host_platform_device_count=8`` gives 8 CpuDevices so pjit/shard_map
sharding is exercised without TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
