"""Test config: run everything on a virtual 8-device CPU mesh.

Set before any jax import — the JAX analogue of the reference's
CPU-MirroredStrategy fallback (SURVEY.md §4 "Distributed testing").
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin; explicitly pin the
# cpu backend so tests always see the 8-device virtual mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
