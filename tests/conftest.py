"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers the axon TPU backend before any
user code runs, so JAX_PLATFORMS cannot be overridden via env. Instead we set
XLA_FLAGS early (for the 8 virtual host devices) and pin jax's default device
to CPU — tests get full f32 precision and fast local compiles; sharding tests
build meshes from ``jax.devices('cpu')`` (SURVEY.md §4 item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_devices(n=None):
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
