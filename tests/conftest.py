"""Test configuration: run all tests on a virtual 8-device CPU backend.

Multi-chip sharding logic is validated with
``--xla_force_host_platform_device_count=8`` (the standard JAX answer to
testing pod-slice logic without a pod); bench.py does NOT import this and
runs on the real TPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# a sitecustomize may force jax_platforms to the TPU tunnel; override it
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
