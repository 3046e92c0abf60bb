"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh — the TPU-world
equivalent of testing multi-node without a cluster (SURVEY.md §4). Must run
before jax initializes a backend.
"""

import os

# The axon TPU plugin's sitecustomize force-sets JAX_PLATFORMS=axon; the env
# var alone does not stick, but the config update below does.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
