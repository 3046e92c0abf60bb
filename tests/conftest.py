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


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (full ~20 min suite; the default "
        "fast tier finishes in <5 min)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest tests/` runs the fast tier (<5 min); the ~20
    heavy end-to-end tests (>=6 s each, ~15 min total) need `--runslow`.
    Skipped-not-deselected so an explicitly named slow test says why."""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
