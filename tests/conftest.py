"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use XLA's host
platform with 8 virtual devices. The environment's sitecustomize pins
JAX_PLATFORMS=axon (single real TPU), so we must override via jax.config, not
the env var. XLA_FLAGS must be set before the first backend initialization.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full suite ~25-30 min)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight train/e2e tests (>30 s); off by default,"
        " enable with --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (use --runslow for the full suite)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
