"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPUs via
``xla_force_host_platform_device_count`` (see SURVEY.md §4). Environment
must be set before the first ``import jax`` anywhere in the test session.
"""

import os

# Force CPU regardless of the ambient platform (the session presets
# JAX_PLATFORMS=axon); benchmarks run on the real chip via bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A pytest plugin may have imported jax before this conftest ran; the
# backend is created lazily, so forcing the platform via config still works.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-minute CPU compiles)"
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1600)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
