"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPUs via
``xla_force_host_platform_device_count`` (see SURVEY.md §4). Environment
must be set before the first ``import jax`` anywhere in the test session.

Wall-clock contract (VERDICT r4 #7): ``pytest tests/ -q -m "not slow"``
is the quick gate — measured 4m55s-6m20s warm across sessions on this
1-core host (box-load-dependent; the cost is ~245 tests' tracing and
real jitted CPU execution over the 8-device mesh, not compiles — those
hit the persistent cache below). The ``slow``-marked tests are heavier
e2e/duplicate-coverage variants (multi-minute traces or full epochs);
every feature they cover keeps at least one fast representative. For
sub-minute iteration target a file (``pytest tests/test_foo.py -q``).
Run the FULL suite (``pytest tests/ -q``, ~25 min) before a release.
"""

import os

# Force CPU regardless of the ambient platform (the session presets
# JAX_PLATFORMS=axon); benchmarks run on the real chip via bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU's AOT-cache loader E-logs a spurious machine-feature mismatch on
# every cached-executable load (its compile-time target embeds the
# prefer-no-scatter/gather *tuning* pseudo-features, which the host-feature
# probe never reports). Two 2 KB stderr lines per load drown real output;
# real failures still surface as Python exceptions.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A pytest plugin may have imported jax before this conftest ran; the
# backend is created lazily, so forcing the platform via config still works.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache (VERDICT r3 #9: test-suite wall clock).
# The suite's cost is dominated by CPU XLA compiles of full train/eval
# steps; caching them makes every run after the first start-to-finish
# fast (measured 15.7s -> 0.8s per cached executable). Override the
# location with POPCORN_TEST_COMPILE_CACHE; set it empty to disable.
_cache_dir = os.environ.get(
    "POPCORN_TEST_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"),
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
