"""Shared utilities (logging, profiling, visualization, platform)."""


def apply_platform_env() -> None:
    """Make a ``JAX_PLATFORMS`` environment override actually stick.

    In environments where a PJRT plugin is preloaded before user code
    runs (e.g. a sitecustomize injection), jax can pick its platform
    before the environment variable is consulted, so ``JAX_PLATFORMS=cpu
    python run_train.py ...`` silently lands on the ambient accelerator.
    Setting the platform through ``jax.config`` before the first backend
    query is the reliable override (tests/conftest.py and
    ``__graft_entry__._provision_devices`` use the same mechanism).
    Called at the top of every jax-importing CLI entry point; no-op when
    the variable is unset.
    """
    import os

    val = os.environ.get("JAX_PLATFORMS")
    if val:
        import jax

        jax.config.update("jax_platforms", val)
