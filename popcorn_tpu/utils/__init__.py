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


def enable_compile_cache(path: str | None = None) -> str | None:
    """Persistent XLA compilation cache shared across process restarts.

    Every CLI invocation re-jits the same handful of executables (the
    member fold alone costs ~20-40 s of XLA compile on a cold process).
    The reference has no analogue — torch eager pays no compile — but on
    TPU this is the dominant startup cost, so the CLIs expose it as
    ``--compile_cache [DIR]`` / ``$POPCORN_COMPILE_CACHE``. Returns the
    resolved directory, or None when disabled (no path given anywhere).

    Must be called before the first jit compilation; safe to call before
    backends initialize.
    """
    import os

    path = path or os.environ.get("POPCORN_COMPILE_CACHE")
    if not path:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # jax's cache singleton binds to the directory in effect at FIRST use;
    # if a cache was already initialized in this process (e.g. the test
    # conftest's), re-pointing the config alone would silently keep writing
    # to the old directory — reset so the new path takes effect.
    from jax._src.compilation_cache import reset_cache

    try:
        reset_cache()
    except Exception:  # not initialized yet — nothing to reset
        pass
    # Cache everything: the executables here are few and reused verbatim,
    # so the default 1 s / 64-byte thresholds only lose hits.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
