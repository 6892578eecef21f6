"""Make JAX_PLATFORMS / XLA_FLAGS effective for CLI entry points.

Some images import jax at interpreter startup (sitecustomize), which
latches the platform before user code runs; an exported
``JAX_PLATFORMS=cpu`` would then be silently ignored. Re-apply the
environment through the config API so the CLIs honor it.
"""

from __future__ import annotations

import os


def enable_compile_cache(directory: str) -> None:
    """Persistent XLA compile cache — repeated CLI invocations (resume,
    eval sweeps, hyperparameter retries) skip the multi-minute TPU
    compile of the train step."""
    import jax

    try:
        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # respect an already-configured cache (e.g. tests)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def apply_env_platform() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except Exception:
        pass  # already initialized on the requested platform
