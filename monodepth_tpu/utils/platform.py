"""Make JAX_PLATFORMS / XLA_FLAGS effective for CLI entry points.

Some images import jax at interpreter startup (sitecustomize), which
latches the platform before user code runs; an exported
``JAX_PLATFORMS=cpu`` would then be silently ignored. Re-apply the
environment through the config API so the CLIs honor it.
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platforms)
    except Exception:
        pass  # already initialized on the requested platform
