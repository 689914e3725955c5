"""Platform selection workaround: the axon sitecustomize registers the
TPU plugin at interpreter startup and overrides JAX_PLATFORMS, so env
vars alone cannot select the CPU backend. Scripts call
``apply_platform_from_env()`` right after importing jax to make
``JAX_PLATFORMS=cpu python script.py`` behave as expected."""

from __future__ import annotations

import os


def apply_platform_from_env(default: str | None = None) -> str | None:
    """Force jax onto the platform named by $JAX_PLATFORMS (or
    ``default``); returns the platform applied (or None)."""
    platform = os.environ.get("JAX_PLATFORMS", default)
    if not platform or platform == "axon":
        return None
    import jax

    jax.config.update("jax_platforms", platform)
    return platform
