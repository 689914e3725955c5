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


def enable_compilation_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Persist compiled executables across processes. Remote (axon)
    compiles of the full-config training step take minutes; the cache
    makes resume-after-wedge and repeat launches start in seconds.
    Safe to call before or after device init (it is a config update)."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even small/fast-compiling programs: the win here is the
    # remote-compile round trip, not local compile CPU time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
