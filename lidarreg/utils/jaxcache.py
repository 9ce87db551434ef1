"""Persistent XLA compilation cache (first compile on the tunneled TPU costs
minutes; cached reloads are ~4x faster and survive process restarts)."""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    """Idempotent; call before the first jit compilation."""
    import jax

    cache_dir = path or os.environ.get(
        "LIDARREG_JAX_CACHE", os.path.expanduser("~/.cache/jax_lidarreg")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: compile cache is best-effort
