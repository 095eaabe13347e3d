"""JAX runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache.  On the axon-tunneled TPU
    used for development, cold compiles go through a remote-compile POST
    and can take minutes; the persistent cache makes re-runs instant."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax_comp_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
