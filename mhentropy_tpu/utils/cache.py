"""Persistent XLA compilation cache.

Compiles on this platform go through a remote-compile relay and take minutes
for large programs; caching them on disk makes every process after the first
start instantly. Call once before building jitted functions.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.jax_compile_cache") -> None:
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: compile as usual
