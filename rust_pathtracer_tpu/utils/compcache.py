"""Persistent XLA compilation cache.

First compiles over the axon TPU tunnel (remote compile) cost minutes;
the persistent cache makes repeat runs (bench, CLI, driver checks)
start in seconds.  Call early, before the first jit execution.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    # TPU-only: CPU AOT artifacts are machine-feature specific and the
    # remote-compile service may not match the local host (SIGILL risk)
    if jax.default_backend() != "tpu":
        return ""

    cache_dir = cache_dir or os.environ.get(
        "RPT_COMPILATION_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
