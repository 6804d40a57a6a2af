"""Persistent XLA compilation cache.

Tracking/mapping programs take 30-60 s each to compile; enabling the
persistent cache makes every process after the first start in seconds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("MONOGS_TPU_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never a requirement
