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


def _host_namespace() -> str:
    """Backend- and host-specific cache subdirectory.

    XLA's persistent cache key does NOT include the CPU feature set it
    AOT-compiled for — loading a CPU artifact from a different host logs
    'machine type ... doesn't match' and warns of SIGILL/execution errors.
    Namespacing by platform + a stable hash of /proc/cpuinfo's flags line
    makes foreign artifacts invisible instead of loadable."""
    import hashlib

    import jax

    backend = jax.default_backend()
    tag = backend
    if backend == "cpu":
        try:
            with open("/proc/cpuinfo", "r", encoding="utf-8") as f:
                flags = next(
                    (ln for ln in f if ln.startswith("flags")), ""
                )
            tag += "-" + hashlib.sha1(flags.encode()).hexdigest()[:10]
        except OSError:
            pass
    return tag


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    base = path or os.environ.get("MONOGS_TPU_CACHE", _DEFAULT_DIR)
    cache_dir = os.path.join(base, _host_namespace())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never a requirement
