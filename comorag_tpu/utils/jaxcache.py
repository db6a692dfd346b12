"""Persistent-compile-cache activation that survives any import order.

``comorag_tpu/__init__.py`` sets ``JAX_COMPILATION_CACHE_DIR`` in the
environment, but that only takes effect if the package is imported before
jax. Entry points that import jax first would silently lose the cache and
re-pay multi-minute remote Mosaic compiles — so every compiling module
also calls :func:`ensure_compile_cache` at import time, which applies the
setting programmatically via ``jax.config`` (read lazily at first
compilation, so this works even after jax is imported and initialized).
"""

from __future__ import annotations

import os

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("COMORAG_NO_COMPILE_CACHE"):
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "jax_comorag"
    )
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
        # apply the env threshold programmatically too (the env var is
        # ignored if jax was imported before it was set); the package
        # __init__ defaults it to 0.5 — remote compiles are worth caching
        # aggressively — and a user-exported value wins via setdefault
        min_secs = os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")
        if min_secs is not None:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_secs))
    except Exception:  # pragma: no cover — never break imports over a cache
        pass
