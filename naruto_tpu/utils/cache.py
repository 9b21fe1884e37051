"""Persistent XLA compilation cache.

Compiles through this environment's remote-compile path cost minutes for the
sort-heavy mapping graphs; the persistent cache makes every process after
the first start instantly. Safe to call multiple times.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("NARUTO_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # source locations embedded in the HLO make the cache key shift with
        # every unrelated code edit; strip them so entries survive edits
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        jax.config.update("jax_traceback_in_locations_limit", 0)
        if os.environ.get("NARUTO_TPU_EXPLAIN_CACHE"):
            jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass  # older jax without these flags
