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
        # 0.0: persist even sub-second executables. Engine construction
        # dispatches ~70 tiny one-off ops (Mapper init 43, sim init 28);
        # with the default 1.0s threshold none of them persist, and on the
        # remote-compile path every process start re-pays ~70 compile
        # round trips (~10-15 min before the results dir appears).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # source locations embedded in the HLO make the cache key shift with
        # every unrelated code edit; strip them so entries survive edits
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        jax.config.update("jax_traceback_in_locations_limit", 0)
        if os.environ.get("NARUTO_TPU_EXPLAIN_CACHE"):
            jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass  # older jax without these flags
