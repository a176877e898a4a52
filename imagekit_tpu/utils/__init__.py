"""Shared utilities (bucketing, compile cache)."""

from __future__ import annotations

import os

_cache_enabled = False


def enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a durable directory so
    bucket-pair executables survive process restarts (SURVEY.md §5.4 calls
    this out as the serving analogue of checkpointing). Idempotent."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    import jax

    cache_dir = os.environ.get(
        "IMAGEKIT_COMPILE_CACHE",
        os.path.expanduser("~/.cache/imagekit_tpu/jax"),
    )
    if cache_dir.lower() == "off":
        return
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs
