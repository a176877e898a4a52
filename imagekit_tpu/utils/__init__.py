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

    cache_dir = compile_cache_path()
    if cache_dir.lower() == "off":
        return
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs


def compile_cache_path() -> str:
    """The persistent compile cache directory (the deployment artifact
    bakes this at image build time — tools/bake_compile_cache.py)."""
    return os.environ.get(
        "IMAGEKIT_COMPILE_CACHE",
        os.path.expanduser("~/.cache/imagekit_tpu/jax"),
    )


def limit_malloc_arenas(n: int = 2) -> bool:
    """Cap glibc malloc arenas (mallopt M_ARENA_MAX).

    The serving process allocates large short-lived buffers from several
    threads (codec pool, device dispatch, HTTP); with default arena
    settings glibc retains freed memory per-arena up to the high-water
    mark — measured at ~3 GB resident under a shape-diverse soak, vs
    ~500 MB with two arenas (throughput unchanged on small hosts). Must
    run before the thread pools spawn. Returns True when applied."""
    import ctypes

    try:
        libc = ctypes.CDLL(None)
        M_ARENA_MAX = -8
        return bool(libc.mallopt(M_ARENA_MAX, int(n)))
    except Exception:  # noqa: BLE001 - non-glibc platforms
        return False


def malloc_trim() -> bool:
    """Return freed arena memory to the OS (glibc malloc_trim). Called
    periodically by the serving app: large transient codec buffers push
    the allocator high-water mark up under load spikes, and glibc holds
    that memory otherwise."""
    import ctypes

    try:
        return bool(ctypes.CDLL(None).malloc_trim(0))
    except Exception:  # noqa: BLE001
        return False
