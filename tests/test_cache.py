"""Cache tests: byte-identical keys/ETags, DiskCache round-trip (bug fixed),
KVCache LRU eviction + stats, Cloudflare header assembly (mirrors the inline
tests at ``src/cache/cloudflare.rs:176-218``)."""

import asyncio
import hashlib

import pytest

from imagekit_tpu.cache import (
    CloudflareCacheConfig,
    DiskCache,
    KVCache,
    cloudflare_cache_headers,
    content_type_from_format,
    etag_for_key,
    format_from_extension,
    key_for_params,
)
from imagekit_tpu.config import ImageFormat


def run(coro):
    return asyncio.run(coro)


# -- keys / etags ------------------------------------------------------------


def test_key_is_sha256_of_canonical():
    params = {"url": "https://e.com/i.jpg", "w": "400", "f": "webp"}
    canonical = "f=webp&url=https://e.com/i.jpg&w=400"
    assert key_for_params(params) == hashlib.sha256(canonical.encode()).hexdigest()


def test_key_order_independent():
    a = {"url": "u", "w": "10", "h": "20"}
    b = {"h": "20", "w": "10", "url": "u"}
    assert key_for_params(a) == key_for_params(b)


def test_etag_quoted_key():
    assert etag_for_key("abc123") == '"abc123"'


def test_mime_helpers():
    assert content_type_from_format(ImageFormat.webp) == "image/webp"
    assert content_type_from_format(ImageFormat.jpeg) == "image/jpeg"
    assert content_type_from_format(ImageFormat.avif) == "image/avif"
    assert format_from_extension("jpg") == ImageFormat.jpeg
    assert format_from_extension("webp") == ImageFormat.webp
    assert format_from_extension("bogus") is None


# -- DiskCache ---------------------------------------------------------------


def test_disk_cache_roundtrip(tmp_path):
    cache = DiskCache(tmp_path)
    key = cache.key_for({"url": "u", "w": "100"})
    assert run(cache.get(key)) is None  # miss before put
    run(cache.put(key, b"payload", ImageFormat.webp, "url=u&w=100"))
    assert run(cache.get(key)) == b"payload"  # the reference's get/put
    # mismatch (SURVEY.md §2.4.1) is fixed: hits actually happen
    # on-disk name keeps the reference's <key>.<ext> layout
    assert (tmp_path / f"{key}.webp").is_file()


def test_disk_cache_reads_reference_layout(tmp_path):
    # files stored at bare <key> (the reference get() path) are also found
    cache = DiskCache(tmp_path)
    (tmp_path / "somekey").write_bytes(b"old-layout")
    assert run(cache.get("somekey")) == b"old-layout"


def test_disk_cache_get_with_format(tmp_path):
    cache = DiskCache(tmp_path)
    run(cache.put("k1", b"x", ImageFormat.jpeg, ""))
    data, fmt = run(cache.get_with_format("k1"))
    assert data == b"x" and fmt == ImageFormat.jpeg


def test_disk_cache_content_type_for_path(tmp_path):
    cache = DiskCache(tmp_path)
    assert cache.content_type_for_path(tmp_path / "a.webp") == "image/webp"
    assert cache.content_type_for_path(tmp_path / "a.unknown") is None


# -- KVCache (SledCache equivalent) -------------------------------------------


def test_kv_cache_roundtrip_and_stats(tmp_path):
    cache = KVCache(tmp_path, max_size=10_000)
    run(cache.put("k", b"abc", ImageFormat.webp, "p"))
    assert run(cache.get("k")) == b"abc"
    stats = run(cache.stats())
    assert stats.entry_count == 1
    assert stats.total_size_bytes == 3
    assert stats.max_size_bytes == 10_000
    cache.close()


def test_kv_cache_lru_eviction(tmp_path):
    cache = KVCache(tmp_path, max_size=1000)
    # Fill beyond the limit; older (least recently accessed) entries evict
    # down to 90% of max (src/cache/sled_cache.rs:92-148).
    import time

    for i in range(5):
        run(cache.put(f"k{i}", bytes(300), ImageFormat.webp, ""))
        time.sleep(0.01)
    stats = run(cache.stats())
    assert stats.total_size_bytes <= 900
    # the most recent entry survives
    assert run(cache.get("k4")) == bytes(300)
    cache.close()


def test_kv_cache_miss(tmp_path):
    cache = KVCache(tmp_path)
    assert run(cache.get("nope")) is None
    cache.close()


# -- Cloudflare headers (parity with src/cache/cloudflare.rs:176-218) ---------


def test_default_cache_control():
    v = CloudflareCacheConfig.for_images().cache_control_value()
    assert "public" in v
    assert "max-age=31536000" in v
    assert "s-maxage=86400" in v
    assert "immutable" in v
    assert "stale-if-error=86400" in v
    assert "stale-while-revalidate=60" in v


def test_no_cache():
    v = CloudflareCacheConfig.no_cache().cache_control_value()
    assert v == "no-store, no-cache, must-revalidate"


def test_dynamic_cache():
    v = CloudflareCacheConfig.for_dynamic(3600).cache_control_value()
    assert "max-age=3600" in v
    assert "s-maxage=3600" in v
    assert "immutable" not in v


def test_cdn_cache_control():
    assert CloudflareCacheConfig.for_images().cdn_cache_control_value() == "max-age=86400"
    assert CloudflareCacheConfig.no_cache().cdn_cache_control_value() == "no-store"


def test_middleware_only_on_success():
    assert cloudflare_cache_headers(200) != {}
    assert cloudflare_cache_headers(404) == {}
    assert cloudflare_cache_headers(500) == {}
    h = cloudflare_cache_headers(200)
    assert h["Vary"] == "Accept-Encoding"
    assert h["CDN-Cache-Control"] == "max-age=86400"
