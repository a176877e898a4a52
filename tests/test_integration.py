"""In-process HTTP API tests.

Mirrors the reference's ``tests/integration.rs`` (driven in-process with no
socket there; here via aiohttp's TestClient) plus the fetch/transform paths
the reference couldn't test offline — using an offline fetcher, per the
reference test strategy of never reaching the network (SURVEY.md §4).
"""

import asyncio
import io
import json
from typing import Dict, Optional, Tuple

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from imagekit_tpu.cache import key_for_params
from imagekit_tpu.config import ImageFormat, ImageKitConfig
from imagekit_tpu.fetch import Fetcher, _BodyStream
from imagekit_tpu.serving.app import create_app
from imagekit_tpu.serving.metrics import Metrics
from imagekit_tpu.signature import sign
from tests.conftest import encode_jpeg_pil, make_test_image


class FakeBody(_BodyStream):
    def __init__(self, data: bytes, content_length: Optional[int] = None):
        self._data = data
        self._clen = content_length

    async def content_length(self):
        return self._clen

    async def chunks(self):
        for i in range(0, len(self._data), 8192):
            yield self._data[i : i + 8192]


class OfflineFetcher(Fetcher):
    """Serves canned bodies keyed by URL; no network."""

    def __init__(self, responses: Dict[str, Tuple[int, str, bytes]]):
        super().__init__()
        self.responses = responses
        self.calls = []

    async def fetch(self, url: str):
        self.calls.append(url)
        status, ct, data = self.responses.get(url, (404, "text/plain", b"nope"))
        return status, ct, FakeBody(data, len(data))

    async def close(self):
        pass


SECRET = "test-secret-key"
IMG_URL = "https://example.com/test.jpg"


def make_client(tmp_path, responses=None, **kwargs):
    cfg = ImageKitConfig(secret=SECRET, cache_dir=tmp_path / "cache")
    metrics = Metrics()
    fetcher = OfflineFetcher(responses or {})
    app = create_app(
        cfg, fetcher=fetcher, metrics=metrics, rate_limit=False, **kwargs
    )
    return app, fetcher, metrics


def run_with_client(tmp_path, fn, responses=None, **kwargs):
    async def inner():
        app, fetcher, metrics = make_client(tmp_path, responses, **kwargs)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await fn(client, fetcher, metrics)
        finally:
            await client.close()

    return asyncio.run(inner())


def signed_url(params: dict) -> str:
    smap = {k: str(v) for k, v in params.items()}
    sig = sign(smap, SECRET)
    qs = "&".join(f"{k}={v}" for k, v in smap.items())
    return f"/img?{qs}&sig={sig}"


# -- /sign (tests/integration.rs:40-68) ---------------------------------------


def test_sign_endpoint(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get(
            "/sign", params={"url": IMG_URL, "w": "400", "f": "webp", "q": "80"}
        )
        assert resp.status == 200
        body = await resp.json()
        assert set(body) == {"canonical", "sig", "signed_url"}
        assert body["canonical"] == f"f=webp&q=80&url={IMG_URL}&w=400"
        assert body["signed_url"] == f"/img?{body['canonical']}&sig={body['sig']}"
        assert len(body["sig"]) == 64

    run_with_client(tmp_path, fn)


def test_sign_matches_library_sign(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get("/sign", params={"url": IMG_URL, "w": "100"})
        body = await resp.json()
        assert body["sig"] == sign({"url": IMG_URL, "w": "100"}, SECRET)

    run_with_client(tmp_path, fn)


# -- /img error paths (tests/integration.rs:71-151) ----------------------------


def test_img_without_signature_400(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get("/img", params={"url": IMG_URL})
        assert resp.status == 400  # serde deser failure parity

    run_with_client(tmp_path, fn)


def test_img_invalid_signature_401(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get("/img", params={"url": IMG_URL, "sig": "invalid"})
        assert resp.status == 401
        assert "invalid signature" in await resp.text()

    run_with_client(tmp_path, fn)


def test_img_expired_signature_410(tmp_path):
    async def fn(client, fetcher, metrics):
        params = {"url": IMG_URL, "t": "1000000000"}
        sig = sign(params, SECRET)
        resp = await client.get(
            "/img", params={"url": IMG_URL, "t": "1000000000", "sig": sig}
        )
        assert resp.status == 410

    run_with_client(tmp_path, fn)


def test_img_invalid_quality_400(tmp_path):
    async def fn(client, fetcher, metrics):
        params = {"url": IMG_URL, "q": "150"}
        sig = sign(params, SECRET)
        resp = await client.get(
            "/img", params={"url": IMG_URL, "q": "150", "sig": sig}
        )
        assert resp.status == 400
        assert await resp.text() == "Invalid quality"

    run_with_client(tmp_path, fn)


def test_img_q_zero_400(tmp_path):
    async def fn(client, fetcher, metrics):
        params = {"url": IMG_URL, "q": "0"}
        sig = sign(params, SECRET)
        resp = await client.get("/img", params={"url": IMG_URL, "q": "0", "sig": sig})
        assert resp.status == 400

    run_with_client(tmp_path, fn)


def test_img_bad_format_400(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get(
            "/img", params={"url": IMG_URL, "f": "gif", "sig": "x"}
        )
        assert resp.status == 400  # serde would reject unknown enum variant

    run_with_client(tmp_path, fn)


def test_img_fetch_error_400(tmp_path):
    async def fn(client, fetcher, metrics):
        params = {"url": "https://example.com/missing.jpg"}
        resp = await client.get(
            "/img",
            params={"url": params["url"], "sig": sign(params, SECRET)},
        )
        assert resp.status == 400
        assert "Upstream status" in await resp.text()

    run_with_client(tmp_path, fn)


# -- /img success + cache flow --------------------------------------------------


def _jpeg_fixture():
    return encode_jpeg_pil(make_test_image(640, 480), 90)


def test_img_full_transform_flow(tmp_path):
    src = _jpeg_fixture()

    async def fn(client, fetcher, metrics):
        url = signed_url({"url": IMG_URL, "w": 200, "f": "webp", "q": 80})
        resp = await client.get(url)
        assert resp.status == 200
        body = await resp.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WEBP"
        assert resp.headers["Content-Type"] == "image/webp"
        # middleware rewrites Cache-Control on 2xx (SURVEY.md §2.4.3)
        cc = resp.headers["Cache-Control"]
        assert "max-age=31536000" in cc and "s-maxage=86400" in cc
        assert resp.headers["CDN-Cache-Control"] == "max-age=86400"
        assert resp.headers["Vary"] == "Accept-Encoding"
        # ETag is the quoted SHA-256 key of the sig-free canonical map
        expected_key = key_for_params(
            {"url": IMG_URL, "w": "200", "f": "webp", "q": "80"}
        )
        assert resp.headers["ETag"] == f'"{expected_key}"'

        # second request: served from cache, no second fetch
        n_calls = len(fetcher.calls)
        resp2 = await client.get(url)
        assert resp2.status == 200
        assert await resp2.read() == body
        assert len(fetcher.calls) == n_calls  # cache hit -> no fetch
        assert metrics.cache_hits == 1 and metrics.cache_misses == 1

        # conditional revalidation (ledger improvement: the reference
        # emits ETags but never answers 304)
        etag = resp2.headers["ETag"]
        resp3 = await client.get(url, headers={"If-None-Match": etag})
        assert resp3.status == 304
        assert await resp3.read() == b""
        assert resp3.headers["ETag"] == etag
        # weak validator + list forms also match; mismatch serves the body
        resp4 = await client.get(
            url, headers={"If-None-Match": f'W/"bogus", {etag}'}
        )
        assert resp4.status == 304
        resp5 = await client.get(url, headers={"If-None-Match": '"bogus"'})
        assert resp5.status == 200
        assert await resp5.read() == body
        resp6 = await client.get(url, headers={"If-None-Match": "*"})
        assert resp6.status == 304

    run_with_client(tmp_path, fn, responses={IMG_URL: (200, "image/jpeg", src)})


def test_img_default_format_webp(tmp_path):
    src = _jpeg_fixture()

    async def fn(client, fetcher, metrics):
        resp = await client.get(signed_url({"url": IMG_URL, "w": 100}))
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/webp"

    run_with_client(tmp_path, fn, responses={IMG_URL: (200, "image/jpeg", src)})


def test_img_rejects_non_image_content_type(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get(signed_url({"url": IMG_URL}))
        assert resp.status == 400
        assert "not an image" in await resp.text()

    run_with_client(
        tmp_path, fn, responses={IMG_URL: (200, "text/html", b"<html></html>")}
    )


def test_img_rejects_oversized_body(tmp_path):
    big = b"\xff" * (9 * 1024 * 1024)

    async def fn(client, fetcher, metrics):
        resp = await client.get(signed_url({"url": IMG_URL}))
        assert resp.status == 400
        assert "size limit" in await resp.text()

    run_with_client(tmp_path, fn, responses={IMG_URL: (200, "image/jpeg", big)})


def test_img_rejects_undecodable_image(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get(signed_url({"url": IMG_URL}))
        assert resp.status == 400
        assert "decode" in (await resp.text()).lower()

    run_with_client(
        tmp_path, fn, responses={IMG_URL: (200, "image/jpeg", b"\x00" * 100)}
    )


# -- /upload -------------------------------------------------------------------


def test_upload_flow(tmp_path):
    src = _jpeg_fixture()

    async def fn(client, fetcher, metrics):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", src, filename="t.jpg", content_type="image/jpeg")
        form.add_field("w", "128")
        form.add_field("f", "jpeg")
        form.add_field("q", "85")
        resp = await client.post("/upload", data=form)
        assert resp.status == 200
        body = await resp.read()
        assert body[:2] == b"\xff\xd8"
        assert resp.headers["Content-Type"] == "image/jpeg"
        # middleware overwrote no-store on 2xx — reference quirk parity
        assert "max-age=31536000" in resp.headers["Cache-Control"]

    run_with_client(tmp_path, fn)


def test_upload_missing_file_400(tmp_path):
    async def fn(client, fetcher, metrics):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("w", "128", content_type="text/plain")  # force multipart
        resp = await client.post("/upload", data=form)
        assert resp.status == 400
        assert await resp.text() == "Missing file"

    run_with_client(tmp_path, fn)


def test_upload_oversized_413(tmp_path):
    async def fn(client, fetcher, metrics):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", b"\x00" * (9 * 1024 * 1024), filename="big.bin")
        resp = await client.post("/upload", data=form)
        assert resp.status == 413

    run_with_client(tmp_path, fn)


def test_upload_garbage_400(tmp_path):
    async def fn(client, fetcher, metrics):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", b"not an image at all", filename="x.bin")
        resp = await client.post("/upload", data=form)
        assert resp.status == 400
        assert "Decode error" in await resp.text()

    run_with_client(tmp_path, fn)


# -- observability ----------------------------------------------------------------


def test_health(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get("/health")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "healthy"
        assert body["service"] == "imagekit"
        assert "version" in body
        # observability routes get no cache middleware headers
        assert "CDN-Cache-Control" not in resp.headers

    run_with_client(tmp_path, fn)


def test_metrics_prometheus_text(tmp_path):
    src = _jpeg_fixture()

    async def fn(client, fetcher, metrics):
        await client.get(signed_url({"url": IMG_URL, "w": 64}))
        resp = await client.get("/metrics")
        assert resp.status == 200
        text = await resp.text()
        assert "imagekit_cache_hits_total 0" in text
        assert "imagekit_cache_misses_total 1" in text
        assert "imagekit_transforms_total 1" in text
        assert "# TYPE imagekit_errors_total counter" in text

    run_with_client(tmp_path, fn, responses={IMG_URL: (200, "image/jpeg", src)})


def test_stats_cache_json_shape(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get("/stats/cache")
        assert resp.status == 200
        body = await resp.json()
        assert set(body) == {"cache", "requests", "transforms"}
        assert set(body["cache"]) == {
            "total_size_bytes",
            "total_size_mb",
            "entry_count",
            "max_size_bytes",
            "max_size_mb",
            "usage_percent",
        }
        assert body["requests"]["hit_rate_percent"] == 0.0

    run_with_client(tmp_path, fn)


# -- rate limiting -----------------------------------------------------------------


def test_rate_limit_429(tmp_path):
    async def fn(client, fetcher, metrics):
        statuses = []
        for _ in range(40):
            resp = await client.get("/sign", params={"url": IMG_URL})
            statuses.append(resp.status)
        assert 429 in statuses  # burst of 30 exhausted
        assert statuses[0] == 200
        # observability routes are never limited (src/lib.rs:435-439)
        for _ in range(5):
            r = await client.get("/health")
            assert r.status == 200

    async def inner():
        cfg = ImageKitConfig(secret=SECRET, cache_dir=tmp_path / "cache")
        app = create_app(
            cfg, fetcher=OfflineFetcher({}), metrics=Metrics(), rate_limit=True
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await fn(client, None, None)
        finally:
            await client.close()

    asyncio.run(inner())


def test_rate_limit_headers_present(tmp_path):
    async def inner():
        cfg = ImageKitConfig(secret=SECRET, cache_dir=tmp_path / "cache")
        app = create_app(
            cfg, fetcher=OfflineFetcher({}), metrics=Metrics(), rate_limit=True
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.get("/sign", params={"url": IMG_URL})
            assert resp.status == 200
            assert "x-ratelimit-limit" in resp.headers
        finally:
            await client.close()

    asyncio.run(inner())


def test_kv_cache_backend_serves_hits(tmp_path):
    """cache_backend='kv' wires the SledCache-equivalent into the live
    /img path (unlike the reference, where it is orphaned)."""
    src = _jpeg_fixture()

    async def inner():
        cfg = ImageKitConfig(
            secret=SECRET, cache_dir=tmp_path / "kvcache", cache_backend="kv"
        )
        metrics = Metrics()
        fetcher = OfflineFetcher({IMG_URL: (200, "image/jpeg", src)})
        app = create_app(cfg, fetcher=fetcher, metrics=metrics, rate_limit=False)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            url = signed_url({"url": IMG_URL, "w": 120, "f": "webp", "q": 80})
            r1 = await client.get(url)
            assert r1.status == 200
            body1 = await r1.read()
            n = len(fetcher.calls)
            r2 = await client.get(url)
            assert await r2.read() == body1
            assert len(fetcher.calls) == n  # served from the KV cache
            assert metrics.cache_hits == 1
            # stats reflect the stored entry
            stats = await client.get("/stats/cache")
            body = await stats.json()
            assert body["cache"]["entry_count"] >= 1
        finally:
            await client.close()

    asyncio.run(inner())


# -- strict query parsing (ADVICE.md r1: serde u32/u8/i64 strictness) ----------


def test_malformed_numeric_queries_rejected(tmp_path):
    async def fn(client, fetcher, metrics):
        # serde's u32 deserializer rejects '+', whitespace, and '_' — so do we
        for bad_w in ("+5", " 5", "5 ", "1_0", "0x10", ""):
            resp = await client.get(
                "/sign", params={"url": IMG_URL, "w": bad_w}
            )
            assert resp.status == 400, bad_w
        for bad_q in ("+80", "8_0"):
            resp = await client.get(
                "/sign", params={"url": IMG_URL, "q": bad_q}
            )
            assert resp.status == 400, bad_q
        for bad_t in ("+1", "1_0"):
            resp = await client.get(
                "/sign", params={"url": IMG_URL, "t": bad_t}
            )
            assert resp.status == 400, bad_t
        # negative t remains valid i64 (absolute unix timestamp semantics)
        resp = await client.get("/sign", params={"url": IMG_URL, "t": "-1"})
        assert resp.status == 200

    run_with_client(tmp_path, fn)


# -- rate limiter keying (ADVICE.md r1: XFF spoofing) ---------------------------


def test_rate_limit_ignores_xff_by_default(tmp_path):
    """Without trust_proxy, rotating X-Forwarded-For must NOT reset the
    limiter: all requests come from the same peer IP."""

    async def inner():
        cfg = ImageKitConfig(secret=SECRET, cache_dir=tmp_path / "cache")
        app = create_app(
            cfg, fetcher=OfflineFetcher({}), metrics=Metrics(), rate_limit=True
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            statuses = []
            for i in range(40):
                resp = await client.get(
                    "/sign",
                    params={"url": IMG_URL},
                    headers={"X-Forwarded-For": f"10.0.0.{i}"},
                )
                statuses.append(resp.status)
            assert 429 in statuses
        finally:
            await client.close()

    asyncio.run(inner())


def test_rate_limit_honours_xff_behind_trusted_proxy(tmp_path):
    async def inner():
        cfg = ImageKitConfig(
            secret=SECRET, cache_dir=tmp_path / "cache", trust_proxy=True
        )
        app = create_app(
            cfg, fetcher=OfflineFetcher({}), metrics=Metrics(), rate_limit=True
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            statuses = []
            for i in range(40):
                resp = await client.get(
                    "/sign",
                    params={"url": IMG_URL},
                    headers={"X-Forwarded-For": f"10.0.0.{i}"},
                )
                statuses.append(resp.status)
            # distinct forwarded clients each get their own bucket
            assert 429 not in statuses
        finally:
            await client.close()

    asyncio.run(inner())


def test_cache_hit_serves_stored_format(tmp_path):
    """A hit written under one default format must be served with the
    STORED Content-Type even if the instance default changed (VERDICT r1):
    the canonical key omits `f` when absent, so the bytes are webp."""
    import numpy as np
    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.fromarray(
        np.zeros((64, 64, 3), np.uint8)
    ).save(buf, "JPEG", quality=90)
    src = buf.getvalue()

    async def fn(client, fetcher, metrics):
        url = signed_url({"url": IMG_URL, "w": 32})
        r1 = await client.get(url)
        assert r1.status == 200
        assert r1.headers["Content-Type"] == "image/webp"

    run_with_client(
        tmp_path, fn, responses={IMG_URL: (200, "image/jpeg", src)}
    )

    # same cache dir, default format now jpeg: the stored webp entry hits
    async def inner():
        cfg = ImageKitConfig(
            secret=SECRET,
            cache_dir=tmp_path / "cache",
            default_format=ImageFormat.jpeg,
        )
        app = create_app(
            cfg,
            fetcher=OfflineFetcher({IMG_URL: (200, "image/jpeg", src)}),
            metrics=Metrics(),
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            url = signed_url({"url": IMG_URL, "w": 32})
            r2 = await client.get(url)
            assert r2.status == 200
            body = await r2.read()
            assert body[:4] == b"RIFF"  # the stored webp bytes
            assert r2.headers["Content-Type"] == "image/webp"
        finally:
            await client.close()

    asyncio.run(inner())


def test_upload_jpeg_takes_coefficient_path(tmp_path):
    """A baseline JPEG upload must route through engine.transform's native
    coefficient path like /img does (VERDICT r1 missing #4)."""
    import numpy as np
    from PIL import Image as PILImage

    pytest_mod = pytest.importorskip("imagekit_tpu.codecs.jpeg")
    if not pytest_mod.available():
        pytest.skip("native codec unavailable")

    buf = io.BytesIO()
    rng = np.random.default_rng(0)
    PILImage.fromarray(
        rng.integers(0, 255, (480, 640, 3), np.uint8)
    ).save(buf, "JPEG", quality=88)
    src = buf.getvalue()

    async def fn(client, fetcher, metrics):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", src, filename="x.jpg")
        form.add_field("w", "200")
        resp = await client.post("/upload", data=form)
        assert resp.status == 200
        # the native path's fingerprint: host entropy decode stage ran
        assert metrics.stage_seconds.get("entropy_decode", 0.0) > 0.0

    run_with_client(tmp_path, fn)


def test_stats_pipelines(tmp_path):
    async def fn(client, fetcher, metrics):
        resp = await client.get("/stats/pipelines")
        assert resp.status == 200
        body = await resp.json()
        assert set(body) == {"jpeg", "webp", "avif"}
        assert body["jpeg"]["device_encode"] is True
        assert "host_entropy_decode" in body["jpeg"]["decode_stages"]

    run_with_client(tmp_path, fn)


def test_max_compiled_shapes_env_knob(monkeypatch):
    """IMAGEKIT_MAX_COMPILED_SHAPES caps runtime executable retention
    (each compiled shape holds ~65 MB of host memory for the process
    lifetime; verified bounded by an all-miss soak at budget 4)."""
    from imagekit_tpu.config import ImageKitConfig

    monkeypatch.setenv("IMAGEKIT_MAX_COMPILED_SHAPES", "4")
    assert ImageKitConfig.from_env().batch.max_compiled_shapes == 4
    monkeypatch.delenv("IMAGEKIT_MAX_COMPILED_SHAPES")
    assert ImageKitConfig.from_env().batch.max_compiled_shapes == 32
