"""Remote-fetch validation tests — the 6-stage defense-in-depth contract
(``src/fetch.rs:38-124``), driven with the offline fetcher."""

import asyncio

import numpy as np
import pytest

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.errors import InvalidArgumentError, NetworkError
from imagekit_tpu.fetch import fetch_source
from tests.conftest import encode_jpeg_pil, encode_png, make_test_image
from tests.test_integration import FakeBody, OfflineFetcher

FORMATS = (ImageFormat.jpeg, ImageFormat.webp, ImageFormat.avif)


def fetch(url, responses, max_size=8 * 1024 * 1024):
    fetcher = OfflineFetcher(responses)
    return asyncio.run(fetch_source(url, max_size, FORMATS, fetcher=fetcher))


def test_success_returns_bytes_ct_and_pixels():
    img = make_test_image(64, 48)
    data = encode_jpeg_pil(img)
    out_bytes, ct, pixels = fetch(
        "u", {"u": (200, "image/jpeg", data)}
    )
    assert out_bytes == data
    assert ct == "image/jpeg"
    # baseline JPEG with the native codec: header-only validation, pixels
    # deferred to the engine's batched coefficient path
    from imagekit_tpu.codecs.native import loader

    if loader.load() is not None:
        assert pixels is None
    else:
        assert pixels.shape == (48, 64, 3)


def test_success_non_jpeg_returns_pixels():
    img = make_test_image(64, 48)
    data = encode_png(img)
    out_bytes, ct, pixels = fetch("u", {"u": (200, "image/png", data)})
    assert out_bytes == data
    assert pixels.shape == (48, 64, 3)  # single decode, reused by handler


def test_stage1_non_2xx_rejected():
    with pytest.raises(NetworkError, match="Upstream status: 404"):
        fetch("u", {"u": (404, "image/jpeg", b"x")})
    with pytest.raises(NetworkError, match="Upstream status: 500"):
        fetch("u", {"u": (500, "image/jpeg", b"x")})


def test_stage2_non_image_content_type_rejected():
    with pytest.raises(InvalidArgumentError, match="not an image"):
        fetch("u", {"u": (200, "text/html", b"<html>")})


def test_stage2_unparseable_content_type_continues_to_decode():
    # unknown MIME types continue and are validated by decode
    # (src/fetch.rs:65-72)
    img = make_test_image(32, 32)
    data = encode_png(img)
    out_bytes, ct, _ = fetch("u", {"u": (200, "", data)})
    assert out_bytes == data


def test_stage3_content_length_preflight():
    class PreflightFetcher(OfflineFetcher):
        async def fetch(self, url):
            # lie about length being huge; body small
            return 200, "image/jpeg", FakeBody(b"x" * 10, 100 * 1024 * 1024)

    with pytest.raises(InvalidArgumentError, match="size limit"):
        asyncio.run(
            fetch_source("u", 8 * 1024 * 1024, FORMATS, fetcher=PreflightFetcher({}))
        )


def test_stage4_streaming_enforcement_beats_header_spoofing():
    class SpoofFetcher(OfflineFetcher):
        async def fetch(self, url):
            # claims tiny, streams big (src/fetch.rs:84-99)
            return 200, "image/jpeg", FakeBody(b"\xff" * (2 * 1024 * 1024), 10)

    with pytest.raises(InvalidArgumentError, match="size limit"):
        asyncio.run(fetch_source("u", 1024 * 1024, FORMATS, fetcher=SpoofFetcher({})))


def test_stage5_undecodable_rejected():
    with pytest.raises(InvalidArgumentError, match="decode"):
        fetch("u", {"u": (200, "image/jpeg", b"\x00" * 1000)})


def test_png_source_accepted():
    # allowed_formats is accepted-but-unused, matching the reference
    # (src/fetch.rs:41; SURVEY.md §2.4.7): PNG decodes fine
    img = make_test_image(20, 20)
    out_bytes, _, pixels = fetch("u", {"u": (200, "image/png", encode_png(img))})
    np.testing.assert_array_equal(pixels, img)


@pytest.mark.parametrize(
    "fmt,kw",
    [("WEBP", {"quality": 80}), ("WEBP", {"lossless": True}),
     ("AVIF", {"quality": 80})],
)
def test_webp_avif_header_only_validation(fmt, kw):
    """WebP and AVIF sources validate by header parse and return
    pixels=None, so the /img handler's engine.transform(bytes) path
    decodes once on the native YUV-domain route (the JPEG pattern)."""
    import io

    from PIL import Image

    img = np.zeros((48, 96, 3), np.uint8)
    img[:, :, 1] = 190
    buf = io.BytesIO()
    try:
        Image.fromarray(img).save(buf, fmt, **kw)
    except Exception:
        pytest.skip(f"{fmt} encode unavailable")
    out_bytes, ct, pixels = fetch(
        "u", {"u": (200, "image/webp", buf.getvalue())}
    )
    assert out_bytes == buf.getvalue()
    assert pixels is None, (fmt, kw)
