"""AVIF encode via the direct libavif ctypes ABI (codecs/avif_encode.py).

The reference's AVIF output arm (``src/transform.rs:138-146``: ravif at
quality q) is served here by libavif fed device-layout YUV 4:2:0 planes
directly — these tests pin the ABI self-check, the quality mapping, the
alpha policy, and the serving integration (avif outputs riding the fused
YUV heads with no RGB round trip).
"""

import asyncio
import io

import numpy as np
import pytest
from PIL import Image

from tests.conftest import make_test_image, psnr

avif_encode = pytest.importorskip("imagekit_tpu.codecs.avif_encode")

pytestmark = pytest.mark.skipif(
    not avif_encode.available(),
    reason="libavif encode ABI unavailable (self-check failed)",
)


def _planes(w, h, seed=5):
    rng = np.random.default_rng(seed)
    x = np.linspace(30, 220, w, dtype=np.float32)[None, :]
    y = (x + rng.normal(0, 4, (h, w))).clip(16, 235).astype(np.uint8)
    cb = np.full(((h + 1) // 2, (w + 1) // 2), 110, np.uint8)
    cr = np.full(((h + 1) // 2, (w + 1) // 2), 140, np.uint8)
    return y, cb, cr


def test_roundtrip_through_own_decoder():
    """Encode -> this codebase's native container parse + dav1d decode:
    dims exact, content near-identical at high quality."""
    from imagekit_tpu.codecs import avif_native

    if not avif_native.decode_available():
        pytest.skip("dav1d unavailable")
    y, cb, cr = _planes(120, 86)
    data = avif_encode.encode_yuv420_studio(y, cb, cr, 95)
    info = avif_native.parse_container(data)
    assert (info.width, info.height) == (120, 86)
    assert info.has_nclx and info.matrix == 6 and not info.full_range
    assert not info.has_alpha
    out = avif_native.decode_yuv420_studio(data)
    assert out is not None
    y2, cb2, cr2 = out
    assert y2.shape == y.shape and cb2.shape == cb.shape
    assert psnr(y, y2) >= 40.0


def test_quality_monotonic_and_mapping():
    y, cb, cr = _planes(200, 150)
    sizes = [
        len(avif_encode.encode_yuv420_studio(y, cb, cr, q))
        for q in (20, 50, 80)
    ]
    assert sizes[0] < sizes[1] < sizes[2]
    # the linear quality->quantizer map (modern libavif's quality knob)
    assert avif_encode.quality_to_quantizer(100) == 0
    assert avif_encode.quality_to_quantizer(80) == 13
    assert avif_encode.quality_to_quantizer(50) == 32
    assert avif_encode.quality_to_quantizer(1) == 62
    assert avif_encode.quality_to_quantizer(-5) == 62  # clamps


def test_geometry_validation():
    y, cb, cr = _planes(64, 48)
    with pytest.raises(ValueError):
        avif_encode.encode_yuv420_studio(y, cb[:-1], cr, 80)
    with pytest.raises(ValueError):
        avif_encode.encode_yuv420_studio(
            y.astype(np.int16), cb, cr, 80
        )


def test_odd_dimensions():
    y, cb, cr = _planes(101, 77)
    data = avif_encode.encode_yuv420_studio(y, cb, cr, 80)
    im = Image.open(io.BytesIO(data))
    im.load()
    assert im.size == (101, 77)


def test_opaque_alpha_dropped_real_alpha_kept():
    """Ledger'd deliberate fix: fully-opaque sources encode without an
    alpha plane (reference pads to RGBA and always carries one); real
    alpha is preserved near-losslessly."""
    img = make_test_image(90, 70)
    rgba_opaque = np.dstack([img, np.full((70, 90), 255, np.uint8)])
    d1 = avif_encode.encode_rgb(rgba_opaque, 75)
    im1 = Image.open(io.BytesIO(d1))
    im1.load()
    assert im1.mode == "RGB"

    alpha = np.tile(
        np.linspace(0, 255, 90, dtype=np.uint8)[None, :], (70, 1)
    )
    rgba = np.dstack([img, alpha])
    d2 = avif_encode.encode_rgb(rgba, 75)
    im2 = Image.open(io.BytesIO(d2))
    im2.load()
    assert im2.mode == "RGBA"
    a_dec = np.asarray(im2)[:, :, 3]
    assert psnr(alpha, a_dec) >= 45.0


def test_rgb_content_matches_source():
    img = make_test_image(160, 120)
    data = avif_encode.encode_rgb(img, 90)
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # 4:2:0 chroma subsampling bounds PSNR on this sharp synthetic
    # gradient (the reference's AVIF arm subsamples identically)
    assert psnr(img, dec) >= 27.0


def test_backend_encode_routes_native(monkeypatch):
    """The generic encode hand-off (transform.encode_image -> codecs)
    goes through the direct ABI; a disabled ABI falls back to the host
    library (same bytes contract)."""
    from imagekit_tpu.transform import encode_image
    from imagekit_tpu.config import ImageFormat

    img = make_test_image(80, 60)
    d_native = encode_image(img, ImageFormat.avif, 70)
    assert d_native[4:12] == b"ftypavif"

    monkeypatch.setattr(avif_encode, "available", lambda: False)
    try:
        d_host = encode_image(img, ImageFormat.avif, 70)
    except Exception:
        pytest.skip("host PIL AVIF encoder unavailable")
    assert d_host[4:12] == b"ftypavif"
    dec_n = np.asarray(Image.open(io.BytesIO(d_native)).convert("RGB"))
    dec_h = np.asarray(Image.open(io.BytesIO(d_host)).convert("RGB"))
    assert psnr(dec_n, dec_h) >= 30.0


def _compile_yuvsrc(engine, bh, bw, obh, obw):
    from imagekit_tpu.ops.dct import pad128, resize_yuv420_batch

    ny, nc = bh * bw, (bh // 2) * (bw // 2)
    flat = np.zeros((1, pad128(ny + 2 * nc)), np.uint8)
    wv = np.zeros((engine.MAX_UNIQUE, obh, bh), np.float32)
    wh = np.zeros((engine.MAX_UNIQUE, obw, bw), np.float32)
    wvc = np.zeros((engine.MAX_UNIQUE, obh // 2, bh // 2), np.float32)
    whc = np.zeros((engine.MAX_UNIQUE, obw // 2, bw // 2), np.float32)
    resize_yuv420_batch(
        flat, (wv, wh, wvc, whc), np.zeros(1, np.int32),
        (bh, bw), (obh, obw),
    )
    engine._compiled.add(
        ("yuvsrc", False, 1, bh, bw, obh, obw, 2, 2, False, False)
    )


def test_engine_webp_to_avif_yuv_direct():
    """WebP source -> avif output rides the YUV-domain batched resize:
    no host fallback after the signature is warm, no RGB anywhere, and
    the result matches the golden pipeline."""
    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    if not vp8_native.decode_available():
        pytest.skip("native VP8 decoder unavailable")

    img = make_test_image(640, 480)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=92)
    data = buf.getvalue()

    engine = make_engine()

    async def run():
        _compile_yuvsrc(
            engine, bucket_for(480), bucket_for(640),
            bucket_for(240), bucket_for(320),
        )
        out = await engine.transform(data, 320, None, ImageFormat.avif, 80)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert engine.metrics.stage_seconds.get("vp8_decode", 0) > 0
    assert out[4:12] == b"ftypavif"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (240, 320, 3)
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0


def test_engine_avif_to_avif_yuv_direct():
    """AVIF -> AVIF re-encode rides native decode + YUV resize + direct
    ABI encode: the full loop with zero RGB and zero host libraries
    beyond the AV1 entropy cores."""
    from imagekit_tpu.codecs import avif_native
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    if not avif_native.decode_available():
        pytest.skip("dav1d unavailable")

    img = make_test_image(640, 480)
    data = avif_encode.encode_rgb(img, 92)
    assert avif_native.decode_yuv420_studio(data) is not None

    engine = make_engine()

    async def run():
        _compile_yuvsrc(
            engine, bucket_for(480), bucket_for(640),
            bucket_for(240), bucket_for(320),
        )
        out = await engine.transform(data, 320, None, ImageFormat.avif, 80)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert engine.metrics.stage_seconds.get("avif_decode", 0) > 0
    assert out[4:12] == b"ftypavif"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (240, 320, 3)
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0


def test_engine_rgb_source_avif_rides_rgbyuv_head():
    """PNG (RGB) source -> avif output takes okind='yuv' (the fused
    resample+RGB->YUV head shared with webp outputs), not the plain RGB
    kernel."""
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    img = make_test_image(640, 480)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    data = buf.getvalue()

    engine = make_engine()
    bh, bw = bucket_for(480), bucket_for(640)
    obh, obw = bucket_for(240), bucket_for(320)
    shapes = [(1, bh, bw, obh, obw, 3)]

    async def run():
        await engine.warmup(shapes=shapes, paths=("rgb",))
        out = await engine.transform(data, 320, None, ImageFormat.avif, 80)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert ("rgbyuv", False, 1, bh, bw, obh, obw, 3) in engine._compiled
    assert out[4:12] == b"ftypavif"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (240, 320, 3)
    golden = np.asarray(
        Image.fromarray(img).resize((320, 240), Image.LANCZOS)
    )
    assert psnr(dec, golden) >= 30.0


def test_engine_jpeg_to_avif_fused_head():
    """JPEG source -> avif output rides the fused coefficients->YUV
    kernel (kind='yuv'), the same head JPEG->WebP uses."""
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    img = make_test_image(640, 480)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92)
    data = buf.getvalue()

    engine = make_engine()
    shapes = [
        (1, bucket_for(480), bucket_for(640), bucket_for(240),
         bucket_for(320), 3)
    ]

    async def run():
        await engine.warmup(shapes=shapes, paths=("jpeg",))
        out = await engine.transform(data, 320, None, ImageFormat.avif, 80)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert engine.metrics.stage_seconds.get("entropy_decode", 0) > 0
    assert out[4:12] == b"ftypavif"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (240, 320, 3)
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 28.0


def test_disabled_abi_falls_back_in_engine(monkeypatch):
    """With the ABI disabled the engine still serves avif outputs (host
    library via the generic path) — fallback-not-error."""
    from imagekit_tpu.config import ImageFormat
    from tests.test_batcher import make_engine

    monkeypatch.setattr(avif_encode, "available", lambda: False)
    img = make_test_image(320, 240)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    data = buf.getvalue()

    engine = make_engine()

    async def run():
        out = await engine.transform(data, 160, None, ImageFormat.avif, 80)
        await engine.close()
        return out

    try:
        out = asyncio.run(run())
    except Exception:
        pytest.skip("host PIL AVIF encoder unavailable")
    assert out[4:12] == b"ftypavif"


def test_y400_fixture_entry_and_production_stays_color():
    """encode_y400_studio is the fixture/diagnostic entry for the TRUE
    monochrome source class (PIL encodes mode-L as colour). Production
    avif OUTPUT stays colour 4:2:0 even for grey pixels — reference
    parity: ravif encodes RGBA (src/transform.rs:138-146)."""
    from imagekit_tpu.codecs import avif_native

    grey = np.tile(
        np.linspace(25, 230, 64, dtype=np.uint8)[None, :], (48, 1)
    )
    mono = avif_encode.encode_y400_studio(grey, 80)
    info = avif_native.parse_container(mono)
    assert info.monochrome

    with pytest.raises(ValueError):
        avif_encode.encode_y400_studio(grey.astype(np.int16), 80)
    with pytest.raises(ValueError):
        avif_encode.encode_y400_studio(np.dstack([grey] * 3), 80)

    # production arm: grey RGB -> avif output is colour 4:2:0
    out = avif_encode.encode_rgb(np.dstack([grey] * 3), 80)
    info2 = avif_native.parse_container(out)
    assert not info2.monochrome
