"""Native AVIF path: ISOBMFF container parse + direct dav1d core.

The AV1 entropy core is the one stage still served by a system library
(docs/ROADMAP.md item 1 records why a from-scratch decoder is blocked in
this environment); these tests pin the native container layer, the
ctypes ABI guard, colour reconstruction against the host library, and
the YUV-direct serving path.
"""

import io

import numpy as np
import pytest
from PIL import Image

from tests.conftest import make_test_image, psnr

avif_native = pytest.importorskip("imagekit_tpu.codecs.avif_native")


def _avif(img, q=80, **kw):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "AVIF", quality=q, **kw)
    return buf.getvalue()


def _have_encode():
    try:
        _avif(np.zeros((16, 16, 3), np.uint8))
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not (avif_native.decode_available() and _have_encode()),
    reason="dav1d or PIL AVIF encode unavailable",
)


def test_container_parse():
    img = make_test_image(150, 98)
    data = _avif(img)
    info = avif_native.parse_container(data)
    assert (info.width, info.height) == (150, 98)
    assert not info.has_alpha
    assert len(info.obu) > 0
    # payload starts with an AV1 OBU (temporal delimiter or sequence hdr)
    assert info.obu[0] & 0x81 == 0  # forbidden bit clear, reserved clear


def test_container_parse_rejects_garbage():
    with pytest.raises(ValueError):
        avif_native.parse_container(b"\x00" * 64)
    data = _avif(make_test_image(64, 48))
    with pytest.raises(ValueError):
        avif_native.parse_container(data[: len(data) // 2])
    # mutated box sizes must raise ValueError, never IndexError etc. —
    # seeds include an ALPHA container so the aux-item/iref extraction
    # branches (round 3) face hostile bytes too
    seeds = [data]
    try:
        rgba = np.dstack(
            [make_test_image(64, 48), np.full((48, 64), 128, np.uint8)]
        )
        buf = io.BytesIO()
        Image.fromarray(rgba).save(buf, "AVIF", quality=80)
        seeds.append(buf.getvalue())
    except Exception:
        pass
    rng = np.random.default_rng(3)
    for seed in seeds:
        for _ in range(200):
            m = bytearray(seed)
            for _ in range(8):
                m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
            try:
                info = avif_native.parse_container(bytes(m))
                # survivors must also survive the decode attempt
                avif_native.decode_rgb(bytes(m))
            except ValueError:
                pass


def test_decode_rgb_matches_host_library():
    """dav1d planes + our colour reconstruction vs the host library's
    decode: same YUV data, different chroma upsampling — high PSNR."""
    img = make_test_image(320, 240)
    data = _avif(img, q=85)
    ours = avif_native.decode_rgb(data)
    assert ours is not None and ours.shape == (240, 320, 3)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(ours, ref) >= 35.0


def test_decode_yuv420_studio_reconstructs():
    """The serving planes (studio-range BT.601 4:2:0) reconstruct the
    host library's RGB after the standard studio-range conversion."""
    img = make_test_image(256, 192)
    data = _avif(img, q=85)
    planes = avif_native.decode_yuv420_studio(data)
    if planes is None:
        pytest.skip("encoder produced a non-420/601 layout")
    y, u, v = planes
    assert y.shape == (192, 256) and u.shape == (96, 128)
    yf = (y.astype(np.float32) - 16.0) * (255.0 / 219.0)
    uf = (u.astype(np.float32) - 128.0) * (255.0 / 224.0)
    vf = (v.astype(np.float32) - 128.0) * (255.0 / 224.0)
    up = np.repeat(np.repeat(uf, 2, 0), 2, 1)[:192, :256]
    vp = np.repeat(np.repeat(vf, 2, 0), 2, 1)[:192, :256]
    r = yf + 1.402 * vp
    g = yf - 0.344136 * up - 0.714136 * vp
    b = yf + 1.772 * up
    rgb = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(rgb, ref) >= 35.0


def test_decode_bytes_uses_native_path(monkeypatch):
    """codecs.decode_bytes routes AVIF through the native container+dav1d
    path; the host library is not consulted for clean 420 sources."""
    from imagekit_tpu import codecs as codecs_mod
    from imagekit_tpu.codecs import pil_backend

    called = []
    real = pil_backend.decode

    def spy(data):
        called.append(1)
        return real(data)

    monkeypatch.setattr(pil_backend, "decode", spy)
    data = _avif(make_test_image(96, 64))
    arr, fmt = codecs_mod.decode_bytes(data)
    assert fmt == codecs_mod.SourceFormat.avif
    assert arr.shape == (64, 96, 3)
    assert not called, "PIL fallback was consulted"


def test_alpha_sources_decode_natively():
    """Alpha-bearing AVIF decodes natively since round 3: the aux item's
    OBU rides the same dav1d core; the alpha plane matches the host
    library EXACTLY (no chroma/colour conversion on a mono plane) and
    the RGB channels match within the documented upsample tolerance."""
    alpha = np.tile(
        np.linspace(10, 250, 64, dtype=np.uint8)[None, :], (48, 1)
    )
    rgba = np.dstack([make_test_image(64, 48), alpha])
    try:
        buf = io.BytesIO()
        Image.fromarray(rgba).save(buf, "AVIF", quality=85)
    except Exception:
        pytest.skip("encoder lacks RGBA support")
    data = buf.getvalue()
    info = avif_native.parse_container(data)
    if not info.has_alpha:
        pytest.skip("encoder dropped the alpha item")
    assert len(info.alpha_obu) > 0
    ours = avif_native.decode_rgb(data)
    assert ours is not None and ours.shape == (48, 64, 4)
    lib = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(ours[:, :, 3], lib[:, :, 3])
    assert psnr(ours[:, :, :3], lib[:, :, :3]) >= 30.0

    from imagekit_tpu import codecs as codecs_mod

    arr, fmt = codecs_mod.decode_bytes(data)
    assert arr.shape[2] == 4
    np.testing.assert_array_equal(arr, ours)  # native path served it


class _BitW:
    def __init__(self):
        self.bits = []

    def f(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << (7 - j)
            out.append(b)
        return bytes(out)


def _synthetic_alpha_seq_obu(color_range: int) -> bytes:
    """Minimal reduced-still-picture monochrome sequence header OBU with
    the given color_range bit — the shape a limited-range alpha stream
    from a non-libavif encoder would carry."""
    w = _BitW()
    w.f(0, 3)   # seq_profile
    w.f(1, 1)   # still_picture
    w.f(1, 1)   # reduced_still_picture_header
    w.f(0, 5)   # seq_level_idx
    w.f(5, 4)   # frame_width_bits_minus_1
    w.f(5, 4)   # frame_height_bits_minus_1
    w.f(63, 6)  # max_frame_width_minus_1
    w.f(47, 6)  # max_frame_height_minus_1
    w.f(1, 1)   # use_128x128_superblock
    w.f(0, 2)   # enable_filter_intra, enable_intra_edge_filter
    w.f(0, 3)   # enable_superres, enable_cdef, enable_restoration
    w.f(0, 1)   # high_bitdepth
    w.f(1, 1)   # mono_chrome
    w.f(0, 1)   # color_description_present_flag
    w.f(color_range, 1)
    w.f(0, 7)   # padding tail (parser stops at color_range)
    payload = w.bytes()
    return bytes([0x0A, len(payload)]) + payload  # OBU_SEQUENCE_HEADER


def test_alpha_seq_header_range_parse():
    """ADVICE r3 (low): the alpha OBU's own sequence header decides the
    sample range — full-range libavif output parses True, a synthetic
    limited-range mono header parses False, garbage parses None."""
    # real libavif alpha OBU -> full range
    alpha = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :], (48, 1))
    rgba = np.dstack([make_test_image(64, 48), alpha])
    try:
        buf = io.BytesIO()
        Image.fromarray(rgba).save(buf, "AVIF", quality=85)
        info = avif_native.parse_container(buf.getvalue())
    except Exception:
        info = None
    if info is not None and info.has_alpha and info.alpha_obu:
        mono, rng = avif_native._seq_header_color_range(info.alpha_obu)
        assert rng is True
        # and the primary (colour) OBU must also be parseable
        primary = avif_native._seq_header_color_range(info.obu)
        assert primary is None or primary[0] is False
    assert avif_native._seq_header_color_range(
        _synthetic_alpha_seq_obu(1)
    ) == (True, True)
    assert avif_native._seq_header_color_range(
        _synthetic_alpha_seq_obu(0)
    ) == (True, False)
    assert avif_native._seq_header_color_range(b"") is None
    assert avif_native._seq_header_color_range(b"\x80garbage") is None


def test_limited_range_alpha_is_rescaled(monkeypatch):
    """A limited-range alpha plane must be expanded 16..235 -> 0..255
    before attachment, matching what the host library would emit."""
    alpha = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :], (48, 1))
    rgba = np.dstack([make_test_image(64, 48), alpha])
    try:
        buf = io.BytesIO()
        Image.fromarray(rgba).save(buf, "AVIF", quality=85)
    except Exception:
        pytest.skip("encoder lacks RGBA support")
    data = buf.getvalue()
    info = avif_native.parse_container(data)
    if not info.has_alpha or not info.alpha_obu:
        pytest.skip("encoder dropped the alpha item")
    full = avif_native.decode_rgb(data)
    assert full is not None and full.shape[2] == 4

    # Same file, range gate forced to "limited": plane must be remapped
    monkeypatch.setattr(
        avif_native, "_seq_header_color_range", lambda obu: (True, False)
    )
    limited = avif_native.decode_rgb(data)
    assert limited is not None
    expect = np.clip(
        np.floor((full[:, :, 3].astype(np.float32) - 16.0)
                 * (255.0 / 219.0) + 0.5),
        0, 255,
    ).astype(np.uint8)
    np.testing.assert_array_equal(limited[:, :, 3], expect)

    # unprovable range -> host-library fallback (None from native)
    monkeypatch.setattr(
        avif_native, "_seq_header_color_range", lambda obu: None
    )
    assert avif_native.decode_rgb(data) is None


def test_alpha_through_own_encoder_roundtrip():
    """Our encoder's alpha plane (near-lossless) -> native decode: the
    serving loop never touches PIL for alpha AVIF in either direction."""
    from imagekit_tpu.codecs import avif_encode

    if not avif_encode.available():
        pytest.skip("native avif encode unavailable")
    rng = np.random.default_rng(11)
    img = make_test_image(80, 60)
    alpha = rng.integers(0, 255, (60, 80), dtype=np.uint8)
    data = avif_encode.encode_rgb(np.dstack([img, alpha]), 85)
    ours = avif_native.decode_rgb(data)
    assert ours is not None and ours.shape == (60, 80, 4)
    # alpha quantiser is capped near-lossless in the encoder
    assert psnr(ours[:, :, 3], alpha) >= 40.0


def test_engine_avif_to_webp_yuv_direct():
    """AVIF source -> webp output rides the YUV-domain batched resize
    (no RGB round trip): the yuvsrc signature executes, no host fallback
    after warmup, and the output matches the golden pipeline."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    img = make_test_image(640, 480)
    data = _avif(img, q=85)
    if avif_native.decode_yuv420_studio(data) is None:
        pytest.skip("encoder produced a non-420/601 layout")

    engine = make_engine()
    shapes = [
        (1, bucket_for(480), bucket_for(640), bucket_for(240),
         bucket_for(320), 3)
    ]

    async def run():
        # compile the yuvsrc signature this request will need
        from imagekit_tpu.ops.dct import (
            combined_chroma_half_weights,
            pad128,
            resize_yuv420_batch,
        )

        bh, bw = bucket_for(480), bucket_for(640)
        obh, obw = bucket_for(240), bucket_for(320)
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
        out = await engine.transform(data, 320, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert engine.metrics.stage_seconds.get("avif_decode", 0) > 0
    assert out[:4] == b"RIFF"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (240, 320, 3)
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0


def test_unsupported_native_classes_fall_back_not_error(monkeypatch):
    """10-bit / identity-matrix / missing-nclx / decode failures must fall
    back to the host library, never surface as a decode error for a file
    the host library handles (review regression)."""
    from imagekit_tpu import codecs as codecs_mod

    data = _avif(make_test_image(96, 64))
    real_parse = avif_native.parse_container

    def patched(kind):
        def f(d):
            info = real_parse(d)
            if kind == "identity":
                info.matrix = 0
            elif kind == "nonclx":
                info.has_nclx = False
            return info

        return f

    # (high_bitdepth was an unsupported class until round 3; it now
    # decodes natively — see test_10bit_sources_decode_natively)
    for kind in ("identity", "nonclx"):
        monkeypatch.setattr(avif_native, "parse_container", patched(kind))
        assert avif_native.decode_rgb(data) is None
        assert avif_native.decode_yuv420_studio(data) is None
        arr, fmt = codecs_mod.decode_bytes(data)  # host library serves it
        assert arr.shape[:2] == (64, 96)
    monkeypatch.setattr(avif_native, "parse_container", real_parse)
    # decode-level failure (e.g. dav1d error) also falls back
    monkeypatch.setattr(avif_native, "_decode_obu", lambda *a: None)
    assert avif_native.decode_rgb(data) is None
    arr, _ = codecs_mod.decode_bytes(data)
    assert arr.shape[:2] == (64, 96)


def test_decode_yuv_studio_444_422():
    """4:4:4 and 4:2:2 sources take the YUV-direct path since round 4
    (VERDICT r3 #7), returning their true chroma geometry; 4:4:4
    reconstructs the host library's RGB with no chroma upsample error."""
    img = make_test_image(128, 96)
    data = _avif(img, q=90, subsampling="4:4:4")
    out = avif_native.decode_yuv_studio(data)
    if out is None:
        pytest.skip("encoder did not honour 4:4:4")
    y, u, v, csy, csx = out[:5]
    assert (csy, csx) == (1, 1)
    assert y.shape == u.shape == v.shape == (96, 128)
    yf = (y.astype(np.float32) - 16.0) * (255.0 / 219.0)
    uf = (u.astype(np.float32) - 128.0) * (255.0 / 224.0)
    vf = (v.astype(np.float32) - 128.0) * (255.0 / 224.0)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(rgb, ref) >= 40.0

    data = _avif(img, q=90, subsampling="4:2:2")
    out = avif_native.decode_yuv_studio(data)
    if out is None:
        pytest.skip("encoder did not honour 4:2:2")
    y, u, v, csy, csx = out[:5]
    assert (csy, csx) == (1, 2)  # full height, half width
    assert y.shape == (96, 128) and u.shape == (96, 64)

    # the 4:2:0-only wrapper must keep its pre-round-4 contract
    assert avif_native.decode_yuv420_studio(data) is None


def _mono_avif(y, q=80, full_range=False):
    """True YUV400 (mono_chrome=1) AVIF — PIL's plugin encodes mode-L as
    neutral-chroma 4:2:0 COLOUR, so the real monochrome class needs the
    direct bitstream encoder (codecs/avif_encode.py)."""
    from imagekit_tpu.codecs import avif_encode as ae

    try:
        return ae.encode_y400_studio(
            np.ascontiguousarray(y), q, full_range=full_range
        )
    except (ValueError, MemoryError) as e:
        pytest.skip(f"libavif YUV400 encode unavailable: {e}")


def test_decode_yuv_studio_mono():
    """True monochrome (YUV400) sources ride the YUV-direct path since
    late round 4: the Y plane pairs with synthesized studio-neutral
    4:2:0 chroma (a flat 128 plane is a fixed point of the combined
    chroma weights and of every YCbCr matrix); grey reconstruction
    matches the host library."""
    yy = np.tile(np.linspace(20, 230, 96, dtype=np.uint8)[None, :], (64, 1))
    data = _mono_avif(yy, q=85)
    info = avif_native.parse_container(data)
    assert info.monochrome
    out = avif_native.decode_yuv_studio(data)
    assert out is not None
    y, u, v, csy, csx = out[:5]
    assert (csy, csx) == (2, 2)
    assert y.shape == (64, 96) and u.shape == v.shape == (32, 48)
    assert (u == 128).all() and (v == 128).all()
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert (ref[:, :, 0] == ref[:, :, 1]).all()  # host grey is grey
    grey = np.clip(
        np.floor((y.astype(np.float32) - 16.0) * (255.0 / 219.0) + 0.5),
        0, 255,
    ).astype(np.uint8)
    assert int(np.abs(grey.astype(int) - ref[:, :, 0].astype(int)).max()) <= 1

    # full-range mono squeezes Y to studio like every full-range source
    data_fr = _mono_avif(yy, q=85, full_range=True)
    out_fr = avif_native.decode_yuv_studio(data_fr)
    assert out_fr is not None
    y_fr = out_fr[0]
    ref_fr = np.asarray(Image.open(io.BytesIO(data_fr)).convert("RGB"))
    grey_fr = np.clip(
        np.floor((y_fr.astype(np.float32) - 16.0) * (255.0 / 219.0) + 0.5),
        0, 255,
    ).astype(np.uint8)
    assert (
        int(np.abs(grey_fr.astype(int) - ref_fr[:, :, 0].astype(int)).max())
        <= 1  # one squeeze/expand round trip
    )

    # odd dims: ceil-divide chroma geometry
    yy_odd = np.tile(np.linspace(30, 220, 63, dtype=np.uint8)[None, :], (97, 1))
    out_odd = avif_native.decode_yuv_studio(_mono_avif(yy_odd))
    assert out_odd is not None
    assert out_odd[0].shape == (97, 63)
    assert out_odd[1].shape == out_odd[2].shape == (49, 32)


def test_engine_mono_rides_yuv_path():
    """Mono AVIF -> webp takes the native YUV batched path (avif_decode
    stage runs, no PIL consultation); grey in, grey out within encode
    tolerance, and the output matches the host-decode golden."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    yy = np.asarray(
        Image.fromarray(make_test_image(640, 480)).convert("L")
    )
    data = _mono_avif(yy, q=85)
    probe = avif_native.decode_yuv_studio(data)
    assert probe is not None and probe[3:5] == (2, 2)

    engine = make_engine()

    async def run():
        out = await engine.transform(data, 320, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.stage_seconds.get("avif_decode", 0) > 0
    assert out[:4] == b"RIFF"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (240, 320, 3)
    # grey source: channels agree within VP8 chroma quantisation noise
    assert int(np.abs(dec[:, :, 0].astype(int) - dec[:, :, 1].astype(int)).max()) <= 8
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0


def test_engine_avif_444_rides_yuvsrc():
    """A 4:4:4 AVIF source -> webp rides the SAME fused yuvsrc head via
    chroma-geometry-keyed batches and subsample-folded weights: no host
    fallback once the (csy,csx)=(1,1) signature is compiled, and the
    output matches the host-decode golden (VERDICT r3 #7)."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    img = make_test_image(640, 480)
    data = _avif(img, q=85, subsampling="4:4:4")
    probe = avif_native.decode_yuv_studio(data)
    if probe is None or probe[3:5] != (1, 1):
        pytest.skip("encoder did not honour 4:4:4")

    engine = make_engine()

    async def run():
        from imagekit_tpu.ops.dct import pad128, resize_yuv420_batch

        bh, bw = bucket_for(480), bucket_for(640)
        obh, obw = bucket_for(240), bucket_for(320)
        ny = bh * bw
        nc = bh * bw  # full-res chroma
        flat = np.zeros((1, pad128(ny + 2 * nc)), np.uint8)
        wv = np.zeros((engine.MAX_UNIQUE, obh, bh), np.float32)
        wh = np.zeros((engine.MAX_UNIQUE, obw, bw), np.float32)
        wvc = np.zeros((engine.MAX_UNIQUE, obh // 2, bh), np.float32)
        whc = np.zeros((engine.MAX_UNIQUE, obw // 2, bw), np.float32)
        resize_yuv420_batch(
            flat, (wv, wh, wvc, whc), np.zeros(1, np.int32),
            (bh, bw), (obh, obw), chroma_sub=(1, 1),
        )
        engine._compiled.add(
            ("yuvsrc", False, 1, bh, bw, obh, obw, 1, 1, False, False)
        )
        out = await engine.transform(data, 320, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert engine.metrics.stage_seconds.get("avif_decode", 0) > 0
    assert out[:4] == b"RIFF"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (240, 320, 3)
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0


def test_engine_avif_444_422_odd_dims_host_mirror():
    """Odd source dims exercise the ceil-divide chroma geometry on both
    non-420 layouts through the engine's host mirror (cold sig)."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    img = make_test_image(97, 63)
    for sub, cs in (("4:4:4", (1, 1)), ("4:2:2", (1, 2))):
        data = _avif(img, q=85, subsampling=sub)
        probe = avif_native.decode_yuv_studio(data)
        if probe is None or probe[3:5] != cs:
            continue
        engine = make_engine()

        async def run():
            out = await engine.transform(
                data, 48, None, ImageFormat.webp, 85
            )
            await engine.close()
            return out

        out = asyncio.run(run())
        assert out[:4] == b"RIFF"
        dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        golden = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB").resize(
                (48, 31), Image.LANCZOS
            )
        )
        assert dec.shape == golden.shape
        assert psnr(dec, golden) >= 28.0, sub


def test_engine_avif_422_host_fallback_correct():
    """A 4:2:2 source on a COLD chroma-geometry signature is served by
    the host mirror (identity vertical upsample) with correct output —
    the compile kicks in the background."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    img = make_test_image(640, 480)
    data = _avif(img, q=85, subsampling="4:2:2")
    probe = avif_native.decode_yuv_studio(data)
    if probe is None or probe[3:5] != (1, 2):
        pytest.skip("encoder did not honour 4:2:2")

    engine = make_engine()

    async def run():
        out = await engine.transform(data, 320, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 1  # cold sig -> host mirror
    assert out[:4] == b"RIFF"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0


def test_decompression_bomb_guard(monkeypatch):
    """A tiny container declaring huge dimensions must refuse before any
    allocation (same ceiling as the other native decoders)."""
    data = _avif(make_test_image(64, 48))
    real_parse = avif_native.parse_container

    def huge(d):
        info = real_parse(d)
        info.width, info.height = 40_000, 40_000
        return info

    monkeypatch.setattr(avif_native, "parse_container", huge)
    with pytest.raises(ValueError):
        avif_native.decode_rgb(data)


def test_no_double_decode_for_unsupported(monkeypatch):
    """Sources the YUV-direct path can never serve (alpha / colour
    without nclx / mono with an unprovable sample range) are rejected
    BEFORE the dav1d decode runs — the container's declared bits plus a
    bounded header parse say enough. (4:4:4/4:2:2 AND true monochrome DO
    decode since round 4.)"""
    data = _avif(make_test_image(96, 64))
    real_parse = avif_native.parse_container

    def patched(**overrides):
        def f(d):
            info = real_parse(d)
            for k, v in overrides.items():
                setattr(info, k, v)
            return info

        return f

    calls = []
    monkeypatch.setattr(
        avif_native, "_decode_obu",
        lambda *a: calls.append(1) or None,
    )
    # alpha: declared in the container
    monkeypatch.setattr(
        avif_native, "parse_container", patched(has_alpha=True)
    )
    assert avif_native.decode_yuv_studio(data) is None
    # colour without nclx: matrix unknowable
    monkeypatch.setattr(
        avif_native, "parse_container", patched(has_nclx=False)
    )
    assert avif_native.decode_yuv_studio(data) is None
    # mono without nclx: the seq-header range parse answers for mono
    # streams only — this OBU is colour, so the range is unprovable
    monkeypatch.setattr(
        avif_native,
        "parse_container",
        patched(monochrome=True, has_nclx=False),
    )
    assert avif_native.decode_yuv_studio(data) is None
    assert not calls, "dav1d ran for a source the header bits already rule out"


def test_header_dimensions_probe():
    """The fetch-layer dims probe reads ispe without touching iloc or the
    payload, and stays bounded on hostile inputs."""
    data = _avif(make_test_image(150, 98))
    assert avif_native.header_dimensions(data) == (150, 98)
    assert avif_native.header_dimensions(b"\x00" * 64) is None
    # millions of tiny boxes must hit the box-count bound, not O(n) walk
    bomb = data[:8] + b"\x00\x00\x00\x08free" * 200_000
    import time

    t0 = time.perf_counter()
    assert avif_native.header_dimensions(bomb) is None
    assert time.perf_counter() - t0 < 0.2


def test_hostile_ispe_rejects_file_without_poisoning_path():
    """A container whose ispe lies about dimensions must reject THAT
    file (None -> host fallback) without permanently disabling the
    native path — a permanent disable would let one hostile upload
    degrade every later AVIF to the slow path (round-3 fix)."""
    good = _avif(make_test_image(64, 48), q=85)
    # validate the ABI first (the guard only forgives mismatches after
    # one successful decode)
    assert avif_native.decode_rgb(good) is not None

    i = good.find(b"ispe")
    assert i > 0
    bad = bytearray(good)
    # lie about the width (ispe payload: fullbox(4) + w(4) + h(4))
    bad[i + 8:i + 12] = (128).to_bytes(4, "big")
    out = avif_native.decode_rgb(bytes(bad))
    assert out is None  # the file is rejected...
    assert avif_native.decode_available()  # ...the path is NOT disabled
    again = avif_native.decode_rgb(good)
    assert again is not None and again.shape == (48, 64, 3)


def _encode_avif_10bit(y10, cb10, cr10):
    """Test-only 10-bit AVIF writer over the pinned libavif ABI (the
    production encoder is 8-bit; this exists to exercise the decoder's
    high-bit-depth path)."""
    import ctypes

    try:
        lib = ctypes.CDLL("libavif.so.15")
    except OSError:
        return None
    lib.avifImageCreate.restype = ctypes.c_void_p
    lib.avifImageAllocatePlanes.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.avifEncoderCreate.restype = ctypes.c_void_p
    lib.avifEncoderWrite.restype = ctypes.c_int
    lib.avifEncoderWrite.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_void_p]

    class RW(ctypes.Structure):
        _fields_ = [("data", ctypes.c_void_p), ("size", ctypes.c_size_t)]

    h, w = y10.shape
    img = lib.avifImageCreate(w, h, 10, 3)
    ctypes.c_int32.from_address(img + 16).value = 0  # limited range
    for off, v in ((104, 1), (106, 13), (108, 6)):
        ctypes.c_uint16.from_address(img + off).value = v
    assert lib.avifImageAllocatePlanes(img, 1) == 0
    planes = (ctypes.c_void_p * 3).from_address(img + 24)
    rb = (ctypes.c_uint32 * 3).from_address(img + 48)
    for i, arr in ((0, y10), (1, cb10), (2, cr10)):
        ph, pw = arr.shape
        src = np.ascontiguousarray(arr)
        for r in range(ph):
            ctypes.memmove(
                planes[i] + r * rb[i], src.ctypes.data + r * pw * 2, pw * 2
            )
    enc = lib.avifEncoderCreate()
    for off, v in ((4, 1), (8, 8), (24, 10), (28, 10)):
        ctypes.c_int32.from_address(enc + off).value = v
    out = RW()
    if lib.avifEncoderWrite(enc, img, ctypes.byref(out)) != 0:
        return None
    data = ctypes.string_at(out.data, out.size)
    lib.avifRWDataFree(ctypes.byref(out))
    lib.avifEncoderDestroy(ctypes.c_void_p(enc))
    lib.avifImageDestroy(ctypes.c_void_p(img))
    return data


def test_10bit_sources_decode_natively():
    """10-bit AVIF rounds to 8 bits inside the dav1d layer (like the
    reference's to_rgb8 reduction) on BOTH the RGB path and the
    YUV-direct serving path — no host-library fallback."""
    rng = np.random.default_rng(9)
    w, h = 120, 88
    y10 = (
        np.linspace(64, 940, w)[None, :] + rng.normal(0, 10, (h, w))
    ).clip(64, 940).astype(np.uint16)
    cb10 = np.full((h // 2, w // 2), 440, np.uint16)
    cr10 = np.full((h // 2, w // 2), 560, np.uint16)
    data = _encode_avif_10bit(y10, cb10, cr10)
    if data is None:
        pytest.skip("libavif unavailable for 10-bit generation")
    info = avif_native.parse_container(data)
    assert info.high_bitdepth
    ours = avif_native.decode_rgb(data)
    assert ours is not None and ours.shape == (h, w, 3)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 4
    planes = avif_native.decode_yuv420_studio(data)
    assert planes is not None
    assert planes[0].shape == (h, w) and planes[0].dtype == np.uint8


def test_animated_avif_decodes_first_frame_natively():
    """Animation sequences (brand avis): the primary still item decodes
    natively as frame 0, matching the host library's behaviour (the
    reference's image crate also decodes stills only)."""
    frames = [
        Image.fromarray(np.roll(make_test_image(64, 48), i * 8, axis=1))
        for i in range(3)
    ]
    buf = io.BytesIO()
    try:
        frames[0].save(buf, "AVIF", save_all=True,
                       append_images=frames[1:], duration=100, quality=80)
    except Exception:
        pytest.skip("encoder lacks animated AVIF support")
    data = buf.getvalue()
    assert data[8:12] == b"avis"
    ours = avif_native.decode_rgb(data)
    assert ours is not None and ours.shape == (48, 64, 3)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(ours.astype(float) - ref.astype(float)).mean() <= 8.0


def test_premultiplied_alpha_falls_back():
    """An iref box containing a `prem` reference forces the host-library
    path (un-multiplication semantics stay with the host): alpha_obu is
    withheld and decode_rgb declines."""
    alpha = np.full((48, 64), 128, np.uint8)
    rgba = np.dstack([make_test_image(64, 48), alpha])
    buf = io.BytesIO()
    try:
        Image.fromarray(rgba).save(buf, "AVIF", quality=80)
    except Exception:
        pytest.skip("encoder lacks RGBA support")
    data = buf.getvalue()
    info = avif_native.parse_container(data)
    if not info.has_alpha or not info.alpha_obu:
        pytest.skip("no extractable alpha item to re-reference")
    # box surgery: rename the existing auxl iref (alpha -> colour
    # reference libavif writes) to prem; sizes unchanged
    i = data.find(b"auxl")
    if i < 0:
        pytest.skip("no auxl iref to rename")
    mutated = data[:i] + b"prem" + data[i + 4:]
    info2 = avif_native.parse_container(mutated)
    assert info2.has_alpha and not info2.alpha_obu
    assert avif_native.decode_rgb(mutated) is None
    # the serving layer still serves the image via the host library
    from imagekit_tpu import codecs as codecs_mod

    arr, _ = codecs_mod.decode_bytes(mutated)
    assert arr.shape[:2] == (48, 64)


# -- round-5 carve-out folds: alpha and BT.709 ride the fused head ------------
# (VERDICT r4 next #4: the fusion matrix's last source-class carve-outs)


def _patch_colr_matrix(data: bytes, matrix: int) -> bytes:
    """Re-tag an AVIF's colr/nclx matrix_coefficients in place (the box
    layout is 'colr' 'nclx' prim:u16 transfer:u16 matrix:u16 range:u8).
    The planes stay what the encoder wrote — the new tag changes how a
    spec-honouring decoder interprets them, which is exactly what a
    BT.709 fixture needs."""
    i = data.find(b"colrnclx")
    assert i > 0
    off = i + 8 + 4  # past the tag + primaries + transfer
    return data[:off] + matrix.to_bytes(2, "big") + data[off + 2:]


def _rgba_avif(rng_seed=5, w=96, h=64, q=90):
    rng = np.random.default_rng(rng_seed)
    img = make_test_image(w, h)
    a = np.clip(rng.normal(170, 60, (h, w)), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(np.dstack([img, a]), "RGBA").save(buf, "AVIF", quality=q)
    return buf.getvalue(), img, a


def test_decode_yuv_studio_alpha():
    """Alpha-bearing sources take the YUV-direct path since round 5: the
    aux plane decodes through the same dav1d core (full-range, luma
    geometry) and matches the host library's alpha channel exactly."""
    data, _img, _a = _rgba_avif()
    out = avif_native.decode_yuv_studio(data)
    assert out is not None and out.alpha is not None
    assert out.alpha.shape == out.y.shape == (64, 96)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))[:, :, 3]
    assert int(np.abs(out.alpha.astype(int) - ref.astype(int)).max()) <= 1
    # the strict pre-round-4 wrapper keeps rejecting alpha
    assert avif_native.decode_yuv420_studio(data) is None


def test_decode_yuv_studio_bt709():
    """BT.709-tagged sources take the YUV-direct path since round 5,
    flagged for the head's folded 709->601 mix."""
    img = make_test_image(96, 64)
    data = _patch_colr_matrix(_avif(img, q=90), 1)
    info = avif_native.parse_container(data)
    assert info.matrix == 1
    out = avif_native.decode_yuv_studio(data)
    assert out is not None and out.bt709
    assert out.alpha is None
    # the strict wrapper keeps rejecting 709
    assert avif_native.decode_yuv420_studio(data) is None
    # the folded mix must reproduce the host library's own 709
    # interpretation: convert our mixed-to-601 planes to RGB and compare
    from imagekit_tpu.ops.dct import host_resize_yuv420_single

    h, w = out.y.shape
    y6, cb6, cr6 = host_resize_yuv420_single(
        out.y, out.u, out.v, h, w, mix=True
    )
    yf = (y6.astype(np.float32) - 16.0) * (255.0 / 219.0)
    uf = (cb6.astype(np.float32) - 128.0) * (255.0 / 224.0)
    vf = (cr6.astype(np.float32) - 128.0) * (255.0 / 224.0)
    uf = np.repeat(np.repeat(uf, 2, 0), 2, 1)[:h, :w]
    vf = np.repeat(np.repeat(vf, 2, 0), 2, 1)[:h, :w]
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(rgb, ref) >= 33.0  # NN chroma upsample tolerance


def test_engine_avif_709_to_webp_rides_fused():
    """A BT.709 AVIF source -> webp rides the fused head via the
    mix-keyed batch variant: no host fallback once the mix signature is
    compiled, and the output matches the host library's own 709 decode
    (VERDICT r4 next #4)."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    img = make_test_image(640, 480)
    data = _patch_colr_matrix(_avif(img, q=85), 1)
    probe = avif_native.decode_yuv_studio(data)
    if probe is None or not probe.bt709 or probe[3:5] != (2, 2):
        pytest.skip("fixture did not take the 709 direct path")

    engine = make_engine()

    async def run():
        from imagekit_tpu.ops.dct import pad128, resize_yuv420_batch

        bh, bw = bucket_for(480), bucket_for(640)
        obh, obw = bucket_for(240), bucket_for(320)
        ny, nc = bh * bw, (bh // 2) * (bw // 2)
        flat = np.zeros((1, pad128(ny + 2 * nc)), np.uint8)
        nu = engine.MAX_UNIQUE
        weights = (
            np.zeros((nu, obh, bh), np.float32),
            np.zeros((nu, obw, bw), np.float32),
            np.zeros((nu, obh // 2, bh // 2), np.float32),
            np.zeros((nu, obw // 2, bw // 2), np.float32),
            np.zeros((nu, obh, bh // 2), np.float32),
            np.zeros((nu, obw, bw // 2), np.float32),
        )
        resize_yuv420_batch(
            flat, weights, np.zeros(1, np.int32), (bh, bw), (obh, obw),
            mix=True,
        )
        engine._compiled.add(
            ("yuvsrc", False, 1, bh, bw, obh, obw, 2, 2, True, False)
        )
        out = await engine.transform(data, 320, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert out[:4] == b"RIFF"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0
    # and the mix really changed the colours vs a 601 interpretation
    data601 = _patch_colr_matrix(data, 6)
    g601 = np.asarray(
        Image.open(io.BytesIO(data601)).convert("RGB").resize(
            (320, 240), Image.LANCZOS
        )
    )
    assert psnr(golden, g601) < 45.0  # interpretations genuinely differ


def test_engine_avif_alpha_to_avif_rides_fused():
    """An alpha-bearing AVIF -> AVIF output rides the fused head with the
    alpha plane as a 4th resized plane, handed to the encoder's alpha
    arm: no host fallback once the alpha signature is compiled, output
    keeps alpha (VERDICT r4 next #4)."""
    import asyncio

    from imagekit_tpu.codecs import avif_encode
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.test_batcher import make_engine

    if not avif_encode.available():
        pytest.skip("direct libavif encode ABI unavailable")

    data, _img, alpha = _rgba_avif(w=640, h=480, q=88)
    probe = avif_native.decode_yuv_studio(data)
    if probe is None or probe.alpha is None:
        pytest.skip("fixture did not take the alpha direct path")

    engine = make_engine()

    async def run():
        from imagekit_tpu.ops.dct import pad128, resize_yuv420_batch

        bh, bw = bucket_for(480), bucket_for(640)
        obh, obw = bucket_for(240), bucket_for(320)
        ny, nc = bh * bw, (bh // 2) * (bw // 2)
        flat = np.zeros((1, pad128(ny + 2 * nc + ny)), np.uint8)
        nu = engine.MAX_UNIQUE
        weights = (
            np.zeros((nu, obh, bh), np.float32),
            np.zeros((nu, obw, bw), np.float32),
            np.zeros((nu, obh // 2, bh // 2), np.float32),
            np.zeros((nu, obw // 2, bw // 2), np.float32),
        )
        resize_yuv420_batch(
            flat, weights, np.zeros(1, np.int32), (bh, bw), (obh, obw),
            alpha=True,
        )
        engine._compiled.add(
            ("yuvsrc", False, 1, bh, bw, obh, obw, 2, 2, False, True)
        )
        out = await engine.transform(data, 320, None, ImageFormat.avif, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert out[4:12] == b"ftypavif"
    dec = Image.open(io.BytesIO(out))
    assert dec.mode == "RGBA"
    got_a = np.asarray(dec)[:, :, 3]
    golden_a = np.asarray(
        Image.fromarray(alpha, "L").resize((320, 240), Image.LANCZOS)
    )
    assert got_a.shape == golden_a.shape
    assert psnr(got_a, golden_a) >= 30.0


def test_engine_avif_alpha_to_webp_drops_alpha():
    """Alpha AVIF -> webp output DROPS alpha like the reference (its
    lossy webp encode is from_rgb — src/transform.rs:116-122): the
    source still rides the YUV-direct decode, keyed as a no-alpha batch."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    data, img, _alpha = _rgba_avif(w=128, h=96, q=90)
    if avif_native.decode_yuv_studio(data) is None:
        pytest.skip("fixture did not take the direct path")

    engine = make_engine()

    async def run():
        out = await engine.transform(data, 64, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert out[:4] == b"RIFF"
    dec = Image.open(io.BytesIO(out))
    assert dec.mode == "RGB"  # simple lossy VP8, no ALPH chunk
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (64, 48), Image.LANCZOS
        )
    )
    assert psnr(np.asarray(dec.convert("RGB")), golden) >= 28.0


def test_engine_avif_709_alpha_host_mirror():
    """709 and alpha sources on COLD signatures are served correctly by
    the host mirror (same mix/alpha math) while the variant compiles in
    the background."""
    import asyncio

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from tests.test_batcher import make_engine

    if not vp8_native.available():
        pytest.skip("native VP8 encoder unavailable")

    img = make_test_image(200, 150)
    data = _patch_colr_matrix(_avif(img, q=85), 1)
    probe = avif_native.decode_yuv_studio(data)
    if probe is None or not probe.bt709:
        pytest.skip("fixture did not take the 709 direct path")

    engine = make_engine()

    async def run():
        out = await engine.transform(data, 100, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 1  # cold mix sig -> mirror
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (100, 75), Image.LANCZOS
        )
    )
    assert psnr(dec, golden) >= 30.0


def test_decode_yuv_studio_want_alpha_false():
    """webp/jpeg outputs drop alpha, so the engine asks the decoder to
    skip the aux-plane decode outright (round-5 review finding): the
    colour planes still ride the direct path, alpha is None."""
    data, _img, _a = _rgba_avif()
    out = avif_native.decode_yuv_studio(data, want_alpha=False)
    assert out is not None and out.alpha is None
    full = avif_native.decode_yuv_studio(data)
    assert full is not None and full.alpha is not None
    assert (out.y == full.y).all()


def test_seq_header_identity_triple_implies_full_range():
    """Spec 5.5.2: a non-mono color_config carrying the sRGB identity
    triple (primaries 1, transfer 13, matrix 0) OMITS color_range — it
    is implied FULL.  The parse must not read the next bit as range
    (review finding: it read separate_uv_delta_q and could corrupt
    full-range alpha by limited->full rescaling)."""
    from imagekit_tpu.codecs.av1_entropy import BitWriter, obu

    def seq(identity: bool) -> bytes:
        b = BitWriter()
        b.f(0, 3)   # seq_profile 0
        b.f(1, 1)   # still_picture
        b.f(1, 1)   # reduced_still_picture_header
        b.f(0, 5)   # level
        b.f(5, 4)   # wbits-1
        b.f(5, 4)   # hbits-1
        b.f(63, 6)  # w-1
        b.f(63, 6)  # h-1
        b.f(0, 6)   # sb/filters/superres/cdef/restoration bits
        b.f(0, 1)   # high_bitdepth
        b.f(0, 1)   # mono_chrome
        b.f(1, 1)   # color_description_present
        if identity:
            b.f(1, 8)    # primaries
            b.f(13, 8)   # transfer
            b.f(0, 8)    # matrix -> range OMITTED (implied full)
        else:
            b.f(1, 8)
            b.f(13, 8)
            b.f(6, 8)    # BT.601 matrix -> range bit follows
            b.f(0, 1)    # limited
        b.f(0, 2)   # chroma_sample_position
        b.f(0, 1)   # separate_uv_delta_q
        b.f(0, 1)   # film_grain
        b.trailing_bits()
        return obu(1, b.bytes())   # OBU_SEQUENCE_HEADER

    assert avif_native._seq_header_color_range(seq(True)) == (False, True)
    assert avif_native._seq_header_color_range(seq(False)) == (False, False)
