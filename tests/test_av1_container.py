"""First-party AVIF container writer + clean-aperture decode support."""

import io
import struct

import numpy as np
import pytest

from imagekit_tpu.codecs import avif_native
from imagekit_tpu.codecs.av1_container import write_avif
from imagekit_tpu.codecs.av1_image import encode_avif, encode_frame

needs_dav1d = pytest.mark.skipif(
    not avif_native.decode_available(), reason="libdav1d unavailable")


def _planes(h, w, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(128 + 60 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
                + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    u = np.clip(128 + np.mgrid[0:ch, 0:cw][0], 0, 255).astype(np.uint8)
    v = np.full((ch, cw), 110, np.uint8)
    return y, u, v


@needs_dav1d
def test_container_roundtrip_own_parser():
    y, u, v = _planes(64, 64)
    stream, *_ = encode_frame(y, u, v, qindex=60)
    data = write_avif(stream, 64, 64)
    info = avif_native.parse_container(data)
    assert (info.width, info.height) == (64, 64)
    assert info.crop is None
    assert info.has_nclx and info.matrix == 6 and not info.full_range
    assert not info.monochrome and info.chroma_sub_x and info.chroma_sub_y
    assert info.obu == stream


@needs_dav1d
@pytest.mark.parametrize("dims", [(64, 64), (100, 150), (37, 61)])
def test_encode_avif_arbitrary_dims(dims):
    h, w = dims
    y, u, v = _planes(h, w)
    data = encode_avif(y, u, v, qindex=60)
    info = avif_native.parse_container(data)
    # round 5: the bitstream signals the true frame size at ANY dims
    # (edge-superblock syntax), so no CleanAperture box is ever written
    # and clap-ignoring consumers (PIL) see exact dimensions too
    assert info.crop is None
    assert (info.width, info.height) == (w, h)
    yd = avif_native.decode_yuv_studio(data)
    assert yd is not None and yd.y.shape == (h, w)
    assert yd.u.shape == ((h + 1) // 2, (w + 1) // 2)
    rgb = avif_native.decode_rgb(data)
    assert rgb is not None and rgb.shape[:2] == (h, w)


@needs_dav1d
def test_encode_avif_pixels_cross_decoder():
    """Pixel values must agree with an independent decoder (PIL/libavif)
    up to its chroma-upsample difference — including at odd dims, which
    need no clap since round 5."""
    pil = pytest.importorskip("PIL.Image")
    y, u, v = _planes(64, 64)
    data = encode_avif(y, u, v, qindex=40)
    rgb = avif_native.decode_rgb(data)
    img = pil.open(io.BytesIO(data))
    img.load()
    assert img.size == (64, 64)
    y2, u2, v2 = _planes(37, 61)
    d2 = encode_avif(y2, u2, v2, qindex=40)
    img2 = pil.open(io.BytesIO(d2))
    img2.load()
    assert img2.size == (61, 37)
    diff = np.abs(np.asarray(img.convert("RGB"), int) - rgb[..., :3])
    assert diff.max() <= 4  # chroma upsample filter tolerance


def _clap_file(raw):
    """Minimal synthetic meta with an ispe(64x64) + clap property."""
    y, u, v = _planes(64, 64)
    stream, *_ = encode_frame(y, u, v, qindex=200)
    data = bytearray(write_avif(stream, 64, 64, display_w=48, display_h=32))
    i = bytes(data).find(b"clap")
    assert i > 0
    data[i + 4:i + 36] = struct.pack(">8i", *raw)
    return bytes(data)


@needs_dav1d
def test_clap_validation_rejects_hostile_apertures():
    # non-integer aperture, zero denominator, out-of-bounds, oversized
    for raw in [
        (33, 2, 32, 1, -31, 2, -32, 2),      # w = 16.5
        (48, 0, 32, 1, -16, 2, -32, 2),      # div by zero
        (48, 1, 32, 1, 1000, 2, -32, 2),     # x0 out of range
        (480, 1, 32, 1, -16, 2, -32, 2),     # wider than coded
    ]:
        info = avif_native.parse_container(_clap_file(raw))
        assert info.crop is None  # ignored -> decodes at coded size
        rgb = avif_native.decode_rgb(_clap_file(raw))
        assert rgb is not None and rgb.shape[:2] == (64, 64)


@needs_dav1d
def test_clap_centered_aperture():
    # centered 32x32 window (offsets 0): x0 = (64-32)/2 = 16
    info = avif_native.parse_container(
        _clap_file((32, 1, 32, 1, 0, 1, 0, 1)))
    assert info.crop == (16, 16, 32, 32)
    yd = avif_native.decode_yuv_studio(
        _clap_file((32, 1, 32, 1, 0, 1, 0, 1)))
    assert yd is not None and yd.y.shape == (32, 32)
    # odd offset -> chroma-misaligned -> direct path refuses (host falls
    # back), but RGB-domain decode still crops exactly
    odd = _clap_file((32, 1, 32, 1, 1, 1, 0, 1))
    assert avif_native.parse_container(odd).crop == (17, 16, 32, 32)
    assert avif_native.decode_yuv_studio(odd) is None
    rgb = avif_native.decode_rgb(odd)
    assert rgb is not None and rgb.shape[:2] == (32, 32)
