"""Dimension sweep: every native decoder must be exact at awkward sizes.

Size-dependent pass-count / bundling / padding formulas are where decoder
bugs hide (the interlaced-GIF heap overflow only fired at heights = 2,3
mod 4). This sweeps each native decode path across dimensions covering
every small modulus class, checking exact pixels vs the host library.
"""

import io

import numpy as np
import pytest
from PIL import Image

from imagekit_tpu.codecs import decode_bytes


# cover 1-px edges, every residue mod 8, and a prime
DIMS = [(1, 1), (1, 9), (9, 1), (2, 3), (5, 7), (13, 11), (30, 31),
        (37, 23), (50, 19)]


def _src(w, h, seed=0):
    rng = np.random.default_rng(seed + w * 1000 + h)
    return rng.integers(0, 255, (h, w, 3), np.uint8)


@pytest.mark.parametrize("w,h", DIMS)
def test_png_dims(w, h):
    for interlace in (False, True):
        img = _src(w, h)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG", interlace=interlace)
        arr, _ = decode_bytes(buf.getvalue())
        np.testing.assert_array_equal(arr, img)


@pytest.mark.parametrize("w,h", DIMS)
def test_gif_dims(w, h):
    img = _src(w, h)
    buf = io.BytesIO()
    Image.fromarray(img).quantize(min(64, w * h)).save(buf, "GIF")
    data = buf.getvalue()
    arr, _ = decode_bytes(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(arr, ref)


@pytest.mark.parametrize("w,h", DIMS)
def test_bmp_dims(w, h):
    img = _src(w, h)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "BMP")
    arr, _ = decode_bytes(buf.getvalue())
    np.testing.assert_array_equal(arr, img)


@pytest.mark.parametrize("w,h", DIMS)
def test_tiff_dims(w, h):
    img = _src(w, h)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "TIFF", compression="tiff_lzw")
    arr, _ = decode_bytes(buf.getvalue())
    np.testing.assert_array_equal(arr, img)


@pytest.mark.parametrize("w,h", DIMS)
def test_webp_lossless_dims(w, h):
    img = _src(w, h)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", lossless=True, method=1)
    arr, _ = decode_bytes(buf.getvalue())
    np.testing.assert_array_equal(arr[:, :, :3], img)


@pytest.mark.parametrize("w,h", DIMS)
def test_webp_lossy_dims(w, h):
    img = _src(w, h)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=80)
    data = buf.getvalue()
    arr, _ = decode_bytes(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # lossy VP8: bit-exact YUV; RGB conversion within the documented
    # float-vs-fixed-point fancy-upsample tolerance
    assert arr.shape == ref.shape
    assert np.abs(arr.astype(int) - ref.astype(int)).max() <= 2


@pytest.mark.parametrize("w,h", DIMS)
def test_jpeg_dims(w, h):
    img = _src(w, h)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    data = buf.getvalue()
    arr, _ = decode_bytes(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # same coefficients, independent IDCT implementations: tiny rounding
    # differences are legitimate; geometry and near-exactness are not
    assert arr.shape == ref.shape
    assert np.abs(arr.astype(int) - ref.astype(int)).max() <= 1
