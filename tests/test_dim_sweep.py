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


@pytest.mark.parametrize("w,h", DIMS)
def test_avif_encode_decode_dims(w, h):
    """Round-3: the direct libavif encode + native dav1d decode loop at
    every awkward size (odd chroma geometry is where 4:2:0 plane-size
    formulas break)."""
    from imagekit_tpu.codecs import avif_encode, avif_native

    if not (avif_encode.available() and avif_native.decode_available()):
        pytest.skip("native avif unavailable")
    img = _src(w, h, seed=3)
    data = avif_encode.encode_rgb(img, 90)
    out = avif_native.decode_rgb(data)
    assert out is not None and out.shape == (h, w, 3)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # the chroma upsamplers legitimately differ on random 4:2:0 chroma
    # (nearest vs bilinear), so don't pin decoder-vs-decoder pixels;
    # require our reconstruction to be AS CLOSE to the source as the
    # host library's (correctness without pinning conversion detail)
    ours_err = np.abs(out.astype(float) - img.astype(float)).mean()
    pil_err = np.abs(ref.astype(float) - img.astype(float)).mean()
    assert ours_err <= pil_err + 3.0, (ours_err, pil_err)


@pytest.mark.parametrize("w,h", DIMS)
def test_vp8_encode_decode_dims(w, h):
    """Native VP8 encode -> native decode at every awkward size (the
    round-3 mode-RD/segmentation changes touch per-MB context edges)."""
    from imagekit_tpu.codecs import vp8

    if not (vp8.available() and vp8.decode_available()):
        pytest.skip("native vp8 unavailable")
    img = _src(w, h, seed=4)
    data = vp8.encode_rgb(img, 90)
    ours = vp8.decode_rgb(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours is not None and ours.shape == (h, w, 3)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 4
