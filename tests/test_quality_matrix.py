"""Output-format quality matrix (BASELINE config #2): f=jpeg|webp|avif
across the quality range with aspect-preserving resize — every cell of the
matrix must produce a valid, decodable output whose rate-distortion tracks
the host-library encoder at the same settings."""

import io

import numpy as np
import pytest
from PIL import Image

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.transform import decode_image, transform_bytes
from tests.conftest import encode_jpeg_pil, make_test_image, psnr

QUALITIES = (10, 30, 50, 70, 90, 100)


@pytest.fixture(scope="module")
def source():
    return encode_jpeg_pil(make_test_image(640, 480), 92)


@pytest.mark.parametrize("fmt", list(ImageFormat))
def test_quality_sweep_produces_valid_outputs(fmt, source):
    sizes = []
    for q in QUALITIES:
        out = transform_bytes(source, 320, None, fmt, q)
        decoded, detected = decode_image(out)
        assert detected == fmt
        assert decoded.shape[:2] == (240, 320)
        sizes.append(len(out))
    # size grows (weakly) with quality across the sweep endpoints
    assert sizes[0] < sizes[-1]


@pytest.mark.parametrize("fmt", list(ImageFormat))
def test_quality_monotonic_distortion(fmt, source):
    """Higher q -> lower distortion vs the unencoded resized pixels."""
    from imagekit_tpu.transform import resize_image

    src_pixels, _ = decode_image(source)
    golden = resize_image(src_pixels, 320, None)
    p = []
    for q in (20, 60, 95):
        out = transform_bytes(source, 320, None, fmt, q)
        p.append(psnr(decode_image(out)[0], golden))
    assert p[0] < p[2]  # q20 worse than q95
    assert p[2] > 30.0  # q95 close to the unencoded pixels


def test_native_jpeg_encoder_rd_parity_across_qualities():
    """TPU-native JPEG encode (device fDCT+quant -> C++ Huffman) matches
    libjpeg's rate-distortion within 1.5 dB at every quality (§6 parity)."""
    from imagekit_tpu.codecs.native import loader

    if loader.load() is None:
        pytest.skip("native codec unavailable")
    from imagekit_tpu.codecs.native import jpeg_abi
    from imagekit_tpu.ops import dct as dct_ops

    img = make_test_image(320, 240)
    for q in (10, 30, 50, 70, 90):
        planes, qtabs = dct_ops.encode_rgb_to_coefficients(img, q)
        ours = jpeg_abi.encode(loader.load(), planes, qtabs, 320, 240)
        ours_psnr = psnr(
            np.asarray(Image.open(io.BytesIO(ours)).convert("RGB")), img
        )
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=q)
        lib_psnr = psnr(
            np.asarray(Image.open(buf).convert("RGB")), img
        )
        assert ours_psnr >= lib_psnr - 1.5, (q, ours_psnr, lib_psnr)
