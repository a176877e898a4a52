"""Transform-core tests, mirroring the reference's 19-case suite in
``tests/transform.rs`` (SURVEY.md §4) plus parity checks specific to the
TPU build (matmul resampler vs golden sampler, PSNR floors)."""

import numpy as np
import pytest

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.errors import TransformError
from imagekit_tpu.ops.resize import (
    fit_within,
    resample_reference,
    resample_weights,
    resize_batch,
    target_dimensions,
)
from imagekit_tpu.transform import (
    decode_image,
    encode_image,
    resize_image,
    transform_bytes,
)
from tests.conftest import encode_jpeg_pil, encode_png, make_test_image, psnr


# -- aspect-ratio math (tests/transform.rs:10-51) -----------------------------


def test_resize_width_only_preserves_aspect():
    img = make_test_image(1920, 1080)
    out = resize_image(img, w=640)
    assert out.shape[:2] == (360, 640)


def test_resize_height_only_preserves_aspect():
    img = make_test_image(1920, 1080)
    out = resize_image(img, h=540)
    assert out.shape[:2] == (540, 960)


def test_resize_both_dims_fits_within():
    # the reference's own fit-within confirmation (tests/transform.rs:239-248)
    img = make_test_image(1920, 1080)
    out = resize_image(img, w=640, h=480)
    assert out.shape[:2] == (360, 640)


def test_resize_noop_when_no_dims():
    img = make_test_image(100, 80)
    out = resize_image(img)
    assert out is img  # returns the original unchanged (src/transform.rs:67-69)


# -- upscale / clamping (tests/transform.rs:69-96) -----------------------------


def test_upscale():
    img = make_test_image(100, 50)
    out = resize_image(img, w=200)
    assert out.shape[:2] == (100, 200)


def test_min_one_pixel():
    img = make_test_image(100, 100)
    out = resize_image(img, w=1)
    assert out.shape[:2] == (1, 1)


def test_extreme_upscale():
    img = make_test_image(2, 2)
    out = resize_image(img, w=512)
    assert out.shape[:2] == (512, 512)


def test_tall_image_width_resize():
    img = make_test_image(100, 1000)
    out = resize_image(img, w=10)
    assert out.shape[:2] == (100, 10)


# -- dimension math unit checks ------------------------------------------------


def test_target_dimensions_parity_cases():
    assert target_dimensions(1920, 1080, 640, 480) == (640, 360)
    assert target_dimensions(1920, 1080, 640, None) == (640, 360)
    assert target_dimensions(1920, 1080, None, 540) == (960, 540)
    assert target_dimensions(1920, 1080, None, None) == (1920, 1080)
    assert target_dimensions(100, 100, 1, None) == (1, 1)
    assert target_dimensions(3, 1000, 1, 1) == (1, 1)  # max(1) floor


def test_fit_within_rounding():
    assert fit_within(1920, 1080, 640, 480) == (640, 360)
    assert fit_within(1000, 999, 100, 100) == (100, 100)
    assert fit_within(101, 100, 50, 50) == (50, 50)


# -- decode errors (tests/transform.rs:102-120) --------------------------------


def test_decode_garbage_fails():
    with pytest.raises(TransformError):
        decode_image(b"this is definitely not an image")


def test_decode_empty_fails():
    with pytest.raises(TransformError):
        decode_image(b"")


def test_decode_truncated_jpeg_fails():
    valid = encode_jpeg_pil(make_test_image(64, 64))
    with pytest.raises(TransformError):
        decode_image(valid[: len(valid) // 4])


# -- decode formats (tests/transform.rs:123-131) --------------------------------


def test_png_decode_and_webp_encode():
    img = make_test_image(64, 48)
    png = encode_png(img)
    decoded, fmt = decode_image(png)
    assert decoded.shape == (48, 64, 3)
    assert fmt is None  # PNG is not one of the three output formats
    np.testing.assert_array_equal(decoded, img)  # PNG is lossless
    out = encode_image(decoded, ImageFormat.webp, 80)
    assert out[:4] == b"RIFF" and out[8:12] == b"WEBP"


def test_jpeg_decode_reports_format():
    img = make_test_image(64, 48)
    _, fmt = decode_image(encode_jpeg_pil(img))
    assert fmt == ImageFormat.jpeg


# -- encoders produce valid output (tests/transform.rs:137-154) -----------------


def test_jpeg_magic_bytes():
    out = encode_image(make_test_image(64, 64), ImageFormat.jpeg, 80)
    assert out[:2] == b"\xff\xd8"


def test_webp_magic_bytes():
    out = encode_image(make_test_image(64, 64), ImageFormat.webp, 80)
    assert out[:4] == b"RIFF" and out[8:12] == b"WEBP"


def test_avif_produces_output():
    out = encode_image(make_test_image(64, 64), ImageFormat.avif, 80)
    assert len(out) > 0
    assert out[4:8] == b"ftyp"


# -- webp round trip (tests/transform.rs:156-169) -------------------------------


def test_webp_roundtrip_preserves_dims_and_format():
    img = make_test_image(120, 90)
    out = encode_image(img, ImageFormat.webp, 90)
    decoded, fmt = decode_image(out)
    assert decoded.shape[:2] == (90, 120)
    assert fmt == ImageFormat.webp


# -- quality behaviour (tests/transform.rs:175-218) ------------------------------


def test_jpeg_quality_monotonic():
    img = make_test_image(256, 256)
    sizes = [len(encode_image(img, ImageFormat.jpeg, q)) for q in (20, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_quality_clamped_at_bounds():
    img = make_test_image(64, 64)
    # q=0 and q=101 are clamped to [1,100] inside the encoders
    # (src/transform.rs:122,130,139) — must not raise
    assert len(encode_image(img, ImageFormat.jpeg, 0)) > 0
    assert len(encode_image(img, ImageFormat.webp, 101)) > 0


# -- full pipelines (tests/transform.rs:239-288) ---------------------------------


def test_full_pipeline_fit_within():
    img = make_test_image(1920, 1080)
    out = transform_bytes(encode_png(img), 640, 480, ImageFormat.webp, 80)
    decoded, _ = decode_image(out)
    assert decoded.shape[:2] == (360, 640)


def test_avif_pipeline():
    img = make_test_image(320, 240)
    out = transform_bytes(encode_png(img), 160, None, ImageFormat.avif, 70)
    decoded, fmt = decode_image(out)
    assert fmt == ImageFormat.avif
    assert decoded.shape[:2] == (120, 160)


def test_resized_output_smaller_than_original():
    img = make_test_image(1024, 768)
    src = encode_jpeg_pil(img, 95)
    out = transform_bytes(src, 200, None, ImageFormat.jpeg, 80)
    assert len(out) < len(src)


# -- TPU-build-specific numeric parity -------------------------------------------


def test_matmul_resample_matches_golden_sampler():
    """The batched matmul formulation must match the direct two-pass golden
    model bit-for-bit up to final rounding."""
    img = make_test_image(257, 131)  # awkward odd sizes on purpose
    got = np.asarray(resize_batch(img[None], 67, 111))[0]
    want = resample_reference(img, 67, 111)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1  # only final-rounding ULP differences
    assert (diff > 0).mean() < 0.01


def test_lanczos_weights_properties():
    w = resample_weights(1080, 400, "lanczos3")
    assert w.shape == (400, 1080)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    # window support: 3 * (1080/400) each side around the centre
    assert (np.count_nonzero(w, axis=1) <= 2 * int(np.ceil(3 * 2.7)) + 2).all()


def test_resample_psnr_vs_pil_lanczos():
    """Cross-validation against an independent Lanczos3 implementation
    (PIL). Both implement the same windowed-sinc resampler the reference
    uses; ≥45 dB is the BASELINE parity bar."""
    from PIL import Image

    img = make_test_image(1920, 1080)
    ours = np.asarray(resize_batch(img[None], 225, 400))[0]
    pil = np.asarray(
        Image.fromarray(img).resize((400, 225), Image.LANCZOS)
    )
    assert psnr(ours, pil) >= 45.0


def test_bilinear_filter_available():
    img = make_test_image(100, 100)
    out = np.asarray(resize_batch(img[None], 50, 50, "triangle"))[0]
    assert out.shape == (50, 50, 3)


def test_grayscale_roundtrip():
    img = make_test_image(64, 64)[:, :, 0]
    out = resize_image(img, w=32)
    assert out.shape == (32, 32)
