"""Native C++ JPEG entropy codec robustness tests: restart markers,
malformed input, corruption fuzzing (the codec parses untrusted bytes in
production), and coefficient-level roundtrips."""

import io

import numpy as np
import pytest
from PIL import Image

from tests.conftest import make_test_image, psnr

from imagekit_tpu.codecs.native import loader

lib = loader.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native codec unavailable")

from imagekit_tpu.codecs.native import jpeg_abi  # noqa: E402


def _jpeg(img, q=90, **kw):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=q, **kw)
    return buf.getvalue()


def test_parse_reports_dimensions_and_sampling():
    data = _jpeg(make_test_image(322, 243))
    hdr = jpeg_abi.parse(lib, data)
    assert (hdr.width, hdr.height) == (322, 243)
    assert hdr.ncomp == 3
    assert hdr.comp_h[0] in (1, 2)


def test_restart_markers_decode():
    """DRI/RSTn handling: cv2 can emit restart intervals."""
    import cv2

    img = make_test_image(320, 240)
    ok, enc = cv2.imencode(
        ".jpg",
        img[:, :, ::-1],
        [cv2.IMWRITE_JPEG_QUALITY, 90, cv2.IMWRITE_JPEG_RST_INTERVAL, 4],
    )
    assert ok
    data = enc.tobytes()
    assert b"\xff\xdd" in data[:1000]  # DRI marker present
    hdr, planes = jpeg_abi.decode_planes(lib, data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    y = planes[0][: hdr.comp_height[0], : hdr.comp_width[0]]
    # luma plane approximates PIL's grayscale conversion of the same image
    assert psnr(y, ref) >= 25.0


def test_progressive_decode_coefficient_exact():
    """Progressive (SOF2) scans decode natively: multi-scan coefficient
    accumulation with spectral selection + successive approximation. The
    re-encoded baseline must decode pixel-identically to the original."""
    data = _jpeg(make_test_image(200, 150), q=88, progressive=True)
    hdr, coeffs, qtabs = jpeg_abi.decode(lib, data)
    assert hdr.progressive
    out = jpeg_abi.encode(
        lib, coeffs, (qtabs[0], qtabs[1]), hdr.width, hdr.height,
        samp=tuple(zip(hdr.comp_h, hdr.comp_v)),
    )
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    np.testing.assert_array_equal(got, ref)


def test_progressive_grayscale_decode_planes():
    img = make_test_image(100, 80)[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(img, "L").save(buf, "JPEG", quality=90, progressive=True)
    hdr, planes = jpeg_abi.decode_planes(lib, buf.getvalue())
    y = planes[0][: hdr.comp_height[0], : hdr.comp_width[0]]
    assert psnr(y, img) >= 30.0


def test_truncated_scan_errors_not_crashes():
    data = _jpeg(make_test_image(128, 128))
    for frac in (0.3, 0.6, 0.9):
        cut = data[: int(len(data) * frac)]
        try:
            jpeg_abi.decode(lib, cut)
        except jpeg_abi.NativeJpegError:
            pass  # clean error is fine; crash/hang is not


def test_corruption_fuzz_no_crash():
    """Random single-byte corruptions must never crash the process; clean
    errors or (for scan-data corruption) wrong pixels are both acceptable."""
    data = bytearray(_jpeg(make_test_image(96, 96)))
    rng = np.random.default_rng(0)
    for _ in range(60):
        pos = int(rng.integers(2, len(data)))
        old = data[pos]
        data[pos] = int(rng.integers(0, 256))
        try:
            jpeg_abi.decode(lib, bytes(data))
        except jpeg_abi.NativeJpegError:
            pass
        finally:
            data[pos] = old


def test_grayscale_single_component():
    img = make_test_image(100, 80)[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(img, "L").save(buf, "JPEG", quality=92)
    hdr, planes = jpeg_abi.decode_planes(lib, buf.getvalue())
    assert hdr.ncomp == 1
    y = planes[0][: hdr.comp_height[0], : hdr.comp_width[0]]
    assert psnr(y, img) >= 30.0


def test_coefficient_roundtrip_is_lossless():
    """decode -> encode -> decode preserves coefficients exactly."""
    data = _jpeg(make_test_image(160, 120), 85)
    hdr, coeffs, qtabs = jpeg_abi.decode(lib, data)
    out = jpeg_abi.encode(
        lib, coeffs, (qtabs[0], qtabs[1]), hdr.width, hdr.height,
        samp=tuple(zip(hdr.comp_h, hdr.comp_v)),
    )
    hdr2, coeffs2, _ = jpeg_abi.decode(lib, out)
    for a, b in zip(coeffs, coeffs2):
        np.testing.assert_array_equal(a, b)
