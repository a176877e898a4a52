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


def _swap_quant_table_ids(data: bytes) -> bytes:
    """Rewrite a two-table JPEG so luma uses Tq=1 and chroma Tq=0 (legal but
    unconventional; ADVICE.md r1 repro): flip the table ids in every DQT
    definition and every SOF component selector. The stream stays
    semantically identical, so any correct decoder emits the same pixels."""
    out = bytearray(data)
    i = 2
    while i + 4 <= len(out):
        assert out[i] == 0xFF
        marker = out[i + 1]
        seglen = (out[i + 2] << 8) | out[i + 3]
        seg = i + 4
        if marker == 0xDB:  # DQT: [PqTq][64|128 bytes] repeated
            p = seg
            end = i + 2 + seglen
            while p < end:
                pq, tq = out[p] >> 4, out[p] & 15
                assert tq in (0, 1)
                out[p] = (pq << 4) | (1 - tq)
                p += 1 + (128 if pq else 64)
        elif marker in (0xC0, 0xC2):  # SOF0/SOF2 component Tq selectors
            ncomp = out[seg + 5]
            for c in range(ncomp):
                out[seg + 8 + 3 * c] = 1 - out[seg + 8 + 3 * c]
        if marker == 0xDA:
            break
        i += 2 + seglen
    return bytes(out)


def test_nonstandard_quant_table_mapping_decodes_identically():
    """A JPEG whose SOF maps luma->Tq1 / chroma->Tq0 must decode exactly
    like the conventional (0,1,1) stream — the coefficient path indexes
    tables by the actual selectors (ADVICE.md r1, high)."""
    from imagekit_tpu.ops import dct as dct_ops

    img = make_test_image(160, 128)
    data = _jpeg(img, 85)
    swapped = _swap_quant_table_ids(data)
    assert swapped != data
    # the host library agrees the streams are identical (sanity of rewrite)
    a = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(swapped)).convert("RGB"))
    np.testing.assert_array_equal(a, b)

    hdr1, _, _ = jpeg_abi.decode(lib, data)
    hdr2, _, _ = jpeg_abi.decode(lib, swapped)
    assert hdr1.comp_tq == (0, 1, 1)
    assert hdr2.comp_tq == (1, 0, 0)
    ours1 = dct_ops.decode_components_to_rgb(jpeg_abi.decode(lib, data))
    ours2 = dct_ops.decode_components_to_rgb(jpeg_abi.decode(lib, swapped))
    np.testing.assert_array_equal(ours1, ours2)


def test_distinct_chroma_quant_tables_rejected_by_device_path():
    """Cb/Cr with different Tq selectors (rare, legal) must raise so callers
    take the generic decode path instead of silently mis-dequantising."""
    from imagekit_tpu.ops import dct as dct_ops

    data = bytearray(_jpeg(make_test_image(64, 64), 85))
    # find SOF0 and point Cr at table 0 while Cb stays on table 1
    i = 2
    while data[i + 1] != 0xC0:
        i += 2 + ((data[i + 2] << 8) | data[i + 3])
    seg = i + 4
    assert data[seg + 5] == 3
    data[seg + 8 + 3 * 2] = 0  # Cr -> Tq0
    decoded = jpeg_abi.decode(lib, bytes(data))
    assert decoded[0].comp_tq == (0, 1, 0)
    with pytest.raises(ValueError):
        dct_ops.decode_components_to_rgb(decoded)


def test_native_calls_release_the_gil():
    """ROADMAP item 6 (multi-core host scaling) rests on every native
    entropy call releasing the GIL. Provable even on a 1-core host: a
    pure-Python counter thread must make progress WHILE a native encode
    runs — if the call held the GIL, the counter would freeze for the
    entire call."""
    import threading
    import time as _time

    from imagekit_tpu.codecs import vp8
    from tests.conftest import make_test_image

    if not vp8.available():
        pytest.skip("native codec unavailable")
    img = make_test_image(400, 304)

    progress = []
    stop = threading.Event()

    def counter():
        while not stop.is_set():
            progress.append(_time.perf_counter())
            _time.sleep(0.001)

    t = threading.Thread(target=counter)
    t.start()
    try:
        t0 = _time.perf_counter()
        for _ in range(6):
            vp8.encode_rgb(img, 95)  # ~40 ms/frame of native work each
        dt = _time.perf_counter() - t0
    finally:
        stop.set()
        t.join()
    during = [p for p in progress if t0 <= p <= t0 + dt]
    # with the GIL released the counter ticks throughout the native
    # work; demand at least a tick per ~25 ms of encode wall time
    assert len(during) >= dt / 0.025, (len(during), dt)
