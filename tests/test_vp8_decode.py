"""Native VP8 (lossy WebP) decoder tests.

Two exactness oracles:

1. Round trip with OUR encoder (loop filter forced off, reconstruction
   exported): decoder output must equal the encoder's reconstruction
   bit-for-bit — validates the boolean decoder, header parse, token
   decode, dequant, I16 prediction and the normative inverse transforms.
2. Grayscale LUT vs libwebp: libwebp-ENCODED grayscale streams (constant
   chroma makes libwebp's RGB conversion an invertible per-pixel LUT,
   derived from our own q100 stream) must map bit-exactly onto PIL's
   decode — validates B_PRED sub-modes, segmentation and the complete
   normal loop filter against the reference decoder.
"""

import ctypes
import io

import numpy as np
import pytest
from PIL import Image

from imagekit_tpu.codecs import decode_bytes
from tests.conftest import make_test_image, psnr

vp8 = pytest.importorskip("imagekit_tpu.codecs.vp8")
pytestmark = pytest.mark.skipif(
    not vp8.decode_available(), reason="native VP8 decoder unavailable"
)


def _libwebp(rgb, q, method=4):
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "WEBP", quality=q, method=method)
    return buf.getvalue()


def _pil_rgb(data):
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def _photo(w=400, h=225, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack(
        [
            128 + 90 * np.sin(xx / 37),
            128 + 90 * np.cos(yy / 61),
            128 + 60 * np.sin((xx + yy) / 98),
        ],
        -1,
    )
    return np.clip(rgb + rng.normal(0, 4, rgb.shape), 0, 255).astype(np.uint8)


def _encode_ex(y, u, v, q, flags):
    """Our encoder with recon export (test-only ABI)."""
    from imagekit_tpu.codecs.native import loader

    lib = loader.load()
    lib.ik_vp8_encode_ex.restype = ctypes.c_int64
    lib.ik_vp8_encode_ex.argtypes = (
        [ctypes.c_void_p] * 3
        + [ctypes.c_int] * 5
        + [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
        + [ctypes.c_void_p] * 3
    )
    h, w = y.shape
    W, H = (w + 15) // 16 * 16, (h + 15) // 16 * 16
    out = np.empty(w * h * 4 + 65536, np.uint8)
    ry = np.empty((H, W), np.uint8)
    ru = np.empty((H // 2, W // 2), np.uint8)
    rv = np.empty_like(ru)
    n = lib.ik_vp8_encode_ex(
        y.ctypes.data, u.ctypes.data, v.ctypes.data, w, h,
        y.strides[0], u.strides[0], q, out.ctypes.data, out.nbytes,
        flags, ry.ctypes.data, ru.ctypes.data, rv.ctypes.data,
    )
    assert n > 0
    return out[:n].tobytes(), ry, ru, rv


@pytest.mark.parametrize("w,h,q", [(80, 48, 80), (400, 225, 50), (100, 70, 95)])
def test_roundtrip_bit_exact_vs_encoder_recon(w, h, q):
    rng = np.random.default_rng(9)
    y = np.ascontiguousarray(
        np.clip(
            (np.add.outer(np.arange(h) * 2, np.arange(w)) % 256)
            + rng.normal(0, 20, (h, w)),
            0,
            255,
        ).astype(np.uint8)
    )
    u = np.ascontiguousarray(
        rng.integers(60, 200, ((h + 1) // 2, (w + 1) // 2), np.uint8)
    )
    v = np.ascontiguousarray(
        rng.integers(60, 200, ((h + 1) // 2, (w + 1) // 2), np.uint8)
    )
    data, ry, ru, rv = _encode_ex(y, u, v, q, flags=1)  # loop filter off
    dy, du, dv = vp8.decode_yuv420(data)
    np.testing.assert_array_equal(dy, ry[: h, : w])
    np.testing.assert_array_equal(du, ru[: (h + 1) // 2, : (w + 1) // 2])
    np.testing.assert_array_equal(dv, rv[: (h + 1) // 2, : (w + 1) // 2])


def test_bit_exact_vs_libwebp_decoder_grayscale():
    """libwebp-encoded grayscale at low q (B_PRED + full-strength loop
    filter + segmentation) must decode identically to libwebp itself."""
    # derive the y -> gray LUT from our own q100 stream (bit-exact recon)
    ramp_y = np.ascontiguousarray(
        np.repeat(np.arange(256, dtype=np.uint8)[None, :], 16, 0)
    )
    flat = np.full((8, 128), 128, np.uint8)
    # flags: loop filter off + trellis off — the LUT derivation needs the
    # q100 recon to cover every Y value exactly, which RD pruning may not
    data, _, _, _ = _encode_ex(ramp_y, flat, flat, 100, flags=1 | 2)
    dy, _, _ = vp8.decode_yuv420(data)
    pil = _pil_rgb(data)[:, :, 1]
    lut = np.full(256, -1, np.int32)
    lut[dy.flatten()] = pil.flatten()

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:224, 0:320].astype(np.float32)
    gray = np.clip(
        128 + 80 * np.sin(xx / 23) * np.cos(yy / 17)
        + rng.normal(0, 12, (224, 320)),
        0,
        255,
    ).astype(np.uint8)
    rgbg = np.stack([gray] * 3, -1)
    for q, m in ((10, 6), (20, 4), (50, 4), (80, 4)):
        data = _libwebp(rgbg, q, m)
        ydec, _, _ = vp8.decode_yuv420(data)
        ref = _pil_rgb(data)[:, :, 1]
        np.testing.assert_array_equal(lut[ydec], ref, err_msg=f"q{q} m{m}")


def test_rgb_decode_close_to_libwebp():
    rgb = _photo()
    for q in (20, 50, 80, 95):
        data = _libwebp(rgb, q)
        ours = vp8.decode_rgb(data)
        assert ours.shape == (225, 400, 3)
        assert psnr(ours, _pil_rgb(data)) >= 45.0, q


@pytest.mark.parametrize("w,h", [(16, 16), (17, 31), (1, 1), (333, 87)])
def test_odd_dimensions(w, h):
    rgb = make_test_image(w, h)
    data = _libwebp(rgb, 85)
    ours = vp8.decode_rgb(data)
    assert ours.shape == (h, w, 3)
    assert psnr(ours, _pil_rgb(data)) >= 40.0


def test_decode_bytes_routes_webp_native():
    rgb = _photo(160, 96)
    data = _libwebp(rgb, 80)
    arr, fmt = decode_bytes(data)
    assert fmt.value == "webp"
    direct = vp8.decode_rgb(data)
    np.testing.assert_array_equal(arr, direct)


def test_lossless_vp8l_decodes_natively():
    rgb = make_test_image(40, 30)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "WEBP", lossless=True)
    data = buf.getvalue()
    out = vp8.decode_rgb(data)  # VP8L -> native lossless decoder
    assert out is not None
    np.testing.assert_array_equal(out[:, :, :3], rgb)
    arr, fmt = decode_bytes(data)
    assert fmt.value == "webp"
    np.testing.assert_array_equal(arr[:, :, :3], rgb)


def test_vp8x_lossless_decodes_natively():
    # synthesize an extended container: RIFF(WEBP VP8X + VP8L)
    rgb = make_test_image(24, 18)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "WEBP", lossless=True)
    data = buf.getvalue()
    vp8l_chunk = data[12:]
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    body = b"WEBP" + vp8x + vp8l_chunk
    riff = b"RIFF" + len(body).to_bytes(4, "little") + body
    out = vp8.decode_rgb(riff)
    assert out is not None
    np.testing.assert_array_equal(out[:, :, :3], rgb)


def test_webp_animation_decodes_first_frame():
    rng = np.random.default_rng(4)
    f0 = rng.integers(0, 255, (20, 24, 3), np.uint8)
    frames = [Image.fromarray(f0),
              Image.fromarray(rng.integers(0, 255, (20, 24, 3), np.uint8))]
    buf = io.BytesIO()
    frames[0].save(
        buf, "WEBP", save_all=True, append_images=frames[1:], duration=100,
        lossless=True,
    )
    data = buf.getvalue()
    assert data[12:16] == b"VP8X"
    out = vp8.decode_rgb(data)  # full-canvas frame 0 decodes natively
    assert out is not None
    np.testing.assert_array_equal(out[:, :, :3], f0)


def test_corrupt_webp_raises():
    data = bytearray(_libwebp(_photo(64, 48), 80))
    data = data[:24]  # truncate inside the frame
    with pytest.raises(ValueError):
        vp8.decode_rgb(bytes(data))
