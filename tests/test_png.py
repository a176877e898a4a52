"""Native PNG decode tests: exact-pixel parity with the host library
decoder across colour types, filter variety, fallback and corruption
behaviour (VERDICT r1 missing #3; reference decode arm
src/transform.rs:27-43, PNG decode covered by tests/transform.rs:123-131).
"""

import io
import zlib

import numpy as np
import pytest
from PIL import Image

from imagekit_tpu.codecs import decode_bytes
from imagekit_tpu.errors import TransformError

png_native = pytest.importorskip("imagekit_tpu.codecs.png")
pytestmark = pytest.mark.skipif(
    not png_native.available(), reason="native PNG decoder unavailable"
)


def _png(img: np.ndarray, mode=None, **kw) -> bytes:
    buf = io.BytesIO()
    (Image.fromarray(img, mode) if mode else Image.fromarray(img)).save(
        buf, "PNG", **kw
    )
    return buf.getvalue()


def _pil(data: bytes) -> np.ndarray:
    from imagekit_tpu.codecs import pil_backend

    return pil_backend.decode(data)


def test_rgb8_exact():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    data = _png(img)
    out = png_native.decode(data)
    np.testing.assert_array_equal(out, img)


def test_all_filter_types_exact():
    # smooth gradients make encoders pick sub/up/avg/paeth filters
    yy, xx = np.mgrid[0:200, 0:300]
    img = np.stack(
        [(xx * 255 // 300), (yy * 255 // 200), ((xx + yy) // 2 % 256)], -1
    ).astype(np.uint8)
    data = _png(img, optimize=True)
    np.testing.assert_array_equal(png_native.decode(data), img)


def test_rgba_exact():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (64, 50, 4), np.uint8)
    out = png_native.decode(_png(img, "RGBA"))
    np.testing.assert_array_equal(out, img)


def test_gray_expands_like_host_library():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (40, 30), np.uint8)
    data = _png(g, "L")
    np.testing.assert_array_equal(png_native.decode(data), _pil(data))


def test_palette_exact():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (96, 80, 3), np.uint8)
    pimg = Image.fromarray(img).quantize(64)
    buf = io.BytesIO()
    pimg.save(buf, "PNG")
    data = buf.getvalue()
    np.testing.assert_array_equal(png_native.decode(data), _pil(data))


def test_decode_bytes_routes_png_native():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    arr, fmt = decode_bytes(_png(img))
    assert fmt.value == "png"
    np.testing.assert_array_equal(arr, img)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize(
    "maker",
    [
        lambda img: Image.fromarray(img),
        lambda img: Image.fromarray(img).quantize(100),
        lambda img: Image.fromarray(img).quantize(4),  # 2-bit palette
        lambda img: Image.fromarray(img[:, :, 0], "L"),
        lambda img: Image.fromarray(img[:, :, 0] > 128),  # 1-bit
        lambda img: Image.fromarray(
            np.dstack([img, img[:, :, 0]]), "RGBA"
        ),
        lambda img: Image.fromarray(img[:, :, 0], "L").convert("LA"),
    ],
    ids=["rgb", "pal8", "pal2", "gray", "1bit", "rgba", "la"],
)
def test_matrix_exact_vs_host_library(maker, interlace):
    """Every PIL-writable colour type / depth, interlaced and not, decodes
    to exactly the host library's pixels (Adam7 included)."""
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (29, 37, 3), np.uint8)
    buf = io.BytesIO()
    maker(img).save(buf, "PNG", interlace=interlace)
    data = buf.getvalue()
    out = png_native.decode(data)
    assert out is not None
    np.testing.assert_array_equal(out, _pil(data))


def _craft_png(w, h, depth, color, rows, interlace=0):
    import struct

    def chunk(t, b):
        return (
            len(b).to_bytes(4, "big") + t + b
            + zlib.crc32(t + b).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize(
    "color,nch", [(2, 3), (6, 4), (4, 2)], ids=["rgb16", "rgba16", "la16"]
)
def test_16bit_exact_vs_host_library(color, nch):
    rng = np.random.default_rng(3)
    w, h = 23, 17
    px = rng.integers(0, 65535, (h, w, nch), np.uint16)
    rows = b"".join(
        b"\x00" + px[y].astype(">u2").tobytes() for y in range(h)
    )
    data = _craft_png(w, h, 16, color, rows)
    out = png_native.decode(data)
    np.testing.assert_array_equal(out, _pil(data))
    # 16 -> 8 bit takes the big-endian high byte (to_rgb8 semantics)
    np.testing.assert_array_equal(
        out[:, :, 0], (px[:, :, 0] >> 8).astype(np.uint8)
    )


def test_16bit_gray_high_byte_not_pil_clamp():
    """Deliberate divergence (parity ledger): 16-bit grayscale converts by
    high byte like the reference's to_rgb8, NOT PIL's I;16 clamp-at-255."""
    rng = np.random.default_rng(3)
    w, h = 23, 17
    pg = rng.integers(0, 65535, (h, w), np.uint16)
    rows = b"".join(
        b"\x00" + pg[y].astype(">u2").tobytes() for y in range(h)
    )
    data = _craft_png(w, h, 16, 0, rows)
    out = png_native.decode(data)
    np.testing.assert_array_equal(out[:, :, 0], (pg >> 8).astype(np.uint8))
    pil = _pil(data)
    assert (pil[:, :, 0] == 255).sum() > (out[:, :, 0] == 255).sum()


def test_16bit_adam7_and_filters_exact():
    rng = np.random.default_rng(5)
    w, h = 19, 13
    px = rng.integers(0, 65535, (h, w, 3), np.uint16)
    # interlaced, filter 0 rows per pass
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    blob = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            blob += b"\x00" + sub[y].astype(">u2").tobytes()
    data = _craft_png(w, h, 16, 2, bytes(blob), interlace=1)
    out = png_native.decode(data)
    np.testing.assert_array_equal(out, _pil(data))
    # sequential with sub+up filters at 16-bit bpp (6 bytes)
    rows16 = np.frombuffer(px.astype(">u2").tobytes(), np.uint8)
    rows16 = rows16.reshape(h, w * 6).astype(np.int16)
    blob = bytearray()
    f0 = rows16[0].copy()
    f0[6:] = (rows16[0][6:] - rows16[0][:-6]) % 256
    blob += b"\x01" + f0.astype(np.uint8).tobytes()
    for y in range(1, h):
        blob += b"\x02" + ((rows16[y] - rows16[y - 1]) % 256).astype(
            np.uint8
        ).tobytes()
    data = _craft_png(w, h, 16, 2, bytes(blob))
    out = png_native.decode(data)
    np.testing.assert_array_equal(out, _pil(data))


def test_corrupt_png_raises():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    data = bytearray(_png(img))
    data[60] ^= 0xFF  # corrupt IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        png_native.decode(bytes(data))
    # through the codec layer: TransformError (reference decode-garbage
    # parity, tests/transform.rs:102-120)
    with pytest.raises(TransformError):
        decode_bytes(bytes(data))


def test_env_switch_disables_native(monkeypatch):
    monkeypatch.setenv("IMAGEKIT_NO_NATIVE_PNG", "1")
    assert not png_native.available()
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    arr, _ = decode_bytes(_png(img))  # host library path still works
    np.testing.assert_array_equal(arr, img)


# -- GIF / BMP native decode (same host-unpack family) -----------------------


def _misc():
    mod = pytest.importorskip("imagekit_tpu.codecs.misc")
    if not mod.available():
        pytest.skip("native misc decoder unavailable")
    return mod


def test_bmp_24_and_palette_exact():
    misc = _misc()
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (60, 90, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "BMP")
    np.testing.assert_array_equal(misc.decode_bmp(buf.getvalue()), img)
    pimg = Image.fromarray(img).quantize(64)
    buf = io.BytesIO()
    pimg.save(buf, "BMP")
    np.testing.assert_array_equal(
        misc.decode_bmp(buf.getvalue()), np.asarray(pimg.convert("RGB"))
    )


def _craft_bmp(w, h, bpp, comp, pixdata, pal, ncol):
    import struct

    palette = b"".join(
        bytes([int(pal[i, 2]), int(pal[i, 1]), int(pal[i, 0]), 0])
        for i in range(ncol)
    )
    hdr_off = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(pixdata), 2835, 2835,
        ncol, 0,
    )
    filehdr = struct.pack(
        "<2sIHHI", b"BM", hdr_off + len(pixdata), 0, 0, hdr_off
    )
    return filehdr + info + palette + pixdata


def test_bmp_rle8_rle4_and_low_bpp():
    """RLE-compressed and 1/4-bit palette BMPs decode exactly (the
    reference's `image` crate handles these; PIL is the oracle)."""
    misc = _misc()
    rng = np.random.default_rng(9)
    w, h = 31, 17
    idx = rng.integers(0, 16, (h, w), np.uint8)
    pal = rng.integers(0, 255, (16, 3), np.uint8)

    rle8 = bytearray()
    for y in range(h - 1, -1, -1):
        x = 0
        while x < w:
            run = 1
            while x + run < w and idx[y, x + run] == idx[y, x] and run < 255:
                run += 1
            rle8 += bytes([run, idx[y, x]])
            x += run
        rle8 += b"\x00\x00"
    rle8[-2:] = b"\x00\x01"
    data = _craft_bmp(w, h, 8, 1, bytes(rle8), pal, 16)
    out = misc.decode_bmp(data)
    np.testing.assert_array_equal(out, np.asarray(Image.open(io.BytesIO(data)).convert("RGB")))
    np.testing.assert_array_equal(out, pal[idx])

    rle4 = bytearray()
    for y in range(h - 1, -1, -1):
        x = 0
        while x < w:
            v1 = int(idx[y, x])
            v2 = int(idx[y, x + 1]) if x + 1 < w else 0
            n = min(2, w - x)
            rle4 += bytes([n, (v1 << 4) | v2])
            x += n
        rle4 += b"\x00\x00"
    rle4[-2:] = b"\x00\x01"
    data = _craft_bmp(w, h, 4, 2, bytes(rle4), pal, 16)
    out = misc.decode_bmp(data)
    np.testing.assert_array_equal(out, np.asarray(Image.open(io.BytesIO(data)).convert("RGB")))
    np.testing.assert_array_equal(out, pal[idx])

    rows = bytearray()  # 4bpp uncompressed, MSB-first nibbles, 4B-aligned
    for y in range(h - 1, -1, -1):
        rb = bytearray()
        for x in range(0, w, 2):
            v1 = int(idx[y, x])
            v2 = int(idx[y, x + 1]) if x + 1 < w else 0
            rb.append((v1 << 4) | v2)
        while len(rb) % 4:
            rb.append(0)
        rows += rb
    data = _craft_bmp(w, h, 4, 0, bytes(rows), pal, 16)
    np.testing.assert_array_equal(
        misc.decode_bmp(data),
        np.asarray(Image.open(io.BytesIO(data)).convert("RGB")),
    )

    buf = io.BytesIO()  # 1bpp: PIL writes these natively for mode "1"
    Image.fromarray(idx > 7).save(buf, "BMP")
    np.testing.assert_array_equal(
        misc.decode_bmp(buf.getvalue()),
        np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB")),
    )


@pytest.mark.parametrize("h", [148, 149, 150, 151])  # every mod-4 residue
def test_gif_interlaced_all_height_residues(h):
    """Regression: the interlace pass-3 row count was off by one for
    heights = 2,3 (mod 4), writing one row past the canvas (found by a
    live soak crash — GPF in libc). PIL writes interlaced GIFs."""
    misc = _misc()
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (h, 37, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).quantize(64).save(buf, "GIF")
    data = buf.getvalue()
    out = misc.decode_gif(data)
    assert out is not None
    np.testing.assert_array_equal(
        out, np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    )


def test_gif_first_frame_exact():
    misc = _misc()
    yy, xx = np.mgrid[0:200, 0:300]
    grad = np.stack(
        [(xx * 255 // 300), (yy * 255 // 200), ((xx + yy) // 3 % 256)], -1
    ).astype(np.uint8)
    g = Image.fromarray(grad).quantize(256)
    for kw in ({}, {"interlace": True}):
        buf = io.BytesIO()
        g.save(buf, "GIF", **kw)
        ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        np.testing.assert_array_equal(misc.decode_gif(buf.getvalue()), ref)


def test_gif_transparency_matches_host_library():
    misc = _misc()
    from imagekit_tpu.codecs import pil_backend

    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    pt = Image.fromarray(img).quantize(32)
    buf = io.BytesIO()
    pt.save(buf, "GIF", transparency=3)
    out = misc.decode_gif(buf.getvalue())
    assert out.shape[2] == 4
    np.testing.assert_array_equal(out, pil_backend.decode(buf.getvalue()))


def test_gif_bmp_route_through_decode_bytes():
    _misc()
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (32, 40, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "BMP")
    arr, fmt = decode_bytes(buf.getvalue())
    assert fmt.value == "bmp"
    np.testing.assert_array_equal(arr, img)
    g = Image.fromarray(img).quantize(16)
    buf = io.BytesIO()
    g.save(buf, "GIF")
    arr, fmt = decode_bytes(buf.getvalue())
    assert fmt.value == "gif"
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(arr, ref)


def test_gif_corrupt_raises():
    misc = _misc()
    rng = np.random.default_rng(24)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    g = Image.fromarray(img).quantize(16)
    buf = io.BytesIO()
    g.save(buf, "GIF")
    data = bytearray(buf.getvalue())
    data = data[: len(data) // 2]  # truncate mid-LZW
    with pytest.raises(ValueError):
        misc.decode_gif(bytes(data))
