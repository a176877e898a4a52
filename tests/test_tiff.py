"""Native baseline-TIFF decoder tests (codecs/native/tiff_decode.cpp).

Exact-pixel parity with the host library across PIL's writable matrix
(gray/palette/RGB/RGBA x none/LZW/PackBits), plus hand-crafted files for
the paths PIL never writes: big-endian, multi-strip, white-is-zero,
LZW + horizontal-differencing predictor. The reference decodes TIFF via
the `image` crate (src/transform.rs:27-43).
"""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from imagekit_tpu.codecs import SourceFormat, decode_bytes

tiff_native = pytest.importorskip("imagekit_tpu.codecs.tiff")

pytestmark = pytest.mark.skipif(
    not tiff_native.available(), reason="native codec unavailable"
)


def _img():
    rng = np.random.default_rng(1)
    return rng.integers(0, 255, (33, 47, 3), np.uint8)


@pytest.mark.parametrize("comp", [None, "tiff_lzw", "packbits"])
@pytest.mark.parametrize("kind", ["rgb", "gray", "pal", "rgba"])
def test_matrix_exact_vs_host_library(kind, comp):
    img = _img()
    im = {
        "rgb": lambda: Image.fromarray(img),
        "gray": lambda: Image.fromarray(img[:, :, 0], "L"),
        "pal": lambda: Image.fromarray(img).quantize(50),
        "rgba": lambda: Image.fromarray(
            np.dstack([img, img[:, :, 0]]), "RGBA"
        ),
    }[kind]()
    buf = io.BytesIO()
    im.save(buf, "TIFF", **({"compression": comp} if comp else {}))
    data = buf.getvalue()
    out = tiff_native.decode(data)
    assert out is not None
    mode = "RGBA" if kind == "rgba" else "RGB"
    np.testing.assert_array_equal(
        out, np.asarray(Image.open(io.BytesIO(data)).convert(mode))
    )


def test_lzw_table_growth_and_runs():
    rng = np.random.default_rng(2)
    for px in (
        rng.integers(0, 255, (180, 220, 3), np.uint8),  # code-width growth
        np.stack(  # long runs -> KwKwK
            [np.tile(np.arange(160)[:, None], (1, 200)) % 256,
             np.zeros((160, 200)), np.full((160, 200), 7)], -1
        ).astype(np.uint8),
    ):
        buf = io.BytesIO()
        Image.fromarray(px).save(buf, "TIFF", compression="tiff_lzw")
        out = tiff_native.decode(buf.getvalue())
        np.testing.assert_array_equal(out, px)


def _be_gray_tiff(px, photometric=1, rows_per_strip=5):
    """Big-endian, multi-strip, uncompressed grayscale."""
    h, w = px.shape
    strips = [px[y:y + rows_per_strip].tobytes()
              for y in range(0, h, rows_per_strip)]
    ns = len(strips)
    body = b"".join(strips)
    offs, pos = [], 8
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos
    n = 9
    arrays = ifd_off + 2 + n * 12 + 4
    ents = [
        (256, 3, 1, w << 16), (257, 3, 1, h << 16), (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16), (262, 3, 1, photometric << 16),
        (273, 4, ns, arrays if ns > 1 else offs[0]),
        (277, 3, 1, 1 << 16), (278, 3, 1, rows_per_strip << 16),
        (279, 4, ns, (arrays + 4 * ns) if ns > 1 else len(strips[0])),
    ]
    ifd = struct.pack(">H", n)
    for t, ty, c, v in sorted(ents):
        ifd += struct.pack(">HHII", t, ty, c, v)
    ifd += struct.pack(">I", 0)
    data = b"MM\x00\x2a" + struct.pack(">I", ifd_off) + body + ifd
    if ns > 1:
        data += b"".join(struct.pack(">I", o) for o in offs)
        data += b"".join(struct.pack(">I", len(s)) for s in strips)
    return data


@pytest.mark.parametrize("photometric", [1, 0])
def test_big_endian_multistrip(photometric):
    rng = np.random.default_rng(3)
    g = rng.integers(0, 255, (17, 23), np.uint8)
    data = _be_gray_tiff(g, photometric=photometric)
    out = tiff_native.decode(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(out, ref)
    expect = (255 - g) if photometric == 0 else g
    np.testing.assert_array_equal(out[:, :, 0], expect)


def _lzw_encode(raw: bytes) -> bytes:
    """Minimal TIFF-variant LZW encoder (MSB-first, early change)."""
    out = bytearray()
    acc = bits = 0

    def put(code, width):
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    put(256, width)  # clear
    w = b""
    for ch in raw:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = nxt
        nxt += 1
        # encoder runs one table entry ahead of the decoder, so with the
        # TIFF early-change rule it bumps at 1<<width (decoder at -1)
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        w = bytes([ch])
    if w:
        put(table[w], width)
    put(257, width)  # EOI
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_with_predictor():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 255, (21, 17, 3), np.uint8)
    diff = px.astype(np.int16).copy()
    diff[:, 1:, :] = (
        px[:, 1:, :].astype(np.int16) - px[:, :-1, :].astype(np.int16)
    ) % 256
    comp = _lzw_encode(diff.astype(np.uint8).tobytes())
    h, w = 21, 17
    ents = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None),
            (259, 3, 1, 5), (262, 3, 1, 2), (273, 4, 1, None),
            (277, 3, 1, 3), (278, 3, 1, h), (279, 4, 1, len(comp)),
            (317, 3, 1, 2)]
    n = len(ents)
    bps_off = 8 + 2 + n * 12 + 4
    strip_off = bps_off + 6
    ifd = struct.pack("<H", n)
    for t, ty, c, v in ents:
        if t == 258:
            v = bps_off
        if t == 273:
            v = strip_off
        ifd += struct.pack("<HHII", t, ty, c, v)
    ifd += struct.pack("<I", 0)
    data = (b"II\x2a\x00" + struct.pack("<I", 8) + ifd
            + struct.pack("<HHH", 8, 8, 8) + comp)
    out = tiff_native.decode(data)
    np.testing.assert_array_equal(out, px)
    # host library agrees (proves the crafted file is well-formed)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_16bit_gray_high_byte():
    rng = np.random.default_rng(6)
    g16 = rng.integers(0, 65535, (25, 31), np.uint16)
    for comp in (None, "tiff_lzw"):
        buf = io.BytesIO()
        im = Image.new("I;16", (31, 25))
        im.frombytes(g16.astype("<u2").tobytes())
        im.save(buf, "TIFF", **({"compression": comp} if comp else {}))
        out = tiff_native.decode(buf.getvalue())
        assert out is not None
        np.testing.assert_array_equal(out[:, :, 0], (g16 >> 8).astype(np.uint8))


def test_16bit_rgb_lzw_predictor():
    """Crafted 16-bit RGB with LZW + horizontal differencing: the
    predictor must add 16-bit lanes (not bytes) before the high-byte
    conversion."""
    rng = np.random.default_rng(7)
    h, w = 11, 13
    px = rng.integers(0, 65535, (h, w, 3), np.uint16)
    diff = px.astype(np.int32).copy()
    diff[:, 1:, :] = (
        px[:, 1:, :].astype(np.int32) - px[:, :-1, :].astype(np.int32)
    ) % 65536
    comp = _lzw_encode(diff.astype("<u2").tobytes())
    ents = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None),
            (259, 3, 1, 5), (262, 3, 1, 2), (273, 4, 1, None),
            (277, 3, 1, 3), (278, 3, 1, h), (279, 4, 1, len(comp)),
            (317, 3, 1, 2)]
    n = len(ents)
    bps_off = 8 + 2 + n * 12 + 4
    strip_off = bps_off + 6
    ifd = struct.pack("<H", n)
    for t, ty, c, v in ents:
        if t == 258:
            v = bps_off
        if t == 273:
            v = strip_off
        ifd += struct.pack("<HHII", t, ty, c, v)
    ifd += struct.pack("<I", 0)
    data = (b"II\x2a\x00" + struct.pack("<I", 8) + ifd
            + struct.pack("<HHH", 16, 16, 16) + comp)
    out = tiff_native.decode(data)
    assert out is not None
    np.testing.assert_array_equal(out, (px >> 8).astype(np.uint8))
    # host library agrees on the crafted file
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_decode_bytes_routes_tiff():
    img = _img()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "TIFF", compression="tiff_lzw")
    arr, fmt = decode_bytes(buf.getvalue())
    assert fmt == SourceFormat.tiff
    np.testing.assert_array_equal(arr, img)


def _craft_tiled(px, tw, th, compression):
    h, w = px.shape[:2]
    tx, ty = (w + tw - 1) // tw, (h + th - 1) // th
    tiles = []
    for t in range(tx * ty):
        ox, oy = (t % tx) * tw, (t // tx) * th
        tile = np.zeros((th, tw, 3), np.uint8)
        ch, cw = min(th, h - oy), min(tw, w - ox)
        tile[:ch, :cw] = px[oy:oy + ch, ox:ox + cw]
        raw = tile.tobytes()
        tiles.append(_lzw_encode(raw) if compression == 5 else raw)
    ents = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None),
            (259, 3, 1, compression), (262, 3, 1, 2), (277, 3, 1, 3),
            (322, 3, 1, tw), (323, 3, 1, th),
            (324, 4, len(tiles), None), (325, 4, len(tiles), None)]
    n = len(ents)
    bps_off = 8 + 2 + n * 12 + 4
    toffs_off = bps_off + 6
    tcnts_off = toffs_off + 4 * len(tiles)
    pos = tcnts_off + 4 * len(tiles)
    offs = []
    for tdat in tiles:
        offs.append(pos)
        pos += len(tdat)
    ifd = struct.pack("<H", n)
    for t, ty_, c, v in ents:
        if t == 258:
            v = bps_off
        if t == 324:
            v = toffs_off
        if t == 325:
            v = tcnts_off
        ifd += struct.pack("<HHII", t, ty_, c, v)
    ifd += struct.pack("<I", 0)
    return (b"II\x2a\x00" + struct.pack("<I", 8) + ifd
            + struct.pack("<HHH", 8, 8, 8)
            + b"".join(struct.pack("<I", o) for o in offs)
            + b"".join(struct.pack("<I", len(t)) for t in tiles)
            + b"".join(tiles))


@pytest.mark.parametrize("compression", [1, 5], ids=["raw", "lzw"])
def test_tiled_decode_exact(compression):
    """Tiled TIFF (tags 322-325): padded edge tiles place clipped."""
    rng = np.random.default_rng(8)
    px = rng.integers(0, 255, (37, 53, 3), np.uint8)
    data = _craft_tiled(px, 16, 16, compression)
    out = tiff_native.decode(data)
    assert out is not None
    np.testing.assert_array_equal(out, px)
    np.testing.assert_array_equal(
        out, np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    )


def test_corrupt_tiff_raises():
    img = _img()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "TIFF", compression="tiff_lzw")
    data = bytearray(buf.getvalue())
    data = data[: len(data) // 3]  # truncate strip data
    with pytest.raises(ValueError):
        tiff_native.decode(bytes(data))


def _craft_planar(px, rps, compression):
    h, w = px.shape[:2]
    strips = []
    for c in range(3):
        for y0 in range(0, h, rps):
            raw = np.ascontiguousarray(px[y0:y0 + rps, :, c]).tobytes()
            strips.append(_lzw_encode(raw) if compression == 5 else raw)
    ents = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None),
            (259, 3, 1, compression), (262, 3, 1, 2),
            (273, 4, len(strips), None), (277, 3, 1, 3), (278, 3, 1, rps),
            (279, 4, len(strips), None), (284, 3, 1, 2)]
    n = len(ents)
    bps_off = 8 + 2 + n * 12 + 4
    soffs_off = bps_off + 6
    scnts_off = soffs_off + 4 * len(strips)
    pos = scnts_off + 4 * len(strips)
    offs = []
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd = struct.pack("<H", n)
    for t, ty, c, v in ents:
        if t == 258:
            v = bps_off
        if t == 273:
            v = soffs_off
        if t == 279:
            v = scnts_off
        ifd += struct.pack("<HHII", t, ty, c, v)
    ifd += struct.pack("<I", 0)
    return (b"II\x2a\x00" + struct.pack("<I", 8) + ifd
            + struct.pack("<HHH", 8, 8, 8)
            + b"".join(struct.pack("<I", o) for o in offs)
            + b"".join(struct.pack("<I", len(s)) for s in strips)
            + b"".join(strips))


@pytest.mark.parametrize("compression", [1, 5], ids=["raw", "lzw"])
def test_planar_decode_exact(compression):
    """PlanarConfiguration=2: per-component strip planes interleave."""
    rng = np.random.default_rng(10)
    px = rng.integers(0, 255, (29, 41, 3), np.uint8)
    data = _craft_planar(px, 10, compression)
    out = tiff_native.decode(data)
    assert out is not None
    np.testing.assert_array_equal(out, px)
    np.testing.assert_array_equal(
        out, np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    )


@pytest.mark.parametrize("compression", [1, 5], ids=["raw", "lzw"])
def test_planar_tiled_decode_exact(compression):
    """Planar + tiled: one tile grid per component, grouped by plane."""
    rng = np.random.default_rng(12)
    h, w, tw, th = 37, 53, 16, 16
    px = rng.integers(0, 255, (h, w, 3), np.uint8)
    tx, ty = (w + tw - 1) // tw, (h + th - 1) // th
    tiles = []
    for c in range(3):
        for t in range(tx * ty):
            ox, oy = (t % tx) * tw, (t // tx) * th
            tile = np.zeros((th, tw), np.uint8)
            ch_, cw_ = min(th, h - oy), min(tw, w - ox)
            tile[:ch_, :cw_] = px[oy:oy + ch_, ox:ox + cw_, c]
            raw = tile.tobytes()
            tiles.append(_lzw_encode(raw) if compression == 5 else raw)
    ents = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None),
            (259, 3, 1, compression), (262, 3, 1, 2), (277, 3, 1, 3),
            (284, 3, 1, 2), (322, 3, 1, tw), (323, 3, 1, th),
            (324, 4, len(tiles), None), (325, 4, len(tiles), None)]
    n = len(ents)
    bps_off = 8 + 2 + n * 12 + 4
    toffs = bps_off + 6
    tcnts = toffs + 4 * len(tiles)
    pos = tcnts + 4 * len(tiles)
    offs = []
    for td in tiles:
        offs.append(pos)
        pos += len(td)
    ifd = struct.pack("<H", n)
    for t, ty_, c, v in ents:
        if t == 258:
            v = bps_off
        if t == 324:
            v = toffs
        if t == 325:
            v = tcnts
        ifd += struct.pack("<HHII", t, ty_, c, v)
    ifd += struct.pack("<I", 0)
    data = (b"II\x2a\x00" + struct.pack("<I", 8) + ifd
            + struct.pack("<HHH", 8, 8, 8)
            + b"".join(struct.pack("<I", o) for o in offs)
            + b"".join(struct.pack("<I", len(t)) for t in tiles)
            + b"".join(tiles))
    out = tiff_native.decode(data)
    assert out is not None
    np.testing.assert_array_equal(out, px)
    np.testing.assert_array_equal(
        out, np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    )


def test_deflate_strips_exact():
    from tests.conftest import make_test_image
    """Deflate-compressed TIFF (compression 8) decodes natively and
    bit-exactly — round-3 addition (zlib per strip, predictor honoured
    like the LZW class)."""
    for mode in ("RGB", "L", "RGBA"):
        img = make_test_image(201, 143)
        pil = Image.fromarray(img).convert(mode)
        buf = io.BytesIO()
        pil.save(buf, "TIFF", compression="tiff_deflate")
        data = buf.getvalue()
        out = tiff_native.decode(data)
        assert out is not None, f"native path declined deflate ({mode})"
        ref = np.asarray(Image.open(io.BytesIO(data)).convert(
            "RGBA" if out.shape[-1] == 4 else "RGB"))
        np.testing.assert_array_equal(out, ref)


def test_deflate_garbage_strips_reject():
    from tests.conftest import make_test_image

    img = make_test_image(64, 48)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "TIFF", compression="tiff_deflate")
    data = bytearray(buf.getvalue())
    # corrupt the strip payload (past the 8-byte header + IFD head)
    data[len(data) // 2:len(data) // 2 + 16] = b"\xff" * 16
    with pytest.raises(ValueError):  # malformed -> 400, like the
        tiff_native.decode(bytes(data))  # reference's decode error
