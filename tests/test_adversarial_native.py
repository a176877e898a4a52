"""Adversarial structural inputs for the native decoders.

The mutation fuzzer perturbs valid files; these tests construct
*structurally* hostile headers directly — mismatched counts, oversized
geometry, truncated payloads, out-of-range ids — and assert the decoders
reject them cleanly (error return, not a crash or silent overread).
"""

import ctypes
import struct
import zlib

import numpy as np
import pytest

from imagekit_tpu.codecs.native import loader

lib = loader.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native codec unavailable")


def _tiff_ifd(entries, tail=b"", order="<"):
    ifd = struct.pack(order + "H", len(entries))
    for t, ty, c, v in entries:
        ifd += struct.pack(order + "HHII", t, ty, c, v)
    ifd += struct.pack(order + "I", 0)
    magic = b"II\x2a\x00" if order == "<" else b"MM\x00\x2a"
    return magic + struct.pack(order + "I", 8) + ifd + tail


def _tiff_decode(data, w=8, h=8, ch=3):
    out = np.zeros((h, w, ch), np.uint8)
    lib.ik_tiff_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t
    ]
    return lib.ik_tiff_decode(data, len(data), out.ctypes.data, out.nbytes)


def test_tiff_tile_count_mismatch():
    # claims 2x2 tiles but provides offsets for only 1
    ents = [(256, 3, 1, 20), (257, 3, 1, 20), (259, 3, 1, 1), (262, 3, 1, 1),
            (277, 3, 1, 1), (322, 3, 1, 16), (323, 3, 1, 16),
            (324, 4, 1, 8), (325, 4, 1, 8)]
    assert _tiff_decode(_tiff_ifd(ents), 20, 20) < 0


def test_tiff_tile_dims_not_multiple_of_16():
    ents = [(256, 3, 1, 20), (257, 3, 1, 20), (259, 3, 1, 1), (262, 3, 1, 1),
            (277, 3, 1, 1), (322, 3, 1, 10), (323, 3, 1, 10),
            (324, 4, 4, 8), (325, 4, 4, 8)]
    assert _tiff_decode(_tiff_ifd(ents), 20, 20) < 0


def test_tiff_strip_offset_past_eof():
    ents = [(256, 3, 1, 8), (257, 3, 1, 8), (259, 3, 1, 1), (262, 3, 1, 1),
            (273, 4, 1, 1 << 30), (277, 3, 1, 1), (278, 3, 1, 8),
            (279, 4, 1, 192)]
    assert _tiff_decode(_tiff_ifd(ents)) < 0


def test_tiff_planar_strip_count_mismatch():
    # planar=2 with 3 samples needs 3x strips; provide 1
    ents = [(256, 3, 1, 4), (257, 3, 1, 4), (259, 3, 1, 1), (262, 3, 1, 2),
            (273, 4, 1, 8), (277, 3, 1, 3), (278, 3, 1, 4),
            (279, 4, 1, 16), (284, 3, 1, 2)]
    data = _tiff_ifd(ents, tail=bytes(64))
    assert _tiff_decode(data, 4, 4) < 0


def test_tiff_entry_value_array_past_eof():
    # BitsPerSample array pointer beyond the file
    ents = [(256, 3, 1, 8), (257, 3, 1, 8), (258, 3, 3, 1 << 28),
            (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 1, 8),
            (277, 3, 1, 3), (278, 3, 1, 8), (279, 4, 1, 192)]
    assert _tiff_decode(_tiff_ifd(ents)) < 0


def test_tiff_huge_dims_rejected():
    ents = [(256, 4, 1, 1 << 26), (257, 4, 1, 1 << 26), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1),
            (278, 3, 1, 8), (279, 4, 1, 8)]
    assert _tiff_decode(_tiff_ifd(ents)) < 0


def _alph(payload, w, h):
    out = np.zeros((h, w), np.uint8)
    lib.ik_webp_decode_alph.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
    ]
    return lib.ik_webp_decode_alph(payload, len(payload), w, h,
                                   out.ctypes.data)


def test_alph_truncated_raw():
    assert _alph(b"\x00" + bytes(10), 8, 8) < 0  # needs 64 bytes


def test_alph_reserved_bits_rejected():
    assert _alph(b"\xc0" + bytes(64), 8, 8) < 0


def test_alph_bad_compression():
    assert _alph(b"\x03" + bytes(64), 8, 8) < 0


def test_alph_truncated_vp8l_stream():
    assert _alph(b"\x01\x00", 16, 16) < 0


def _bmp_rle(pixdata, w=8, h=8, bpp=8, comp=1, ncol=4):
    palette = b"\x10\x20\x30\x00" * ncol
    hdr_off = 14 + 40 + len(palette)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                       len(pixdata), 0, 0, ncol, 0)
    filehdr = struct.pack("<2sIHHI", b"BM", hdr_off + len(pixdata), 0, 0,
                          hdr_off)
    return filehdr + info + palette + pixdata


def _bmp_decode(data, w=8, h=8):
    out = np.zeros((h, w, 3), np.uint8)
    lib.ik_bmp_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t
    ]
    return lib.ik_bmp_decode(data, len(data), out.ctypes.data, out.nbytes)


def test_bmp_rle_delta_past_top():
    # delta escape jumping above row 0 must be rejected, not wrap
    data = _bmp_rle(b"\x00\x02\x05\xff" + b"\x00\x01")
    assert _bmp_decode(data) < 0


def test_bmp_rle_runs_past_row_are_clamped():
    # 200-pixel run on an 8-wide row: decoder must not write out of bounds
    data = _bmp_rle(b"\xc8\x01" + b"\x00\x01")
    assert _bmp_decode(data) == 0  # clamped, in-bounds


def test_bmp_rle_absolute_mode_truncated():
    data = _bmp_rle(b"\x00\x30")  # absolute 48 indices, no data
    assert _bmp_decode(data) < 0


def test_bmp_rle_index_out_of_palette():
    # run of palette index 200 with a 4-entry palette
    data = _bmp_rle(b"\x04\xc8" + b"\x00\x01")
    assert _bmp_decode(data) < 0


def test_png_idat_declares_more_than_geometry():
    # valid 2x2 gray PNG whose inflate stream carries extra rows
    def chunk(t, b):
        return (len(b).to_bytes(4, "big") + t + b
                + zlib.crc32(t + b).to_bytes(4, "big"))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = (b"\x00\x01\x02" b"\x00\x03\x04") * 50  # 50x the needed rows
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = np.zeros((2, 2, 3), np.uint8)
    lib.ik_png_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t
    ]
    assert lib.ik_png_decode(data, len(data), out.ctypes.data, out.nbytes) < 0


def test_vp8l_dimension_mismatch_rejected():
    # header says 100x100 but the entropy stream ends after a few pixels
    from imagekit_tpu.codecs import vp8

    bits = bytearray()
    acc = nacc = 0

    def put(v, n):
        nonlocal acc, nacc
        acc |= v << nacc
        nacc += n
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    put(0x2F, 8)
    put(99, 14)
    put(99, 14)
    put(0, 1)
    put(0, 3)
    put(0, 1)  # no transforms -- then truncate mid-header
    body = bytes(bits) + (b"\x00" if nacc else b"")
    riff = (b"RIFF" + (4 + 8 + len(body)).to_bytes(4, "little") + b"WEBP"
            + b"VP8L" + len(body).to_bytes(4, "little") + body)
    with pytest.raises(ValueError):
        vp8.decode_lossless(riff)
