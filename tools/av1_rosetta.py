#!/usr/bin/env python3
"""Rosetta-stream instrument for the first-party AV1 residual layer.

The round-5 breakthrough need (ROADMAP item 1a): pin the transform-block
syntax chain + coefficient CDF tables against REAL aom output, without
the confounds that sank the earlier byte-fits (adaptive CDFs, unknown
tool state, header-width traps).  The trick: libavif's codec-specific
option passthrough reaches `aom_codec_set_option`, so we can make aom
emit *controlled* streams:

    cdf-update-mode=0        -> disable_cdf_update=1 (STATIC default CDFs:
                                the mirror parse needs no adaptation state)
    min/max-partition-size=32 -> the exact partition geometry our encoder
                                uses (32x32 leaves, TX_32X32 luma => the
                                DCT-only tx-set, no tx_type symbols)
    enable-cdef/restoration/filter-intra/palette/intrabc/angle-delta off,
    deltaq/aq off, use-intra-dct-only=1

Every header field is parsed by a COMPLETE spec-order reader (no guessed
widths — the round-5 notes document how header-width mistakes shift the
tile start and manufacture fake wins), then the tile is mirror-parsed
symbol by symbol with the project's own MsacDecoder and the extracted
default tables, and finally RE-ENCODED with MsacEncoder: byte-identical
tile output certifies interval arithmetic + tables + contexts + syntax
order simultaneously.

Usage:
    python tools/av1_rosetta.py            # run the standard Rosetta set
    python tools/av1_rosetta.py --trace    # with per-symbol trace
"""

from __future__ import annotations

import ctypes
import sys

import numpy as np

sys.path.insert(0, ".")

from imagekit_tpu.codecs import avif_encode as ae  # noqa: E402
from imagekit_tpu.codecs import avif_native  # noqa: E402
from imagekit_tpu.codecs.av1_entropy import (  # noqa: E402
    MsacDecoder, MsacEncoder, tables,
)

# ---------------------------------------------------------------------------
# Controlled encode


ROSETTA_OPTS = {
    "cdf-update-mode": 0,
    "enable-cdef": 0,
    "enable-restoration": 0,
    "enable-filter-intra": 0,
    "enable-intra-edge-filter": 0,
    "enable-angle-delta": 0,
    "enable-palette": 0,
    "enable-intrabc": 0,
    "deltaq-mode": 0,
    "aq-mode": 0,
    "min-partition-size": 32,
    "max-partition-size": 32,
    "use-intra-dct-only": 1,
    "enable-rect-tx": 0,
    "enable-tx64": 0,
    "enable-paeth-intra": 0,
    "enable-smooth-intra": 0,
    "enable-cfl-intra": 0,
    "enable-diagonal-intra": 0,
    "enable-directional-intra": 0,
    "reduced-tx-type-set": 1,
    "enable-rect-partitions": 0,
    "enable-ab-partitions": 0,
    "enable-1to4-partitions": 0,
}


def rosetta_opts(part_size: int = 32) -> dict:
    """The controlled-encode option set at a forced partition size.
    Sub-32 partitions make aom code the intra tx_type symbol (the
    reduced set, thanks to reduced-tx-set=1) — the chain the in-process
    encoder needs for exact-dimension edge blocks."""
    o = dict(ROSETTA_OPTS)
    o["min-partition-size"] = part_size
    o["max-partition-size"] = part_size
    return o


def encode_rosetta(y, cb, cr, qz: int, opts=None, speed: int = 6) -> bytes:
    """Controlled libavif encode -> raw AV1 OBU stream."""
    lib = ae._load()
    if lib is None:
        raise RuntimeError("libavif unavailable")
    lib.avifEncoderSetCodecSpecificOption.restype = None
    lib.avifEncoderSetCodecSpecificOption.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    h, w = y.shape
    img = lib.avifImageCreate(w, h, 8, ae._PIXEL_FORMAT_YUV420)
    out = ae._RWData()
    enc = None
    try:
        ctypes.c_int32.from_address(img + ae._IMG_YUV_RANGE).value = \
            ae._RANGE_LIMITED
        for i, v in enumerate(ae._CICP_VALUES):
            ctypes.c_uint16.from_address(img + ae._IMG_CICP + 2 * i).value = v
        if lib.avifImageAllocatePlanes(img, ae._PLANES_YUV) != 0:
            raise RuntimeError("plane alloc failed")
        planes = (ctypes.c_void_p * 3).from_address(img + ae._IMG_YUV_PLANES)
        rowbytes = (ctypes.c_uint32 * 3).from_address(
            img + ae._IMG_YUV_ROWBYTES)
        for idx, arr in ((0, y), (1, cb), (2, cr)):
            ae._copy_plane(planes[idx], rowbytes[idx], arr)
        enc = lib.avifEncoderCreate()
        for off, val in (
            (ae._ENC_CODEC_CHOICE, ae._state["codec"]),
            (ae._ENC_MAX_THREADS, 1),
            (ae._ENC_SPEED, speed),
            (ae._ENC_MIN_Q, qz),
            (ae._ENC_MAX_Q, qz),
            (ae._ENC_MIN_Q_ALPHA, 0),
            (ae._ENC_MAX_Q_ALPHA, 16),
        ):
            ctypes.c_int32.from_address(enc + off).value = val
        for k, v in (ROSETTA_OPTS if opts is None else opts).items():
            lib.avifEncoderSetCodecSpecificOption(
                enc, k.encode(), str(v).encode())
        res = lib.avifEncoderWrite(enc, img, ctypes.byref(out))
        if res != 0 or not out.size:
            raise RuntimeError(f"encode failed: {ae._result_str(lib, res)}")
        data = ctypes.string_at(out.data, out.size)
    finally:
        if out.data:
            lib.avifRWDataFree(ctypes.byref(out))
        if enc:
            lib.avifEncoderDestroy(enc)
        lib.avifImageDestroy(img)
    return avif_native.parse_container(data).obu


# ---------------------------------------------------------------------------
# Complete spec-order header parsing (no guessed widths)


class Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def f(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte_i, bit_i = self.pos >> 3, 7 - (self.pos & 7)
            out = (out << 1) | ((self.data[byte_i] >> bit_i) & 1)
            self.pos += 1
        return out

    def su(self, n: int) -> int:
        v = self.f(n)
        return v - (1 << n) if self.f(1) else v  # sign bit AFTER? spec su(): value then sign


def obu_split(stream: bytes):
    """-> list of (obu_type, payload bytes)."""
    out = []
    i = 0
    while i < len(stream):
        hdr = stream[i]
        assert not (hdr & 0x80), "forbidden bit"
        otype = (hdr >> 3) & 0xF
        ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        i += 1 + ext
        assert has_size
        size = 0
        shift = 0
        while True:
            b = stream[i]
            i += 1
            size |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                break
        out.append((otype, stream[i:i + size]))
        i += size
    return out


def tile_log2(blk: int, target: int) -> int:
    k = 0
    while (blk << k) < target:
        k += 1
    return k


def parse_seq_header(payload: bytes) -> dict:
    b = Bits(payload)
    s = {}
    s["seq_profile"] = b.f(3)
    s["still_picture"] = b.f(1)
    s["reduced"] = b.f(1)
    if s["reduced"]:
        s["seq_level_idx"] = b.f(5)
    else:
        if b.f(1):  # timing_info_present
            raise NotImplementedError("timing info")
        b.f(1)  # initial_display_delay_present (assumed 0 path)
        n_op = b.f(5) + 1
        for _ in range(n_op):
            b.f(12)
            lvl = b.f(5)
            if lvl > 7:
                b.f(1)
        s["seq_level_idx"] = lvl
    wbits = b.f(4) + 1
    hbits = b.f(4) + 1
    s["max_w"] = b.f(wbits) + 1
    s["max_h"] = b.f(hbits) + 1
    if not s["reduced"]:
        s["frame_id_numbers"] = b.f(1)
        if s["frame_id_numbers"]:
            b.f(4)
            b.f(3)
    s["use_128x128_superblock"] = b.f(1)
    s["enable_filter_intra"] = b.f(1)
    s["enable_intra_edge_filter"] = b.f(1)
    if not s["reduced"]:
        b.f(1)  # interintra_compound
        b.f(1)  # masked_compound
        b.f(1)  # warped_motion
        b.f(1)  # dual_filter
        s["enable_order_hint"] = b.f(1)
        if s["enable_order_hint"]:
            b.f(1)
            b.f(1)
        if b.f(1):  # seq_choose_screen_content_tools
            s["force_screen_content_tools"] = 2
        else:
            s["force_screen_content_tools"] = b.f(1)
        if s["force_screen_content_tools"] > 0:
            if b.f(1):
                s["force_integer_mv"] = 2
            else:
                s["force_integer_mv"] = b.f(1)
        else:
            s["force_integer_mv"] = 2
        if s["enable_order_hint"]:
            b.f(3)
    else:
        s["force_screen_content_tools"] = 2
        s["force_integer_mv"] = 2
    s["enable_superres"] = b.f(1)
    s["enable_cdef"] = b.f(1)
    s["enable_restoration"] = b.f(1)
    # color_config
    s["high_bitdepth"] = b.f(1)
    assert s["seq_profile"] != 2
    s["mono_chrome"] = b.f(1) if s["seq_profile"] != 1 else 0
    s["color_description_present"] = b.f(1)
    cp, tc, mc = 2, 2, 2
    if s["color_description_present"]:
        cp, tc, mc = b.f(8), b.f(8), b.f(8)
    s["cicp"] = (cp, tc, mc)
    if s["mono_chrome"]:
        s["color_range"] = b.f(1)
        s["subsampling"] = (1, 1)
    elif cp == 1 and tc == 13 and mc == 0:
        s["color_range"] = 1
        s["subsampling"] = (0, 0)
    else:
        s["color_range"] = b.f(1)
        if s["seq_profile"] == 0:
            s["subsampling"] = (1, 1)
        else:
            s["subsampling"] = (0, 0)
        if s["subsampling"] == (1, 1):
            s["chroma_sample_position"] = b.f(2)
        s["separate_uv_delta_q"] = b.f(1)
    s["film_grain"] = b.f(1)
    s["_bits_used"] = b.pos
    return s


def read_delta_q(b: Bits) -> int:
    if b.f(1):
        v = b.f(6)
        return v - 64 if b.f(1) else v  # su(6): 6 bits then sign? spec su(1+6)
    return 0


def parse_frame_header(b: Bits, seq: dict) -> dict:
    """Uncompressed header for a KEY frame (spec 5.9.2), complete for the
    intra still-picture cases aom/libavif emit.  Returns field dict; b is
    left positioned after byte_alignment (tile data start for frame OBU)."""
    f = {}
    if seq["reduced"]:
        f["show_existing_frame"] = 0
        f["frame_type"] = 0  # KEY
        f["show_frame"] = 1
        f["error_resilient"] = 0
    else:
        f["show_existing_frame"] = b.f(1)
        assert not f["show_existing_frame"]
        f["frame_type"] = b.f(2)
        assert f["frame_type"] == 0, "rosetta streams must be KEY"
        f["show_frame"] = b.f(1)
        if not f["show_frame"]:
            f["showable"] = b.f(1)
        f["error_resilient"] = 1 if f["show_frame"] else b.f(1)
    f["disable_cdf_update"] = b.f(1)
    if seq["force_screen_content_tools"] == 2:
        f["allow_screen_content_tools"] = b.f(1)
    else:
        f["allow_screen_content_tools"] = seq["force_screen_content_tools"]
    if f["allow_screen_content_tools"] and seq["force_integer_mv"] == 2:
        b.f(1)  # force_integer_mv (intra frames force it anyway)
    if seq.get("frame_id_numbers"):
        raise NotImplementedError("frame ids")
    if seq["reduced"]:
        f["frame_size_override"] = 0
    elif f["frame_type"] == 3:  # SWITCH
        f["frame_size_override"] = 1
    else:
        f["frame_size_override"] = b.f(1)
    # order hint skipped when disabled; current_frame_id skipped
    if not seq["reduced"] and seq.get("enable_order_hint"):
        raise NotImplementedError("order hints")
    # KEY && show_frame: no ref flags; frame_size()
    if f["frame_size_override"]:
        wbits = (seq["max_w"] - 1).bit_length()
        f["w"] = b.f(wbits) + 1
        hbits = (seq["max_h"] - 1).bit_length()
        f["h"] = b.f(hbits) + 1
    else:
        f["w"], f["h"] = seq["max_w"], seq["max_h"]
    # superres_params
    if seq["enable_superres"]:
        f["use_superres"] = b.f(1)
        if f["use_superres"]:
            b.f(3)
    # render_size
    f["render_and_frame_size_different"] = b.f(1)
    if f["render_and_frame_size_different"]:
        f["render_w"] = b.f(16) + 1
        f["render_h"] = b.f(16) + 1
    if f["allow_screen_content_tools"]:  # && UpscaledWidth == FrameWidth
        f["allow_intrabc"] = b.f(1)
    else:
        f["allow_intrabc"] = 0
    if not seq["reduced"]:
        # refresh_frame_flags: implied allFrames for shown KEY
        pass
    if not f["disable_cdf_update"]:
        f["disable_frame_end_update_cdf"] = 0
        # (error_resilient would force 1)
    # tile_info
    sb128 = seq["use_128x128_superblock"]
    sb_shift = 5 if sb128 else 4
    mi_cols = 2 * ((f["w"] + 7) >> 3)
    mi_rows = 2 * ((f["h"] + 7) >> 3)
    sb_cols = (mi_cols + (1 << sb_shift) - 1) >> sb_shift
    sb_rows = (mi_rows + (1 << sb_shift) - 1) >> sb_shift
    sb_size = sb_shift + 2
    max_tile_width_sb = 4096 >> sb_size
    max_tile_area_sb = (4096 * 2304) >> (2 * sb_size)
    min_log2_cols = tile_log2(max_tile_width_sb, sb_cols)
    max_log2_cols = tile_log2(1, min(sb_cols, 64))
    max_log2_rows = tile_log2(1, min(sb_rows, 64))
    min_log2_tiles = max(min_log2_cols,
                         tile_log2(max_tile_area_sb, sb_rows * sb_cols))
    f["uniform_tile_spacing"] = b.f(1)
    if f["uniform_tile_spacing"]:
        cols_log2 = min_log2_cols
        while cols_log2 < max_log2_cols:
            if b.f(1):
                cols_log2 += 1
            else:
                break
        min_log2_rows = max(min_log2_tiles - cols_log2, 0)
        rows_log2 = min_log2_rows
        while rows_log2 < max_log2_rows:
            if b.f(1):
                rows_log2 += 1
            else:
                break
        f["tile_cols_log2"], f["tile_rows_log2"] = cols_log2, rows_log2
        tile_w_sb = (sb_cols + (1 << cols_log2) - 1) >> cols_log2
        f["tile_cols"] = (sb_cols + tile_w_sb - 1) // tile_w_sb
        tile_h_sb = (sb_rows + (1 << rows_log2) - 1) >> rows_log2
        f["tile_rows"] = (sb_rows + tile_h_sb - 1) // tile_h_sb
    else:
        raise NotImplementedError("non-uniform tiles")
    if f["tile_cols_log2"] or f["tile_rows_log2"]:
        f["context_update_tile_id"] = b.f(
            f["tile_rows_log2"] + f["tile_cols_log2"])
        f["tile_size_bytes"] = b.f(2) + 1
    # quantization_params
    f["base_q_idx"] = b.f(8)
    f["DeltaQYDc"] = read_delta_q(b)
    if not seq["mono_chrome"]:
        diff_uv = b.f(1) if seq.get("separate_uv_delta_q") else 0
        f["DeltaQUDc"] = read_delta_q(b)
        f["DeltaQUAc"] = read_delta_q(b)
        if diff_uv:
            f["DeltaQVDc"] = read_delta_q(b)
            f["DeltaQVAc"] = read_delta_q(b)
    f["using_qmatrix"] = b.f(1)
    if f["using_qmatrix"]:
        b.f(4)
        b.f(4)
        if seq.get("separate_uv_delta_q") and f.get("diff_uv"):
            b.f(4)
    # segmentation_params
    f["segmentation_enabled"] = b.f(1)
    if f["segmentation_enabled"]:
        raise NotImplementedError("segmentation")
    # delta_q_params
    coded_lossless = (f["base_q_idx"] == 0 and f["DeltaQYDc"] == 0
                      and f.get("DeltaQUDc", 0) == 0
                      and f.get("DeltaQUAc", 0) == 0)
    f["coded_lossless"] = coded_lossless
    f["delta_q_present"] = b.f(1) if f["base_q_idx"] > 0 else 0
    if f["delta_q_present"]:
        f["delta_q_res"] = b.f(2)
        if not f["allow_intrabc"]:
            f["delta_lf_present"] = b.f(1)
            if f["delta_lf_present"]:
                b.f(2)
                b.f(1)
    # loop_filter_params
    if not (coded_lossless or f["allow_intrabc"]):
        f["lf_level"] = [b.f(6), b.f(6)]
        if not seq["mono_chrome"]:
            if f["lf_level"][0] or f["lf_level"][1]:
                f["lf_level"] += [b.f(6), b.f(6)]
        f["lf_sharpness"] = b.f(3)
        f["lf_delta_enabled"] = b.f(1)
        if f["lf_delta_enabled"]:
            if b.f(1):  # delta update
                for _ in range(8):  # TOTAL_REFS
                    if b.f(1):
                        b.su(6)
                for _ in range(2):
                    if b.f(1):
                        b.su(6)
    # cdef_params
    if seq["enable_cdef"] and not coded_lossless and not f["allow_intrabc"]:
        f["cdef_damping"] = b.f(2) + 3
        f["cdef_bits"] = b.f(2)
        f["cdef"] = []
        for _ in range(1 << f["cdef_bits"]):
            ypri = b.f(4)
            ysec = b.f(2)
            uvpri = b.f(4)
            uvsec = b.f(2)
            f["cdef"].append((ypri, ysec, uvpri, uvsec))
    # lr_params
    if seq["enable_restoration"] and not coded_lossless \
            and not f["allow_intrabc"]:
        f["lr_type"] = [b.f(2) for _ in range(3 if not seq["mono_chrome"]
                                              else 1)]
        if any(f["lr_type"]):
            raise NotImplementedError("lr units")
    # read_tx_mode
    f["tx_mode_select"] = 0 if coded_lossless else b.f(1)
    # frame_reference_mode: intra -> skip; skip_mode: not allowed -> skip
    # allow_warped_motion: intra -> skip
    f["reduced_tx_set"] = b.f(1)
    # global motion: intra -> none; film grain: absent
    if seq["film_grain"] and f["show_frame"]:
        fg = b.f(1)
        assert fg == 0, "film grain params"
    # byte_alignment before tile group
    while b.pos % 8:
        b.f(1)
    f["_tile_data_at"] = b.pos // 8
    return f


def split_tiles(payload: bytes, f: dict):
    """tile_group_obu (after frame header inside a FRAME OBU)."""
    n_tiles = f["tile_cols"] * f["tile_rows"]
    b = Bits(payload)
    if n_tiles > 1:
        start_end_present = b.f(1)
        if start_end_present:
            nb = f["tile_cols_log2"] + f["tile_rows_log2"]
            b.f(nb)
            b.f(nb)
        while b.pos % 8:
            b.f(1)
        off = b.pos // 8
    else:
        off = 0
    tiles = []
    tsb = f.get("tile_size_bytes", 4)
    for i in range(n_tiles):
        if i == n_tiles - 1:
            tiles.append(payload[off:])
        else:
            sz = int.from_bytes(payload[off:off + tsb], "little") + 1
            off += tsb
            tiles.append(payload[off:off + sz])
            off += sz
    return tiles


def parse_stream(stream: bytes, verbose: bool = True):
    """-> (seq dict, frame dict, [tile bytes])"""
    seq = frame = None
    tiles = None
    for otype, payload in obu_split(stream):
        if otype == 1:
            seq = parse_seq_header(payload)
        elif otype == 6:  # OBU_FRAME
            b = Bits(payload)
            frame = parse_frame_header(b, seq)
            tiles = split_tiles(payload[frame["_tile_data_at"]:], frame)
        elif otype == 3:  # OBU_FRAME_HEADER
            frame = parse_frame_header(Bits(payload), seq)
        elif otype == 4:  # OBU_TILE_GROUP
            tiles = split_tiles(payload, frame)
    if verbose:
        print("SEQ:", {k: v for k, v in seq.items() if not k.startswith("_")})
        print("FRAME:", {k: v for k, v in frame.items()
                         if not k.startswith("_")})
        print("TILES:", [t.hex() for t in tiles])
    return seq, frame, tiles


# ---------------------------------------------------------------------------


def main() -> int:
    trace = "--trace" in sys.argv
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:64, 0:64]
    grad = np.clip(40 + 2 * xx + yy, 0, 255).astype(np.uint8)
    waves = np.clip(128 + 50 * np.sin(yy / 7.0) * np.cos(xx / 11.0)
                    + rng.normal(0, 5, (64, 64)), 0, 255).astype(np.uint8)
    cb_g = np.clip(100 + np.mgrid[0:32, 0:32][0] * 2, 0,
                   255).astype(np.uint8)
    cr_g = np.full((32, 32), 120, np.uint8)
    cb_f = np.full((32, 32), 128, np.uint8)
    total = failures = 0
    cases = []
    for val in (160, 144, 192):
        cases.append((f"flat-{val}", np.full((64, 64), val, np.uint8),
                      cb_f, cb_f, 24, 32))
    for part in (32, 16, 8):
        for name, y in (("grad", grad), ("waves", waves)):
            for qz in (16, 40):
                cases.append((f"{name}-p{part}-q{qz}", y, cb_g, cr_g,
                              qz, part))
    for name, y, cb, cr, qz, part in cases:
        stream = encode_rosetta(y, cb, cr, qz=qz, opts=rosetta_opts(part))
        _seq, frame, _tiles = parse_stream(stream, verbose=False)
        if frame["tx_mode_select"]:
            # aom's RD picked TX_MODE_SELECT (per-block coded tx sizes) —
            # outside the TX_MODE_LARGEST regime the in-process encoder
            # emits, so there's nothing to certify here (there is no
            # codec option to force LARGEST; dense content at small
            # forced partitions tends to trip this)
            print(f"{name}: SKIP (tx_mode_select=1, {len(stream)} bytes)")
            continue
        print(f"{name} stream ({len(stream)} bytes)")
        for ok, _t, _re, p in mirror_roundtrip(stream, trace=trace,
                                               verbose=False):
            total += 1
            if not ok:
                failures += 1
            if p.txtypes:
                uniq = sorted(set(p.txtypes))
                print(f"    tx_type symbols: {len(p.txtypes)} coded, "
                      f"values {uniq}")
    print(f"{'OK' if not failures else 'FAIL'}: "
          f"{total - failures}/{total} tiles byte-exact")
    return 1 if failures else 0


# ---------------------------------------------------------------------------
# Tile mirror parser (spec 5.11 decode_partition/decode_block/coeffs order)
# for the Rosetta tool configuration: intra KEY frame, no screen content,
# no cdef/lr/segmentation/delta-q, TX_MODE_LARGEST, forced square blocks.

_INTRA_MODE_CTX = [0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0]
PARTITION_NONE, PARTITION_SPLIT = 0, 3


def _nsyms_partition(size):
    return 4 if size == 8 else (8 if size == 128 else 10)


class SymbolLog(list):
    """(label, icdf tuple, nsyms, sym) records — replayable into MsacEncoder."""

    def replay(self) -> bytes:
        enc = MsacEncoder()
        for _, icdf, n, sym in self:
            enc.encode_symbol(sym, icdf, n)
        return enc.done()


class TileParser:
    def __init__(self, w, h, qctx, trace=False, seq=None, frame=None):
        self.w, self.h = w, h
        self.qctx = qctx
        self.T = tables()
        self.trace = trace
        self.seq = seq or {}
        self.frame = frame or {}
        self.mi_cols = (w + 3) // 4
        self.mi_rows = (h + 3) // 4
        self.log = SymbolLog()
        self.dec = None
        # neighbor state (per 4x4)
        pad = 32
        self.above_part = np.zeros(self.mi_cols + pad, np.uint8)
        self.left_part = np.zeros(self.mi_rows + pad, np.uint8)
        self.above_skip = np.zeros(self.mi_cols + pad, np.uint8)
        self.left_skip = np.zeros(self.mi_rows + pad, np.uint8)
        self.above_mode = np.zeros(self.mi_cols + pad, np.uint8)
        self.left_mode = np.zeros(self.mi_rows + pad, np.uint8)
        self.above_ok = np.zeros(self.mi_cols + pad, bool)
        self.left_ok = np.zeros(self.mi_rows + pad, bool)
        # per-plane entropy contexts (cul_level | dc_cat<<6), luma at 4x4
        # granularity, chroma at chroma-4x4 granularity
        self.above_ent = [np.zeros(self.mi_cols + pad, np.uint8)
                          for _ in range(3)]
        self.left_ent = [np.zeros(self.mi_rows + pad, np.uint8)
                         for _ in range(3)]
        self.blocks = []          # parsed per-block info
        self.txtypes = []         # decoded luma tx_type symbols

    # -- plumbing ----------------------------------------------------------

    def S(self, label, icdf, n) -> int:
        icdf = tuple(int(x) for x in icdf[:n - 1])
        sym = self.dec.decode_symbol(icdf, n)
        self.log.append((label, icdf, n, sym))
        if self.trace:
            print(f"    {label}: sym={sym} (n={n})")
        return sym

    def L(self, label, bits) -> int:
        out = 0
        for i in range(bits):
            out = (out << 1) | self.S(f"{label}[{i}]", (1 << 14,), 2)
        return out

    def golomb(self, label) -> int:
        length = 1
        while self.L(f"{label}.pfx", 1) == 0:
            length += 1
            assert length <= 32
        x = 1
        for _ in range(length - 1):
            x = (x << 1) | self.L(f"{label}.bit", 1)
        return x - 1

    # -- residual ----------------------------------------------------------

    def parse_txb(self, plane, px_r, px_c, txsz_log2, blk_w_eq_tx=True,
                  ymode=0):
        """One transform block; returns (eob, quant dict pos->signed level).
        px_r/px_c are PLANE-pixel coords; txsz_log2 = log2(tx dim) (square).
        """
        T = self.T
        q = self.qctx
        ptype = 1 if plane else 0
        txs_ctx = txsz_log2 - 2          # square sizes: 4->0 .. 64->4? (32->3)
        n4 = 1 << (txsz_log2 - 2)        # tx span in (plane) 4x4 units
        er = px_r >> 2
        ec = px_c >> 2
        a_ent = self.above_ent[plane]
        l_ent = self.left_ent[plane]
        if plane == 0:
            skip_ctx = 0 if blk_w_eq_tx else self._luma_skip_ctx(er, ec, n4)
        else:
            above_nz = int((a_ent[ec:ec + n4] & 63).max() != 0 or
                           (a_ent[ec:ec + n4] >> 6).max() != 0)
            left_nz = int((l_ent[er:er + n4] & 63).max() != 0 or
                          (l_ent[er:er + n4] >> 6).max() != 0)
            skip_ctx = 7 + above_nz + left_nz
        all_zero = self.S(f"p{plane}.all_zero(ctx{skip_ctx})",
                          T["txb_skip"][q][txs_ctx][skip_ctx], 2)
        if all_zero == 1:
            a_ent[ec:ec + n4] = 0
            l_ent[er:er + n4] = 0
            return 0, {}
        # tx_type: coded for luma tx < 32x32 with coefficients (chroma
        # derives it; TX_32X32 is the DCT-only set).  With the rosetta
        # config's reduced-tx-set=1 every sub-32 intra tx uses
        # TX_SET_INTRA_2 (5 types) — CDF indexed [tx_size_sqr][y mode].
        side = 1 << txsz_log2
        if plane == 0 and txsz_log2 < 5 and self.frame.get("base_q_idx", 1) > 0:
            if not self.frame.get("reduced_tx_set") and txsz_log2 != 4:
                raise NotImplementedError("TX_SET_INTRA_1 (7-type) parse")
            txtp = self.S(f"p0.tx_type(sz{txsz_log2},m{ymode})",
                          T["intra_ext_tx2"][txsz_log2 - 2][ymode], 5)
            self.txtypes.append(txtp)
        # eob_pt
        nc = min(side, 32) * min(side, 32)
        name = {16: "eob_pt_16", 64: "eob_pt_64", 256: "eob_pt_256",
                1024: "eob_pt_1024"}[nc]
        nsyms = self.T[name].shape[-1] - 1
        eob_pt = self.S(f"p{plane}.eob_pt", T[name][q][ptype][0], nsyms) + 1
        if eob_pt < 3:
            eob = eob_pt
        else:
            eob = (1 << (eob_pt - 2)) + 1
            bit = self.S(f"p{plane}.eob_extra",
                         T["eob_extra"][q][txs_ctx][ptype][eob_pt - 3], 2)
            if bit:
                eob += 1 << (eob_pt - 3)
            for i in range(eob_pt - 4, -1, -1):
                if self.L(f"p{plane}.eob_bit", 1):
                    eob += 1 << i
        scan = {16: T["scan_4x4"], 64: T["scan_8x8"],
                256: T["scan_16x16"], 1024: T["scan_32x32"]}[nc]
        bwl = min(txsz_log2, 5)
        stride = (1 << bwl) + 4          # TX_PAD_HOR
        levels = np.zeros((min(side, 32) + 4) * stride + 16, np.int32)
        quant = {}
        for c in range(eob - 1, -1, -1):
            pos = int(scan[c])
            row, col = pos >> bwl, pos & ((1 << bwl) - 1)
            lp = row * stride + col
            if c == eob - 1:
                if c == 0:
                    bctx = 0
                elif c <= nc // 8:
                    bctx = 1
                elif c <= nc // 4:
                    bctx = 2
                else:
                    bctx = 3
                level = self.S(
                    f"p{plane}.base_eob(c{c},ctx{bctx})",
                    T["coeff_base_eob"][q][txs_ctx][ptype][bctx], 3) + 1
            else:
                mag = (min(int(levels[lp + 1]), 3)
                       + min(int(levels[lp + stride]), 3)
                       + min(int(levels[lp + stride + 1]), 3)
                       + min(int(levels[lp + 2]), 3)
                       + min(int(levels[lp + 2 * stride]), 3))
                bctx = min((mag + 1) >> 1, 4)
                if pos == 0:
                    bctx = 0
                elif row + col < 2:
                    bctx += 1
                elif row + col < 4:
                    bctx += 6
                else:
                    bctx += 21
                level = self.S(f"p{plane}.base(c{c},ctx{bctx})",
                               T["coeff_base"][q][txs_ctx][ptype][bctx], 4)
            if level > 2:
                mag = (min(int(levels[lp + 1]), 15)
                       + min(int(levels[lp + stride]), 15)
                       + min(int(levels[lp + stride + 1]), 15))
                brctx = min((mag + 1) >> 1, 6)
                if pos != 0:
                    brctx += 7 if (row < 2 and col < 2) else 14
                for _ in range(4):
                    br = self.S(f"p{plane}.br(c{c},ctx{brctx})",
                                T["coeff_br"][q][min(txs_ctx, 3)][ptype][brctx],
                                4)
                    level += br
                    if br < 3:
                        break
            levels[lp] = level
            if level:
                quant[pos] = level
        # forward pass: signs + golomb residues
        dc_sign = 0
        for c in range(eob):
            pos = int(scan[c])
            if pos in quant:
                if c == 0:
                    dcctx = self._dc_sign_ctx(plane, er, ec, n4)
                    sign = self.S(f"p{plane}.dc_sign(ctx{dcctx})",
                                  T["dc_sign"][q][ptype][dcctx], 2)
                    dc_sign = sign
                else:
                    sign = self.L(f"p{plane}.sign(c{c})", 1)
                if quant[pos] > 14:
                    quant[pos] = 15 + self.golomb(f"p{plane}.golomb(c{c})")
                if sign:
                    quant[pos] = -quant[pos]
        # entropy context: cul_level + dc category
        cul = min(63, sum(abs(v) for v in quant.values()))
        dc = quant.get(0, 0)
        cat = (1 if dc < 0 else 2) if dc else 0
        ent = cul | (cat << 6)
        a_ent[ec:ec + n4] = ent
        l_ent[er:er + n4] = ent
        return eob, quant

    def _luma_skip_ctx(self, er, ec, n4):
        raise NotImplementedError("luma txb_skip ctx for tx < block")

    def _dc_sign_ctx(self, plane, er, ec, n4):
        a = self.above_ent[plane][ec:ec + n4] >> 6
        l = self.left_ent[plane][er:er + n4] >> 6
        dcsum = 0
        for v in list(a) + list(l):
            if v == 1:
                dcsum -= 1
            elif v == 2:
                dcsum += 1
        if dcsum < 0:
            return 1
        if dcsum > 0:
            return 2
        return 0

    # -- block / partition ---------------------------------------------------

    def parse_block(self, mi_r, mi_c, size):
        if self.trace:
            print(f"  block {size}x{size} @mi({mi_r},{mi_c})")
        T = self.T
        n4 = size >> 2
        actx = int(self.above_skip[mi_c]) if self.above_ok[mi_c] else 0
        lctx = int(self.left_skip[mi_r]) if self.left_ok[mi_r] else 0
        # aom semantics: the decoded symbol IS the skip flag (sym0 = not
        # skip -> residual follows).  The old gray-stream pin of
        # "sym0 = skip" was parse-tolerance, not truth (all-gray decodes
        # bit-exact under EVERY variant tested).
        skip = self.S(f"skip(ctx{actx + lctx})",
                      T["skip"][actx + lctx], 2)
        notskip = 1 - skip
        am = _INTRA_MODE_CTX[int(self.above_mode[mi_c])] \
            if self.above_ok[mi_c] else 0
        lm = _INTRA_MODE_CTX[int(self.left_mode[mi_r])] \
            if self.left_ok[mi_r] else 0
        ymode = self.S(f"ymode(ctx{am},{lm})", T["kf_y_mode"][am][lm], 13)
        if 1 <= ymode <= 8 and size >= 8:
            # directional mode: angle_delta is ALWAYS coded (the encoder
            # option only forces its value); CDF row = mode - V_PRED
            self.S(f"angle_delta_y(m{ymode})",
                   T["angle_delta"][ymode - 1], 7)
        # chroma present for all sizes >= 8 under 4:2:0 with square blocks.
        # cfl_allowed = w<=32 && h<=32 (spec) -> 32x32 DOES use the
        # 14-symbol CFL-flavoured table; the old "<32" pin came from
        # parse-tolerant gray streams and was wrong.
        if size <= 32:
            uv = self.S("uvmode(cfl)", T["uv_mode"][1][ymode], 14)
        else:
            uv = self.S("uvmode", T["uv_mode"][0][ymode], 13)
        if uv == 13:
            raise NotImplementedError("CFL alphas")  # 14-sym table only
        if 1 <= uv <= 8 and size >= 8:
            self.S(f"angle_delta_uv(m{uv})", T["angle_delta"][uv - 1], 7)
        if self.seq.get("enable_filter_intra") and size <= 32 and ymode == 0:
            bidx = {8: 3, 16: 6, 32: 9}[size]
            fi = self.S("use_filter_intra", T["filter_intra"][bidx], 2)
            if fi:
                raise NotImplementedError("filter intra mode")
        binfo = {"mi": (mi_r, mi_c), "size": size, "skip": not notskip,
                 "ymode": ymode, "uvmode": uv, "txbs": []}
        if notskip:
            # residual: luma tx at block size (largest), then U, then V
            txl = size.bit_length() - 1  # log2(size)
            eob, quant = self.parse_txb(0, mi_r * 4, mi_c * 4, txl,
                                        ymode=ymode)
            binfo["txbs"].append(("Y", eob, quant))
            ctxl = txl - 1                # chroma tx = half size (4:2:0)
            for pl in (1, 2):
                eob, quant = self.parse_txb(pl, mi_r * 2, mi_c * 2, ctxl)
                binfo["txbs"].append(("UV"[pl - 1], eob, quant))
        else:
            # skip blocks clear entropy contexts
            self.above_ent[0][mi_c:mi_c + n4] = 0
            self.left_ent[0][mi_r:mi_r + n4] = 0
            cn4 = max(n4 >> 1, 1)
            for pl in (1, 2):
                self.above_ent[pl][mi_c // 2:mi_c // 2 + cn4] = 0
                self.left_ent[pl][mi_r // 2:mi_r // 2 + cn4] = 0
        # neighbor ctx counts SKIPPED neighbors (aom skip_context)
        self.above_skip[mi_c:mi_c + n4] = 1 - notskip
        self.left_skip[mi_r:mi_r + n4] = 1 - notskip
        self.above_mode[mi_c:mi_c + n4] = ymode
        self.left_mode[mi_r:mi_r + n4] = ymode
        self.above_ok[mi_c:mi_c + n4] = True
        self.left_ok[mi_r:mi_r + n4] = True
        self.blocks.append(binfo)


    def _split_bool_icdf(self, ctx_row, size, horz):
        icdf = self.T["partition"][ctx_row]
        n = _nsyms_partition(size)

        def prob(sym):
            hi = 32768 if sym == 0 else int(icdf[sym - 1])
            lo = 0 if sym == n - 1 else int(icdf[sym])
            return hi - lo

        horz_set = [1, 3, 4, 5, 6]
        vert_set = [2, 3, 6, 7, 4]
        if size != 128:
            horz_set.append(8)
            vert_set.append(9)
        use = horz_set if horz else vert_set
        return (sum(prob(x) for x in use if x < n),)

    def _part_ctx(self, mi_r, mi_c, size):
        bsl = size.bit_length() - 4
        above = (int(self.above_part[mi_c]) >> bsl) & 1
        left = (int(self.left_part[mi_r]) >> bsl) & 1
        return bsl * 4 + left * 2 + above

    def _update_part(self, mi_r, mi_c, size, leaf):
        n4 = size >> 2
        v = (0xF << (leaf.bit_length() - 3)) & 0xF
        self.above_part[mi_c:mi_c + n4] = v
        self.left_part[mi_r:mi_r + n4] = v

    def parse_partition(self, mi_r, mi_c, size):
        if mi_r >= self.mi_rows or mi_c >= self.mi_cols:
            return
        n4 = size >> 2
        half = n4 >> 1
        full = (mi_r + n4) <= self.mi_rows and (mi_c + n4) <= self.mi_cols
        has_rows = (mi_r + half) < self.mi_rows
        has_cols = (mi_c + half) < self.mi_cols
        ctx_row = self._part_ctx(mi_r, mi_c, size)
        if not full:
            if has_rows and has_cols:
                part = self.S(f"partition{size}(ctx{ctx_row})",
                              self.T["partition"][ctx_row],
                              _nsyms_partition(size))
                assert part == PARTITION_SPLIT
            elif has_cols:
                part = PARTITION_SPLIT if self.S(
                    f"split_or_horz{size}", self._split_bool_icdf(
                        ctx_row, size, horz=True), 2) else 1
                assert part == PARTITION_SPLIT, "HORZ leaf unsupported"
            elif has_rows:
                part = PARTITION_SPLIT if self.S(
                    f"split_or_vert{size}", self._split_bool_icdf(
                        ctx_row, size, horz=False), 2) else 2
                assert part == PARTITION_SPLIT, "VERT leaf unsupported"
            else:
                part = PARTITION_SPLIT  # implied, no bits
        else:
            # a partition symbol is coded at EVERY square size >= 8
            # (at 8x8 it is the 4-type CDF whose SPLIT reaches 4x4)
            part = self.S(f"partition{size}(ctx{ctx_row})",
                          self.T["partition"][ctx_row],
                          _nsyms_partition(size))
        if part == PARTITION_NONE:
            self.parse_block(mi_r, mi_c, size)
            self._update_part(mi_r, mi_c, size, size)
            return
        if part != PARTITION_SPLIT:
            raise NotImplementedError(f"partition type {part}")
        sub = size >> 1
        self.parse_partition(mi_r, mi_c, sub)
        self.parse_partition(mi_r, mi_c + half, sub)
        self.parse_partition(mi_r + half, mi_c, sub)
        self.parse_partition(mi_r + half, mi_c + half, sub)

    def parse(self, tile: bytes):
        self.dec = MsacDecoder(tile)
        for sb_r in range(0, self.mi_rows, 16):
            for sb_c in range(0, self.mi_cols, 16):
                self.parse_partition(sb_r, sb_c, 64)
        return self


def q_ctx(base_q_idx: int) -> int:
    if base_q_idx <= 20:
        return 0
    if base_q_idx <= 60:
        return 1
    if base_q_idx <= 120:
        return 2
    return 3


def mirror_roundtrip(stream: bytes, trace: bool = False,
                     verbose: bool = True):
    seq, frame, tiles = parse_stream(stream, verbose=trace)
    results = []
    for t in tiles:
        p = TileParser(frame["w"], frame["h"], q_ctx(frame["base_q_idx"]),
                       trace=trace, seq=seq, frame=frame)
        p.parse(t)
        re = p.log.replay()
        ok = re == t
        results.append((ok, t, re, p))
        if not verbose and ok:
            continue
        print(f"  tile {t.hex()} -> reenc {re.hex()} "
              f"{'BYTE-EXACT' if ok else 'MISMATCH'}")
        for blk in p.blocks:
            print(f"    {blk['size']}x{blk['size']} skip={blk['skip']} "
                  f"ymode={blk['ymode']} uv={blk['uvmode']} "
                  f"txbs={[(n, e, q) for n, e, q in blk['txbs']]}")
    return results


if __name__ == "__main__":
    sys.exit(main())
