"""First-party AVIF (HEIF/MIAF) container writer.

Wraps an AV1 OBU stream from the in-process encoder (av1_image.py) into
a standalone .avif file: ftyp / meta(hdlr, pitm, iloc, iinf, iprp) /
mdat, with ispe + pixi + av1C + colr(nclx) properties and — when the
display size differs from the coded size — a CleanAperture crop, which
is how the encoder serves arbitrary dimensions from its certified
multiple-of-64 coding geometry (pad + clap; see av1_image.py).

The reference gets this layer from the `image` crate's AvifSerializer
(reference src/transform.rs:138-146); box layout here follows ISO
14496-12 + the AVIF spec §4, and is validated in tests against BOTH our
own parser (avif_native.parse_container) and the system libavif/PIL
decoder when present.
"""

from __future__ import annotations

import struct


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, payload: bytes, version: int = 0,
          flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def _av1c(seq_obu: bytes, seq_profile: int = 0, seq_level: int = 0,
          high_bd: bool = False, mono: bool = False,
          ssx: int = 1, ssy: int = 1, csp: int = 0) -> bytes:
    cfg = bytes((
        0x81,                                   # marker=1, version=1
        (seq_profile << 5) | seq_level,
        (0 << 7) | (int(high_bd) << 6) | (0 << 5) | (int(mono) << 4)
        | (ssx << 3) | (ssy << 2) | csp,
        0,                                      # no presentation delay
    ))
    return _box(b"av1C", cfg + seq_obu)


def _clap(coded_w: int, coded_h: int, w: int, h: int) -> bytes:
    """Top-left-anchored aperture: offset = (aperture - coded) / 2."""
    vals = (w, 1, h, 1, w - coded_w, 2, h - coded_h, 2)
    return _box(b"clap", struct.pack(">8i", *vals))


def write_avif(obu_stream: bytes, coded_w: int, coded_h: int,
               display_w: int | None = None, display_h: int | None = None,
               seq_obu: bytes = b"", mono: bool = False,
               cicp: tuple = (1, 13, 6), full_range: bool = False) -> bytes:
    """Assemble a complete still AVIF around one av01 item.

    `obu_stream` is the full stream (sequence header + frame OBUs);
    `seq_obu` optionally carries just the sequence-header OBU for the
    av1C configOBUs field (decoders accept it empty).  When
    display dims are given and smaller than the coded dims, a clap
    property crops the top-left aperture.
    """
    display_w = coded_w if display_w is None else display_w
    display_h = coded_h if display_h is None else display_h
    if not (0 < display_w <= coded_w and 0 < display_h <= coded_h):
        raise ValueError("display dims must fit inside coded dims")

    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0)
                + b"avif" + b"mif1" + b"miaf")

    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"pict"
                 + b"\0" * 12 + b"\0")
    pitm = _full(b"pitm", struct.pack(">H", 1))
    # iloc v0: 4-byte offsets/lengths, one extent; built twice — the
    # absolute file offset needs meta's size, which doesn't depend on
    # the offset's VALUE (fixed-width field)
    def iloc(offset: int) -> bytes:
        return _full(b"iloc", struct.pack(">BBH", 0x44, 0x00, 1)
                     + struct.pack(">HHH", 1, 0, 1)
                     + struct.pack(">II", offset, len(obu_stream)))

    iinf = _full(b"iinf", struct.pack(">H", 1) + _full(
        b"infe", struct.pack(">HH", 1, 0) + b"av01" + b"\0", version=2))

    props = [
        ("ispe", False,
         _full(b"ispe", struct.pack(">II", coded_w, coded_h))),
        ("pixi", False,
         _full(b"pixi", bytes((1 if mono else 3,))
               + bytes((8,) * (1 if mono else 3)))),
        ("av1C", True, _av1c(seq_obu, mono=mono)),
        ("colr", False,
         _box(b"colr", b"nclx" + struct.pack(">HHH", *cicp)
              + bytes((0x80 if full_range else 0x00,)))),
    ]
    if (display_w, display_h) != (coded_w, coded_h):
        props.append(("clap", True,
                      _clap(coded_w, coded_h, display_w, display_h)))
    ipco = _box(b"ipco", b"".join(p[2] for p in props))
    assoc = bytes(((0x80 if essential else 0) | (i + 1))
                  for i, (_, essential, _b) in enumerate(props))
    ipma = _full(b"ipma", struct.pack(">I", 1) + struct.pack(">H", 1)
                 + bytes((len(props),)) + assoc)
    iprp = _box(b"iprp", ipco + ipma)

    meta = _full(b"meta", hdlr + pitm + iloc(0) + iinf + iprp)
    mdat_off = len(ftyp) + len(meta) + 8   # payload starts after mdat hdr
    meta = _full(b"meta", hdlr + pitm + iloc(mdat_off) + iinf + iprp)
    mdat = _box(b"mdat", obu_stream)
    return ftyp + meta + mdat
