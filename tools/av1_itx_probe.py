#!/usr/bin/env python3
"""Certify av1_itx (integer inverse DCT + dequant) against libdav1d.

For every transform size the in-process encoder emits (luma 8/16/32,
chroma 4/8/16), drive REAL encoded streams through the system decoder:
a 64x64 frame whose first block carries a chosen set of quantized
coefficients (everything else skip), decoded by dav1d, must reconstruct
EXACTLY what av1_itx.recon_block predicts from a flat-128 prediction.

Coverage per size: every scan-reachable basis position at several
levels/signs (impulses localize any wrong butterfly angle/sign to the
basis functions it feeds), plus dense random coefficient sets (which
exercise rounding interactions), plus saturating magnitudes (clamps).

Usage: python tools/av1_itx_probe.py [--quick]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from imagekit_tpu.codecs import avif_native  # noqa: E402
from imagekit_tpu.codecs.av1_entropy import (  # noqa: E402
    OBU_FRAME, OBU_SEQUENCE_HEADER, obu, tables,
)
from imagekit_tpu.codecs.av1_intra import (  # noqa: E402
    PARTITION_NONE, PARTITION_SPLIT, TileEncoder, frame_header_bits,
    sequence_header,
)
from imagekit_tpu.codecs.av1_image import q_ctx  # noqa: E402
from imagekit_tpu.codecs.av1_itx import recon_block  # noqa: E402


def probe_stream(bs: int, qindex: int, qy=None, qu=None, qv=None,
                 txtype_sym: int = 1) -> bytes:
    """64x64 frame; the block at (0,0) (size bs, forced splits above it)
    carries the given per-plane levels; all other blocks are skip."""
    te = TileEncoder(64, 64, qctx=q_ctx(qindex))
    done_first = []

    def walk(mi_r, mi_c, size):
        ctx = te._part_ctx(mi_r, mi_c, size)
        if size == bs:
            te._encode_partition_symbol(ctx, PARTITION_NONE, size)
            if not done_first:
                done_first.append(True)
                te.encode_block(mi_r, mi_c, size,
                                txbs=(qy or {}, qu or {}, qv or {}),
                                txtype_sym=txtype_sym)
            else:
                te.encode_block(mi_r, mi_c, size)
            te._update_part_ctx(mi_r, mi_c, size, size)
            return
        te._encode_partition_symbol(ctx, PARTITION_SPLIT, size)
        h = size >> 3  # half size in mi units
        walk(mi_r, mi_c, size >> 1)
        walk(mi_r, mi_c + h, size >> 1)
        walk(mi_r + h, mi_c, size >> 1)
        walk(mi_r + h, mi_c + h, size >> 1)

    walk(0, 0, 64)
    # the production wrapper, so the probe certifies the exact stream
    # shape the encoder emits (header layout drift would desync them)
    from imagekit_tpu.codecs.av1_image import _tile_to_frame

    return _tile_to_frame(te.msac.done(), qindex)


def check(bs: int, plane: int, qindex: int, quant: dict,
          tx_type: str = "DCT") -> tuple:
    """-> (ok, got, want) comparing dav1d vs av1_itx for one txb."""
    T = tables()
    dcq = int(T["dc_qlookup"][qindex])
    acq = int(T["ac_qlookup"][qindex])
    sym = 0 if tx_type == "IDTX" else 1
    if plane == 0:
        stream = probe_stream(bs, qindex, qy=quant, txtype_sym=sym)
        n = bs
    elif plane == 1:
        stream = probe_stream(bs, qindex, qu=quant)
        n = bs // 2
    else:
        stream = probe_stream(bs, qindex, qv=quant)
        n = bs // 2
    dec = avif_native._decode_obu(stream, 64, 64)
    assert dec is not None, "dav1d rejected probe stream"
    got = np.asarray(dec[plane])[:n, :n]
    pred = np.full((n, n), 128, np.uint8)
    want = recon_block(pred, quant, dcq, acq, tx_type=tx_type)
    return (got == want).all(), got, want


def main() -> int:
    if not avif_native.decode_available():
        print("SKIP: libdav1d unavailable")
        return 0
    quick = "--quick" in sys.argv
    rng = np.random.default_rng(5)
    fails = 0
    # (block size, plane) -> tx size = bs (luma) or bs/2 (chroma)
    combos = [(8, 0), (16, 0), (32, 0), (8, 1), (16, 2), (32, 1)]
    for bs, plane in combos:
        n = bs if plane == 0 else bs // 2
        name = f"tx{n} ({'Y' if plane == 0 else 'UV'[plane-1]} of {bs}px)"
        # impulses: every basis position (subsampled in --quick)
        positions = range(0, n * n, 7 if quick and n == 32 else 1)
        bad = 0
        for pos in positions:
            for lv in ((3,) if quick else (1, 3, -2)):
                ok, got, want = check(bs, plane, 60, {pos: lv})
                if not ok:
                    bad += 1
                    if bad <= 3:
                        d = np.argwhere(got.astype(int) != want.astype(int))
                        print(f"  {name} impulse pos={pos} lv={lv}: "
                              f"{len(d)} wrong samples, first at "
                              f"{d[0].tolist()}")
        # dense random sets at several qindex (rounding interactions)
        for qindex in (20, 60, 160):
            for _ in range(3 if quick else 8):
                cnt = int(rng.integers(2, min(n * n, 64)))
                pos = rng.choice(n * n, size=cnt, replace=False)
                quant = {int(p): int(rng.integers(-31, 32)) or 1
                         for p in pos}
                ok, got, want = check(bs, plane, qindex, quant)
                if not ok:
                    bad += 1
                    print(f"  {name} dense q{qindex}: mismatch")
        # saturating magnitudes (golomb levels + pixel clamp + 16-bit
        # intermediate ranges)
        for quant in ({0: 900}, {0: -900}, {1: 500, n: -500},
                      {n * n - 1: 4096}):
            ok, got, want = check(bs, plane, 255, quant)
            if not ok:
                bad += 1
                print(f"  {name} saturate {quant}: mismatch")
        print(f"{name}: {'OK' if not bad else f'{bad} FAILURES'}")
        fails += bad
    # IDTX (inverse identity, TX_SET_INTRA_2 symbol 0): luma tx 8/16
    # only — 32x32 is the DCT-only set and chroma derives its tx_type
    for bs in (8, 16):
        n = bs
        bad = 0
        cases = [{0: 3}, {1: 2}, {n: -2}, {n * n - 1: 5}, {0: 900}]
        for _ in range(4 if quick else 10):
            cnt = int(rng.integers(2, 40))
            pos = rng.choice(n * n, size=cnt, replace=False)
            cases.append({int(p): int(rng.integers(-31, 32)) or 1
                          for p in pos})
        for quant in cases:
            ok, got, want = check(bs, 0, 60, quant, tx_type="IDTX")
            if not ok:
                bad += 1
                print(f"  tx{n} IDTX {dict(list(quant.items())[:3])}: "
                      f"mismatch")
        print(f"tx{n} IDTX (Y): {'OK' if not bad else f'{bad} FAILURES'}")
        fails += bad
    print("OK: av1_itx bit-exact vs libdav1d" if not fails
          else f"FAIL: {fails} probe mismatches")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
