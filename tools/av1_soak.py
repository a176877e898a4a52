#!/usr/bin/env python3
"""Randomized conformance soak for the first-party AV1 encoder.

Beyond the fixed test corpus: random content classes x random dims
(1..513, including sub-8 and odd) x random qindex x adapt on/off x
alpha on/off, every stream decoded by libdav1d and required BIT-EXACT
against the encoder's own reconstruction; AVIF containers additionally
re-parsed and decoded through the native path at exact dims.

Usage: python tools/av1_soak.py [--n 200] [--seed 7]
Exits nonzero on the first mismatch (prints a repro recipe).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from imagekit_tpu.codecs import avif_native  # noqa: E402
from imagekit_tpu.codecs.av1_image import encode_avif, encode_frame  # noqa: E402


def content(rng, h, w, kind):
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == 0:
        return rng.integers(0, 256, (h, w)).astype(np.uint8)
    if kind == 1:
        return ((xx * rng.integers(1, 5) + yy * rng.integers(1, 5))
                % 256).astype(np.uint8)
    if kind == 2:
        base = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
        for _ in range(int(rng.integers(0, 40))):
            r, c = int(rng.integers(0, h)), int(rng.integers(0, w))
            hh = int(rng.integers(1, min(9, h - r + 1)))
            ww = int(rng.integers(1, min(9, w - c + 1)))
            base[r:r + hh, c:c + ww] = int(rng.integers(0, 256))
        return base
    if kind == 3:
        return np.clip(128 + 70 * np.sin(yy / max(1, rng.integers(2, 30)))
                       * np.cos(xx / max(1, rng.integers(2, 30)))
                       + rng.normal(0, rng.integers(0, 12), (h, w)),
                       0, 255).astype(np.uint8)
    return np.where(((xx // max(1, rng.integers(1, 7))) % 2 == 0)
                    ^ ((yy // max(1, rng.integers(1, 7))) % 2 == 0),
                    rng.integers(0, 128), rng.integers(128, 256)
                    ).astype(np.uint8)


def main() -> int:
    n = 200
    seed = 7
    args = sys.argv[1:]
    if "--n" in args:
        n = int(args[args.index("--n") + 1])
    if "--seed" in args:
        seed = int(args[args.index("--seed") + 1])
    if not avif_native.decode_available():
        print("SKIP: libdav1d unavailable")
        return 0
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for i in range(n):
        w = int(rng.integers(1, 513))
        h = int(rng.integers(1, 513))
        kind = int(rng.integers(0, 5))
        qindex = int(rng.integers(1, 256))
        adapt = bool(rng.integers(0, 2))
        y = content(rng, h, w, kind)
        ch, cw = (h + 1) // 2, (w + 1) // 2
        u = content(rng, ch, cw, int(rng.integers(0, 5)))
        v = np.full((ch, cw), int(rng.integers(0, 256)), np.uint8)
        recipe = (f"i={i} w={w} h={h} kind={kind} qindex={qindex} "
                  f"adapt={adapt} seed={seed}")
        stream, ry, ru, rv = encode_frame(y, u, v, qindex=qindex,
                                          adapt=adapt)
        dec = avif_native._decode_obu(stream, w, h)
        if dec is None:
            print(f"FAIL(reject): {recipe}")
            return 1
        dy, du, dv = (np.asarray(p) for p in dec[:3])
        if not (np.array_equal(dy, ry) and np.array_equal(du, ru)
                and np.array_equal(dv, rv)):
            print(f"FAIL(recon): {recipe}")
            return 1
        if i % 4 == 0:   # container + alpha path
            alpha = content(rng, h, w, 2) if rng.integers(0, 2) else None
            data = encode_avif(y, u, v, qindex=max(1, qindex),
                               alpha=alpha)
            rgb = avif_native.decode_rgb(data)
            want_ch = 4 if alpha is not None else 3
            if rgb is None or rgb.shape != (h, w, want_ch):
                print(f"FAIL(container): {recipe} alpha={alpha is not None} "
                      f"got={None if rgb is None else rgb.shape}")
                return 1
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{n} ({time.time() - t0:.0f}s)")
    print(f"OK: {n} randomized streams dav1d-bit-exact "
          f"({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
