"""AVIF encode parity table: direct libavif ABI (YUV-direct, the serving
path) vs the host library's RGBA path (PIL -> libavif, the pre-round-3
implementation and the stand-in for the reference's ravif operating
point, src/transform.rs:143-145).

Usage: python tools/avif_parity.py [--w 400 --h 225] [--speeds 4,8]

Prints a markdown table (bytes / PSNR dB / encode ms per cell) for
docs/ARCHITECTURE.md + docs/PARITY_REPORT.md. PSNR is measured against
the pre-encode RGB input via PIL decode of each output.
"""

from __future__ import annotations

import argparse
import io
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, ".")

from imagekit_tpu.codecs import avif_encode  # noqa: E402


def make_image(w: int, h: int, seed: int = 11) -> np.ndarray:
    """Photographic-class synthetic: gradients + low-frequency structure
    + mild noise (pure noise is adversarial for any transform codec and
    pure gradients are trivial; this sits between)."""
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(
        np.linspace(0, 1, w, dtype=np.float32),
        np.linspace(0, 1, h, dtype=np.float32),
    )
    r = 128 + 90 * np.sin(6.3 * xx) * np.cos(3.1 * yy)
    g = 128 + 90 * np.cos(4.7 * xx + 1.0) * np.sin(5.9 * yy)
    b = 128 + 90 * np.sin(2.9 * (xx + yy))
    img = np.stack([r, g, b], axis=-1)
    img += rng.normal(0, 4.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def enc_native(img: np.ndarray, q: int, speed: int):
    t0 = time.perf_counter()
    data = avif_encode.encode_rgb(img, q, speed=speed)
    dt = time.perf_counter() - t0
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return len(data), psnr(img, dec), dt * 1e3


def enc_host(img: np.ndarray, q: int, speed: int):
    rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    buf = io.BytesIO()
    t0 = time.perf_counter()
    Image.fromarray(rgba, "RGBA").save(buf, "AVIF", quality=q, speed=speed)
    dt = time.perf_counter() - t0
    data = buf.getvalue()
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return len(data), psnr(img, dec), dt * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=400)
    ap.add_argument("--h", type=int, default=225)
    ap.add_argument("--speeds", default="4,8")
    args = ap.parse_args()

    if not avif_encode.available():
        raise SystemExit("native avif encode unavailable")
    img = make_image(args.w, args.h)
    speeds = [int(s) for s in args.speeds.split(",")]

    cols = []
    for s in speeds:
        cols.append((f"native YUV-direct s{s}", lambda q, s=s: enc_native(img, q, s)))
        cols.append((f"host RGBA s{s}", lambda q, s=s: enc_host(img, q, s)))

    header = "| q | " + " | ".join(n for n, _ in cols) + " |"
    print(header)
    print("|" + "---|" * (len(cols) + 1))
    for q in (10, 30, 50, 70, 80, 90, 100):
        cells = []
        for _, fn in cols:
            n, p, ms = fn(q)
            ps = "inf" if p == float("inf") else f"{p:.1f}"
            cells.append(f"{n} B / {ps} dB / {ms:.0f} ms")
        print(f"| {q} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
