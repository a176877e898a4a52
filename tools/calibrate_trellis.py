"""Calibrate the VP8 trellis lambda (IMAGEKIT_VP8_TRELLIS_K).

Runs one subprocess per K value (the knob is read once per process) and
reports size ratio + delta-PSNR vs libwebp at each quality, over a small
corpus of synthetic images with different statistics (the photo-like test
gradient, a noisy texture, and a hard-edged text-like card).

Usage: python tools/calibrate_trellis.py [K ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = """
import io, json, sys
import numpy as np
from PIL import Image
sys.path.insert(0, %(repo)r)
from tests.conftest import make_test_image, psnr
from imagekit_tpu.codecs import vp8

def text_card(w=400, h=300):
    rng = np.random.default_rng(7)
    img = np.full((h, w, 3), 245, np.uint8)
    # hard-edged dark strokes on a light field (text-like statistics)
    for i in range(60):
        y = int(rng.integers(0, h - 12)); x = int(rng.integers(0, w - 40))
        lw = int(rng.integers(8, 40)); th = int(rng.integers(2, 5))
        img[y:y+th, x:x+lw] = 20
        if rng.random() < 0.4:
            img[y:y+12, x:x+th] = 20
    return img

def noisy(w=400, h=300):
    rng = np.random.default_rng(11)
    base = np.linspace(40, 215, w, dtype=np.float32)[None, :, None]
    img = base + rng.normal(0, 18, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)

imgs = {"photo": make_test_image(400, 300), "text": text_card(),
        "noise": noisy()}
rows = []
for name, img in imgs.items():
    for q in (30, 50, 80, 95):
        ours = vp8.encode_rgb(img, q)
        buf = io.BytesIO(); Image.fromarray(img).save(buf, "WEBP", quality=q)
        lw = buf.getvalue()
        p_o = psnr(np.asarray(Image.open(io.BytesIO(ours)).convert("RGB")), img)
        p_l = psnr(np.asarray(Image.open(io.BytesIO(lw)).convert("RGB")), img)
        rows.append({"img": name, "q": q, "ratio": len(ours) / len(lw),
                     "dpsnr": p_o - p_l, "ours": len(ours), "lw": len(lw)})
print(json.dumps(rows))
"""


def run_k(k: int):
    env = dict(os.environ, IMAGEKIT_VP8_TRELLIS_K=str(k))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": repo}],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"K={k} worker failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ks = [int(a) for a in sys.argv[1:]] or [0, 5, 10, 15, 25, 35, 50]
    for k in ks:
        rows = rowsk = run_k(k)
        by_q = {}
        for r in rows:
            by_q.setdefault(r["q"], []).append(r)
        line = [f"K={k:3d}"]
        for q in sorted(by_q):
            rs = by_q[q]
            ratio = sum(r["ratio"] for r in rs) / len(rs)
            dp = sum(r["dpsnr"] for r in rs) / len(rs)
            worst_dp = min(r["dpsnr"] for r in rs)
            worst_ratio = max(r["ratio"] for r in rs)
            line.append(
                f"q{q}: r={ratio:.3f}(max {worst_ratio:.3f}) "
                f"dP={dp:+.2f}(min {worst_dp:+.2f})"
            )
        print(" | ".join(line))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
