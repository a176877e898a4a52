"""Calibration harness for the VP8 encoder's round-3 knobs: the full-RD
sub-mode selection lambda, the content-adaptive mid-band trellis, and the
segmentation amplitude. Reproduces the sweeps that set the shipped
defaults (vp8_encode.cpp: MODE_RD_MULT=4, mid-band K=5 gated on mean
activity >= 15.5, SEG_AMP auto=0).

Each configuration runs in a SUBPROCESS because the env knobs are cached
per process. Cells: size ratio vs libwebp / dPSNR at identical settings.

    python tools/calibrate_segments.py                    # shipped defaults
    python tools/calibrate_segments.py --sweep mode_rd    # MODE_RD_MULT 1..6
    python tools/calibrate_segments.py --sweep trellis    # K 0..7 forced
    python tools/calibrate_segments.py --sweep seg        # SEG_AMP -60..60
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_CHILD = r"""
import io, json, sys
sys.path.insert(0, %(root)r); sys.path.insert(0, %(here)r)
import numpy as np
from PIL import Image
from parity_report import make_suite, psnr, _save
from imagekit_tpu.codecs import vp8
rows = []
for q in (50, 80, 95):
    for name, img in make_suite().items():
        ours = vp8.encode_rgb(img, q)
        lib = _save(Image.fromarray(img), "WEBP", quality=q)
        d_o = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
        d_l = np.asarray(Image.open(io.BytesIO(lib)).convert("RGB"))
        rows.append([name, q, len(ours), len(lib),
                     psnr(img, d_o), psnr(img, d_l)])
print(json.dumps(rows))
"""


def run_cells(env_extra: dict) -> list:
    env = dict(os.environ, **{k: str(v) for k, v in env_extra.items()})
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"root": ROOT, "here": HERE}],
        capture_output=True, env=env, timeout=600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.decode()[-800:])
    return json.loads(out.stdout.splitlines()[-1])


def show(tag: str, rows: list) -> None:
    fails = 0
    for name, q, so, sl, po, pl in rows:
        bad = so > sl and po < pl - 0.005
        fails += bad
        print(f"  {name:7s} q{q}: ratio {so / sl:5.3f} dPSNR {po - pl:+5.2f}"
              f"{'  <-- strictly worse' if bad else ''}")
    print(f"{tag}: {fails} strictly-worse cells\n")


_CHILD_MIXED = r"""
import io, json, sys
sys.path.insert(0, %(root)r); sys.path.insert(0, %(here)r)
import numpy as np
from PIL import Image
from parity_report import psnr, _save
from imagekit_tpu.codecs import vp8


def make_mixed_suite():
    '''MB-SCALE bimodal corpus (VERDICT r3 #6): the round-3 parity suite's
    "text" image is bimodal WITHIN macroblocks (strokes + gaps inside
    every 16x16), where a per-MB segment map cannot help. These images
    are bimodal ACROSS macroblocks -- whole regions of flat/smooth vs
    whole regions of busy -- the textbook case per-segment quantiser
    deltas exist for (libwebp SNS).'''
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:384, 0:512]

    def text_block(h, w, seed):
        r = np.full((h, w), 255, np.uint8)
        x = np.arange(w)
        for i in range(0, h - 6, 12):
            stroke = ((x // 3) %% 2 == 0) & (
                (x // 24) %% 4 != 3)  # word gaps
            r[i:i + 6, :] = np.where(stroke[None, :], 20, 255)
        return r

    # page: top-half dense text, bottom-half smooth photo gradient
    page = np.full((384, 512), 255, np.float32)
    page[:192] = text_block(192, 512, 0)
    page[192:] = (128 + 80 * np.sin(yy[192:] / 31.0)
                  + 40 * np.cos(xx[192:] / 23.0))
    page = np.repeat(page.clip(0, 255).astype(np.uint8)[:, :, None], 3, 2)

    # magazine: left-half smooth photo, right-half text column
    mag = np.zeros((384, 512), np.float32)
    mag[:, :256] = 128 + 70 * np.sin((yy[:, :256] + xx[:, :256]) / 37.0)
    mag[:, 256:] = text_block(384, 256, 1)
    mag = np.repeat(mag.clip(0, 255).astype(np.uint8)[:, :, None], 3, 2)

    # chart: large flat panels + one busy textured strip
    chart = np.full((384, 512), 235, np.float32)
    chart[48:336, 32:240] = 90     # flat panel
    chart[48:336, 272:480] = 170   # flat panel
    noise = rng.integers(0, 255, (96, 448)).astype(np.float32)
    chart[144:240, 32:480] = noise  # plot area
    chart = np.repeat(chart.clip(0, 255).astype(np.uint8)[:, :, None], 3, 2)

    # screenshot: flat background, text bands, photo thumbnail
    scr = np.full((384, 512), 245, np.float32)
    scr[32:128, 16:496] = text_block(96, 480, 2)
    scr[160:352, 48:304] = (128 + 60 * np.cos(yy[160:352, 48:304] / 17.0)
                            + 50 * np.sin(xx[160:352, 48:304] / 13.0))
    scr[160:352, 336:464] = rng.integers(60, 200, (192, 128))
    scr = np.repeat(scr.clip(0, 255).astype(np.uint8)[:, :, None], 3, 2)

    return {"page": page, "magazine": mag, "chart": chart,
            "screenshot": scr}


mode = sys.argv[1]
rows = []
if mode == "curve":
    # amp=0 rate-distortion ladder for psnr-at-size interpolation
    for name, img in make_mixed_suite().items():
        for q in (20, 25, 30, 35, 40, 45, 50, 55, 60, 65):
            ours = vp8.encode_rgb(img, q)
            d = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
            rows.append([name, q, len(ours), psnr(img, d)])
else:
    for name, img in make_mixed_suite().items():
        for q in (30, 40, 50):
            ours = vp8.encode_rgb(img, q)
            lib = _save(Image.fromarray(img), "WEBP", quality=q)
            d_o = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
            d_l = np.asarray(Image.open(io.BytesIO(lib)).convert("RGB"))
            rows.append([name, q, len(ours), len(lib),
                         psnr(img, d_o), psnr(img, d_l)])
print(json.dumps(rows))
"""


def run_mixed(env_extra: dict, mode: str = "cells") -> list:
    env = dict(os.environ, **{k: str(v) for k, v in env_extra.items()})
    out = subprocess.run(
        [sys.executable, "-c",
         _CHILD_MIXED % {"root": ROOT, "here": HERE}, mode],
        capture_output=True, env=env, timeout=900,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.decode()[-800:])
    return json.loads(out.stdout.splitlines()[-1])


def seg_mixed_sweep() -> None:
    """PSNR-at-size comparison on the MB-scale bimodal corpus: for each
    amp, interpolate the amp=0 RD curve at the amp encoding's size; a
    positive dPSNR@size is a real segmentation win (plain same-q size /
    PSNR deltas conflate the rate shift with the quality shift)."""
    curve = run_mixed({"IMAGEKIT_VP8_SEG_AMP": 0}, mode="curve")
    curves: dict = {}
    for name, _q, size, p in curve:
        curves.setdefault(name, []).append((size, p))
    for name in curves:
        curves[name].sort()

    def psnr_at_size(name, size):
        pts = curves[name]
        if size <= pts[0][0]:
            return pts[0][1]
        if size >= pts[-1][0]:
            return pts[-1][1]
        for (s0, p0), (s1, p1) in zip(pts, pts[1:]):
            if s0 <= size <= s1:
                t = (size - s0) / max(s1 - s0, 1)
                return p0 + t * (p1 - p0)
        return pts[-1][1]

    print("dPSNR@size vs amp=0 RD curve (positive = segmentation wins)")
    for amp in (-60, -40, -20, 20, 40, 60):
        rows = run_mixed({"IMAGEKIT_VP8_SEG_AMP": amp})
        print(f"== IMAGEKIT_VP8_SEG_AMP={amp} ==")
        wins = 0
        for name, q, so, sl, po, _pl in rows:
            d = po - psnr_at_size(name, so)
            wins += d > 0.02
            print(f"  {name:10s} q{q}: size {so:7d} "
                  f"dPSNR@size {d:+6.3f}")
        print(f"amp {amp}: {wins} cells better than amp=0 at equal size\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep",
                    choices=("none", "mode_rd", "trellis", "seg",
                             "seg_mixed"),
                    default="none")
    args = ap.parse_args()

    if args.sweep == "seg_mixed":
        seg_mixed_sweep()
        return

    if args.sweep == "none":
        show("shipped defaults", run_cells({}))
    elif args.sweep == "mode_rd":
        for m in (1, 2, 3, 4, 5, 6):
            print(f"== IMAGEKIT_VP8_MODE_RD_MULT={m} ==")
            show(f"mult {m}", run_cells({"IMAGEKIT_VP8_MODE_RD_MULT": m}))
    elif args.sweep == "trellis":
        for k in (0, 2, 4, 5, 6, 7):
            print(f"== IMAGEKIT_VP8_TRELLIS_K={k} (forced everywhere) ==")
            show(f"K {k}", run_cells({"IMAGEKIT_VP8_TRELLIS_K": k}))
    else:
        for a in (-60, -40, -20, 0, 20, 40, 60):
            print(f"== IMAGEKIT_VP8_SEG_AMP={a} ==")
            show(f"amp {a}", run_cells({"IMAGEKIT_VP8_SEG_AMP": a}))


if __name__ == "__main__":
    main()
