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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", choices=("none", "mode_rd", "trellis", "seg"),
                    default="none")
    args = ap.parse_args()

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
