#!/usr/bin/env python
"""Reproduce + instrument the aliased-text q-ladder non-monotonicity
(docs/ROADMAP.md item 10, re-scoped round 4 to the I16/B_PRED gate).

Host-only (no TPU): encodes the aliased synthetic text content on a
dense q ladder and reports size / PSNR / monotonicity violations, under
the shipped auto policy and under forced mode-uniformity probes
(B_PRED disabled via a huge I4 gate), so the mode-decision contribution
to the inversion is isolated from everything else. The native encoder
reads its env knobs ONCE per process (static locals), so each variant
runs in a child process — the same reason calibrate_segments.py uses
child templates.

    python tools/mode_ladder.py [--qmin 24] [--qmax 48] [--step 2]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def aliased_text(h=384, w=512):
    """The calibrate_segments text_block content: 3-px strokes with word
    gaps — deliberately aliased against the 4x4/16x16 predictors."""
    r = np.full((h, w), 255, np.uint8)
    x = np.arange(w)
    for i in range(0, h - 6, 12):
        stroke = ((x // 3) % 2 == 0) & ((x // 24) % 4 != 3)
        r[i : i + 6, :] = np.where(stroke[None, :], 20, 255)
    return np.repeat(r[:, :, None], 3, 2)


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float((d * d).mean())
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0 * 255.0 / mse)


_CHILD = """
import io, json, sys
sys.path.insert(0, %(root)r)
import numpy as np
from PIL import Image
from imagekit_tpu.codecs import vp8

img = np.load(%(img)r)["img"]
rows = []
for q in %(qs)r:
    data = vp8.encode_rgb(img, q)
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    d = img.astype(np.float64) - dec.astype(np.float64)
    mse = float((d * d).mean())
    p = 99.0 if mse == 0 else 10.0 * np.log10(255.0 * 255.0 / mse)
    rows.append({"q": q, "bytes": len(data), "psnr": round(p, 2)})
print(json.dumps(rows))
"""


def ladder(img_path, qs, env):
    """Run the q ladder in a CHILD process carrying ``env`` (native
    encoder knobs are static-local, read once per process)."""
    child_env = dict(os.environ, JAX_PLATFORMS="cpu", **env)
    r = subprocess.run(
        [sys.executable, "-c",
         _CHILD % {"root": _ROOT, "img": img_path, "qs": qs}],
        env=child_env, capture_output=True, text=True, timeout=900,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def inversions(rows):
    """(q_lo, q_hi) pairs where the HIGHER q is smaller AND better —
    i.e. the lower-q point is strictly dominated (the wrinkle)."""
    bad = []
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if b["bytes"] <= a["bytes"] and b["psnr"] >= a["psnr"]:
                bad.append((a["q"], b["q"]))
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qmin", type=int, default=24)
    ap.add_argument("--qmax", type=int, default=48)
    ap.add_argument("--step", type=int, default=2)
    args = ap.parse_args()
    qs = list(range(args.qmin, args.qmax + 1, args.step))
    img = aliased_text()
    img_path = "/tmp/mode_ladder_img.npz"
    np.savez_compressed(img_path, img=img)

    out = {}
    for label, env in (
        ("auto", {}),
        # I4 gate so large B_PRED is never evaluated -> all-I16 frame
        ("no_bpred", {"IMAGEKIT_VP8_I4_GATE": "1000000"}),
        # two-pass RD forced off isolates the pass-1 decision
        ("auto_singlepass", {"IMAGEKIT_VP8_TWO_PASS": "0"}),
    ):
        rows = ladder(img_path, qs, env)
        out[label] = {"rows": rows, "dominated_pairs": inversions(rows)}

    # the adjudicating arm (closed ROADMAP item 10): the reference
    # encoder's own ladder on the same content
    pim = Image.fromarray(img)
    rows = []
    for q in qs:
        buf = io.BytesIO()
        pim.save(buf, "WEBP", quality=q, method=4)
        data = buf.getvalue()
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        rows.append(
            {"q": q, "bytes": len(data), "psnr": round(psnr(img, dec), 2)}
        )
    out["libwebp_m4"] = {"rows": rows, "dominated_pairs": inversions(rows)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
