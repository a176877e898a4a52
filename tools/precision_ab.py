#!/usr/bin/env python
"""Numerics A/B for IMAGEKIT_MATMUL_PRECISION (utils/precision.py).

The full-resolution fused heads are MXU-bound f32 contractions that
historically ran at Precision.HIGHEST. HIGH (the 3-pass bf16
decomposition) is ~2^-21 relative error — this tool measures what that
does to the actual u8 outputs of the production kernels on photo-like
and adversarial-random content, so the speed/precision decision is an
evidence call rather than a guess (the host-mirror contract is already
"identical modulo float associativity at quantisation boundaries",
tests/test_batcher.py::test_jpeg_transcode_device_matches_host_mirror).

Usage:
    # in a subprocess per setting (precision is a process-level knob):
    IMAGEKIT_MATMUL_PRECISION=highest python tools/precision_ab.py --dump /tmp/hi.npz --time
    IMAGEKIT_MATMUL_PRECISION=high    python tools/precision_ab.py --dump /tmp/h3.npz --time
    python tools/precision_ab.py --compare /tmp/hi.npz /tmp/h3.npz

``--time`` additionally measures both heads device-resident (chained
deps + host readback, utils/residency.py — the ONLY sanctioned timing
methodology) so the same run answers speed and numerics together.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np  # noqa: E402


def _photo(h, w, seed):
    """Photo-like float field: gradients + sinusoids + mild noise."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        96.0
        + 60.0 * np.sin(xx / 37.0 + seed)
        + 50.0 * np.cos(yy / 23.0 - seed)
        + 24.0 * np.sin((xx + yy) / 11.0)
        + r.normal(0, 6.0, (h, w)).astype(np.float32)
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def dump(path: str, time_heads: bool = False) -> None:
    from imagekit_tpu.ops.color import resample_rgb_yuv_batch
    from imagekit_tpu.ops.dct import (
        combined_chroma_half_weights,
        resize_yuv420_batch,
    )
    from imagekit_tpu.ops.resize import padded_weights
    from imagekit_tpu.utils.bucketing import bucket_for
    from imagekit_tpu.utils.precision import MATMUL_PRECISION_NAME

    th, tw_, oh, ow = 1080, 1920, 225, 400
    bh, bw = bucket_for(th), bucket_for(tw_)
    obh, obw = bucket_for(oh), bucket_for(ow)
    nb = 8
    r = np.random.default_rng(7)

    # --- yuvsrc head: packed YUV 4:2:0 planes, real Lanczos weights ---
    ny, nc = bh * bw, (bh // 2) * (bw // 2)
    from imagekit_tpu.ops.dct import pad128

    flat = np.zeros((nb, pad128(ny + 2 * nc)), np.uint8)
    for b in range(nb):
        y = _photo(th, tw_, 10 * b) if b < nb // 2 else r.integers(
            0, 256, (th, tw_)).astype(np.uint8)
        cbp = _photo(th // 2, tw_ // 2, 10 * b + 1) if b < nb // 2 else (
            r.integers(0, 256, (th // 2, tw_ // 2)).astype(np.uint8))
        crp = _photo(th // 2, tw_ // 2, 10 * b + 2) if b < nb // 2 else (
            r.integers(0, 256, (th // 2, tw_ // 2)).astype(np.uint8))
        yb = np.zeros((bh, bw), np.uint8)
        yb[:th, :tw_] = y
        cb = np.zeros((bh // 2, bw // 2), np.uint8)
        cb[:th // 2, :tw_ // 2] = cbp
        cr = np.zeros_like(cb)
        cr[:th // 2, :tw_ // 2] = crp
        flat[b, :ny] = yb.reshape(-1)
        flat[b, ny:ny + nc] = cb.reshape(-1)
        flat[b, ny + nc:ny + 2 * nc] = cr.reshape(-1)

    wv_y = padded_weights(th, oh, bh, obh)[None]
    wh_y = padded_weights(tw_, ow, bw, obw)[None]
    wv_c = combined_chroma_half_weights(th // 2, th, oh, bh // 2, obh // 2)[None]
    wh_c = combined_chroma_half_weights(tw_ // 2, tw_, ow, bw // 2, obw // 2)[None]
    vidx = np.zeros(nb, np.int32)

    yo, cbo, cro = resize_yuv420_batch(
        flat, (wv_y, wh_y, wv_c, wh_c), vidx, (bh, bw), (obh, obw)
    )

    # --- rgbyuv head: RGB planes through the fused resample+convert ---
    rgb = np.zeros((nb, bh, bw * 3), np.uint8)
    for b in range(nb):
        if b < nb // 2:
            im = np.stack(
                [_photo(th, tw_, 100 * b + c) for c in range(3)], axis=-1
            )
        else:
            im = r.integers(0, 256, (th, tw_, 3)).astype(np.uint8)
        rgb[b, :th, : tw_ * 3] = im.reshape(th, tw_ * 3)
    y2, u2, v2 = resample_rgb_yuv_batch(
        rgb, (wv_y, wh_y), vidx, vidx, (obh, obw)
    )

    np.savez_compressed(
        path,
        precision=MATMUL_PRECISION_NAME,
        yuvsrc_y=yo[:, :oh, :ow],
        yuvsrc_cb=cbo[:, : oh // 2, : ow // 2],
        yuvsrc_cr=cro[:, : oh // 2, : ow // 2],
        rgbyuv_y=y2[:, :oh, :ow],
        rgbyuv_u=u2[:, : oh // 2, : ow // 2],
        rgbyuv_v=v2[:, : oh // 2, : ow // 2],
    )
    report = {"dumped": path, "precision": MATMUL_PRECISION_NAME}

    if time_heads:
        import jax
        import jax.numpy as jnp

        from imagekit_tpu.ops.color import _resample_rgb_yuv_kernel
        from imagekit_tpu.ops.dct import _resize_yuv420_kernel
        from imagekit_tpu.utils.residency import chained_readback_rate

        d = jax.device_put

        def _rb(out):
            o = out[0] if isinstance(out, tuple) else out
            return np.asarray(o[:1, :1])

        # yuvsrc head: thread the dep through the luma vertical weights
        @jax.jit
        def step_yuv(wv_dep, fl, wh, wvc, whc, vi):
            out = _resize_yuv420_kernel(
                fl, wv_dep, wh, wvc, whc, vi,
                bh=bh, bw=bw, obh=obh, obw=obw, csy=2, csx=2,
            )
            dep = wv_dep + jnp.float32(0) * out.flatten()[0].astype(
                jnp.float32
            )
            return dep, out

        s1 = chained_readback_rate(
            step_yuv, d(wv_y), [d(flat), d(wh_y), d(wv_c), d(wh_c),
                                d(vidx)],
            items_per_step=nb, readback=_rb,
        )

        @jax.jit
        def step_rgb(wv_dep, fl, wh, vi, hi):
            out = _resample_rgb_yuv_kernel(fl, wv_dep, wh, vi, hi)
            dep = wv_dep + jnp.float32(0) * out.flatten()[0].astype(
                jnp.float32
            )
            return dep, out

        s2 = chained_readback_rate(
            step_rgb, d(wv_y), [d(rgb), d(wh_y), d(vidx), d(vidx)],
            items_per_step=nb, readback=_rb,
        )
        for name, s in (("yuvsrc", s1), ("rgbyuv", s2)):
            report[name] = {
                "ips_median": round(s["ips_median"], 1),
                "ips_windows": [round(x, 1) for x in s["ips_windows"]],
                "reps": s["reps"],
                "rtt_ms": s["rtt_ms"],
            }

    print(json.dumps(report))


def compare(a_path: str, b_path: str) -> None:
    a, b = np.load(a_path), np.load(b_path)
    out = {"a": str(a["precision"]), "b": str(b["precision"]), "arrays": {}}
    worst = 0
    for k in a.files:
        if k == "precision":
            continue
        xa, xb = a[k].astype(np.int16), b[k].astype(np.int16)
        d = np.abs(xa - xb)
        n = int((d > 0).sum())
        out["arrays"][k] = {
            "n_pixels": int(d.size),
            "n_diff": n,
            "max_abs": int(d.max()),
            "ppm": round(1e6 * n / d.size, 2),
        }
        worst = max(worst, int(d.max()))
    out["max_abs_overall"] = worst
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", type=str, default=None)
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.dump:
        dump(args.dump, time_heads=args.time)
    elif args.compare:
        compare(*args.compare)
    else:
        ap.error("need --dump or --compare")
