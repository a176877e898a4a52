"""Device-resident throughput for EVERY fused serving head, measured
with the honest tunnel-proof methodology (utils/residency.py): inputs
staged on device once, each step carrying a buffer dependency on the
previous step's output, and a host readback closing every timed
window — `jax.block_until_ready` alone does NOT synchronize on the
tunnelled runtime and reads up to 40x optimistic.

    python tools/device_resident_bench.py [--nb 32] [--windows 3]

Round-4 upgrade (BASELINE.md "re-anchor against the adaptive
estimator"): the original fixed-rep FIFO loop carried the 33-95 ms
readback RTT as 7-20% of each ~0.5 s window, so the round-3 per-head
table overstates per-batch cost by the window's RTT share. This
version wraps each head in a chained dstep (dep threaded through a
float input, exactly bench.py's flagship pattern) and runs the
adaptive estimator: window grows until readback RTT < 2% of it, then
K independent windows, MEDIAN reported. The chained wrappers are new
jit signatures — first run per head pays a remote compile on the
tunnel (30 s - 7 min each, persisted in the compile cache).

Geometry: the e2e bench shape (1080p source buckets -> 400px target
buckets). Numbers are conservative (readback RTT amortized, not
subtracted); compare bands, not points (BASELINE.md correction note).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagekit_tpu.utils.residency import chained_readback_rate  # noqa: E402


def _dep_of(out):
    y0 = out[0] if isinstance(out, tuple) else out
    return jnp.float32(0) * y0.flatten()[0].astype(jnp.float32)


def _readback(out):
    y_last = out[0] if isinstance(out, tuple) else out
    return np.asarray(y_last[:1, :1] if y_last.ndim >= 2 else y_last[:1])


def measure(name, dstep, dep0, args, nb, windows):
    """Adaptive chained+readback estimate for one head. Prints the
    median and the window band; returns the stats dict."""
    t0 = time.perf_counter()
    stats = chained_readback_rate(
        dstep, dep0, args, items_per_step=nb, readback=_readback,
        windows=windows,
    )
    wall = time.perf_counter() - t0
    ips = stats["ips_median"]
    print(
        f"{name:8s}: {ips:9.0f} img/s resident "
        f"({nb / ips * 1000:7.3f} ms/batch, nb={nb}, "
        f"band {stats['ips_min']:.0f}-{stats['ips_max']:.0f}, "
        f"reps={stats['reps']}, rtt {stats['rtt_ms']:.1f} ms "
        f"= {stats['overhead_pct']:.2f}% of window, wall {wall:.0f} s)",
        flush=True,
    )
    return {
        "ips_median": round(ips, 1),
        "ips_windows": stats["ips_windows"],
        "ms_per_batch": round(nb / ips * 1000, 3),
        "reps": stats["reps"],
        "rtt_ms": stats["rtt_ms"],
        "overhead_pct": stats["overhead_pct"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=32)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--heads", type=str, default="",
                    help="comma list; default all")
    args_cli = ap.parse_args()
    nb, windows = args_cli.nb, args_cli.windows

    # the public wrappers round-trip through numpy by design; the
    # resident loop calls the underlying jitted kernels directly
    from imagekit_tpu.ops.color import _resample_rgb_yuv_kernel
    from imagekit_tpu.ops.dct import (
        LOWFREQ_ESC_C,
        LOWFREQ_ESC_Y,
        _resample_rgb_jpeg_kernel,
        _resize_yuv420_kernel,
        _resize_yuv_jpeg_kernel,
        _transcode_i8_kernel,
        fold_lowfreq_weights,
        pad128,
    )
    from imagekit_tpu.utils.bucketing import bucket_for

    bh, bw = bucket_for(1080), bucket_for(1920)
    obh, obw = bucket_for(225), bucket_for(400)
    nu = 4
    r = np.random.default_rng(0)
    d = jax.device_put

    # --- YUV-domain heads (WebP/AVIF sources) ---
    ny, nc = bh * bw, (bh // 2) * (bw // 2)
    flat = d(r.integers(0, 255, (nb, pad128(ny + 2 * nc))).astype(np.uint8))
    yw = (
        d(r.random((nu, obh, bh)).astype(np.float32)),
        d(r.random((nu, obw, bw)).astype(np.float32)),
        d(r.random((nu, obh // 2, bh // 2)).astype(np.float32)),
        d(r.random((nu, obw // 2, bw // 2)).astype(np.float32)),
    )
    vidx = d(np.zeros(nb, np.int32))
    qto = d((r.random((nb, 128)) + 1).astype(np.float32))

    # dep is threaded through the vertical luma weight stack (a float
    # input every head reads), bench.py's flagship pattern: the next
    # step cannot start, be elided, or be deduped before the previous
    # step's first output element exists.
    @jax.jit
    def dstep_yuvsrc(wv_dep, flat_, wh, wvc, whc, vi):
        out = _resize_yuv420_kernel(
            flat_, wv_dep, wh, wvc, whc, vi, bh=bh, bw=bw, obh=obh, obw=obw,
        )
        return wv_dep + _dep_of(out), out

    @jax.jit
    def dstep_yuvjpg(wv_dep, flat_, wh, wvc, whc, qt, vi):
        out = _resize_yuv_jpeg_kernel(
            flat_, wv_dep, wh, wvc, whc, qt, vi,
            bh=bh, bw=bw, obh=obh, obw=obw,
        )
        return wv_dep + _dep_of(out), out

    # Pallas in-tile layout-fusion variant of the same head (round 5,
    # ops/pallas_resize.py) — the A/B that decides whether
    # IMAGEKIT_PALLAS_YUV flips on by default
    from imagekit_tpu.ops.pallas_resize import (
        _resize_yuv420_pallas,
        _resize_yuv_jpeg_pallas,
        mode as _pl_mode,
        yuvjpg_mode as _plj_mode,
    )

    @jax.jit
    def dstep_yuvsrc_pl(wv_dep, flat_, wh, wvc, whc, vi):
        out = _resize_yuv420_pallas(
            flat_, wv_dep, wh, wvc, whc, vi,
            bh=bh, bw=bw, obh=obh, obw=obw,
            interpret=(_pl_mode() == "interpret"),
        )
        return wv_dep + _dep_of(out), out

    @jax.jit
    def dstep_yuvjpg_pl(wv_dep, flat_, wh, wvc, whc, qt, vi):
        out = _resize_yuv_jpeg_pallas(
            flat_, wv_dep, wh, wvc, whc, qt, vi,
            bh=bh, bw=bw, obh=obh, obw=obw,
            interpret=(_plj_mode() == "interpret"),
        )
        return wv_dep + _dep_of(out), out

    # --- RGB-source heads ---
    rgb = d(r.integers(0, 255, (nb, bh, bw * 3)).astype(np.uint8))
    wv = d(r.random((nu, obh, bh)).astype(np.float32))
    wh = d(r.random((nu, obw, bw)).astype(np.float32))

    @jax.jit
    def dstep_rgbyuv(wv_dep, rgb_, wh_, vi):
        out = _resample_rgb_yuv_kernel(rgb_, wv_dep, wh_, vi, vi)
        return wv_dep + _dep_of(out), out

    from imagekit_tpu.ops.pallas_resize import (
        _resample_rgb_jpeg_pallas,
        _resample_rgb_yuv_pallas,
        rgb_mode as _plr_mode,
        rgbjpg_mode as _plrj_mode,
    )

    @jax.jit
    def dstep_rgbyuv_pl(wv_dep, rgb_, wh_, vi):
        out = _resample_rgb_yuv_pallas(
            rgb_, wv_dep, wh_, vi, vi,
            interpret=(_plr_mode() == "interpret"),
        )
        return wv_dep + _dep_of(out), out

    @jax.jit
    def dstep_rgbjpg(wv_dep, rgb_, wh_, vi, qt):
        out = _resample_rgb_jpeg_kernel(rgb_, wv_dep, wh_, vi, vi, qt)
        return wv_dep + _dep_of(out), out

    @jax.jit
    def dstep_rgbjpg_pl(wv_dep, rgb_, wh_, vi, qt):
        out = _resample_rgb_jpeg_pallas(
            rgb_, wv_dep, wh_, vi, vi, qt,
            interpret=(_plrj_mode() == "interpret"),
        )
        return wv_dep + _dep_of(out), out

    # --- fused JPEG->JPEG transcode (jxc), split-int8 transport, K=2 ---
    k = 2
    yb_h, yb_w = bucket_for(1080), bucket_for(1920)
    by_b, bx_b = yb_h // 8, yb_w // 8
    cy_b, cx_b = yb_h // 16, yb_w // 16
    na = k * k - 1
    y_dc = d(r.integers(-500, 500, (nb, by_b, pad128(bx_b))).astype(np.int16))
    y_ac = d(r.integers(-100, 100, (nb, by_b, pad128(bx_b * na))).astype(np.int8))
    c_dc = d(r.integers(-500, 500, (nb, cy_b, pad128(cx_b))).astype(np.int16))
    c_ac = d(r.integers(-100, 100, (nb, cy_b, pad128(cx_b * na))).astype(np.int8))
    ey = (d(np.zeros((LOWFREQ_ESC_Y, 3), np.int32)),
          d(np.zeros((LOWFREQ_ESC_Y,), np.int32)))
    ec = (d(np.zeros((LOWFREQ_ESC_C, 3), np.int32)),
          d(np.zeros((LOWFREQ_ESC_C,), np.int32)))
    qt_in = d((r.random((nb, 128)) + 1).astype(np.float32))
    # the r4 folded kernels take 4-D folded weight stacks
    # (fold_lowfreq_weights: (U, O, nblk*k) -> (U, k, O, nblk))
    ly, lx = yb_h * k // 8, yb_w * k // 8
    tw = tuple(
        d(fold_lowfreq_weights(r.random((nu, o, n)).astype(np.float32), k))
        for o, n in (
            (obh, ly), (obw, lx), (obh // 2, ly // 2), (obw // 2, lx // 2),
        )
    )

    @jax.jit
    def dstep_jxc(qt_dep, a0, a1, a2, a3, a4, a5, e0, e1, e2, e3, e4, e5,
                  qt2, w0, w1, w2, w3, vi):
        out = _transcode_i8_kernel(
            a0, a1, a2, a3, a4, a5, e0, e1, e2, e3, e4, e5,
            qt_dep, qt2, w0, w1, w2, w3, vi,
            by_b=by_b, bx_b=bx_b, cy_b=cy_b, cx_b=cx_b, k=k,
        )
        return qt_dep + _dep_of(out), out

    # flagship split-int8 decode head (bench.py's resident kernel) and
    # its round-5 Pallas variant — the second A/B
    from imagekit_tpu.ops.dct import _decode_resize_yuv_lowfreq_i8_kernel
    from imagekit_tpu.ops.pallas_jpeg8 import (
        _decode_resize_i8_pallas,
        _transcode_i8_pallas,
        jxc_mode as _plx_mode,
        mode as _pl8_mode,
    )

    @jax.jit
    def dstep_jpeg8(qt_dep, a0, a1, a2, a3, a4, a5,
                    e0, e1, e2, e3, e4, e5, w0, w1, w2, w3, vi):
        out = _decode_resize_yuv_lowfreq_i8_kernel(
            a0, a1, a2, a3, a4, a5, e0, e1, e2, e3, e4, e5,
            qt_dep, w0, w1, w2, w3, vi,
            by_b=by_b, bx_b=bx_b, cy_b=cy_b, cx_b=cx_b, k=k,
        )
        return qt_dep + _dep_of(out), out

    @jax.jit
    def dstep_jpeg8_pl(qt_dep, a0, a1, a2, a3, a4, a5,
                       e0, e1, e2, e3, e4, e5, w0, w1, w2, w3, vi):
        out = _decode_resize_i8_pallas(
            a0, a1, a2, a3, a4, a5, e0, e1, e2, e3, e4, e5,
            qt_dep, w0, w1, w2, w3, vi,
            by_b=by_b, bx_b=bx_b, cy_b=cy_b, cx_b=cx_b, k=k,
            interpret=(_pl8_mode() == "interpret"),
        )
        return qt_dep + _dep_of(out), out

    @jax.jit
    def dstep_jxc_pl(qt_dep, a0, a1, a2, a3, a4, a5, e0, e1, e2, e3, e4,
                     e5, qt2, w0, w1, w2, w3, vi):
        out = _transcode_i8_pallas(
            a0, a1, a2, a3, a4, a5, e0, e1, e2, e3, e4, e5,
            qt_dep, qt2, w0, w1, w2, w3, vi,
            by_b=by_b, bx_b=bx_b, cy_b=cy_b, cx_b=cx_b, k=k,
            interpret=(_plx_mode() == "interpret"),
        )
        return qt_dep + _dep_of(out), out

    heads = {
        "yuvsrc": (dstep_yuvsrc, yw[0],
                   [flat, yw[1], yw[2], yw[3], vidx]),
        "yuvsrc_pl": (dstep_yuvsrc_pl, yw[0],
                      [flat, yw[1], yw[2], yw[3], vidx]),
        "yuvjpg": (dstep_yuvjpg, yw[0],
                   [flat, yw[1], yw[2], yw[3], qto, vidx]),
        "yuvjpg_pl": (dstep_yuvjpg_pl, yw[0],
                      [flat, yw[1], yw[2], yw[3], qto, vidx]),
        "rgbyuv": (dstep_rgbyuv, wv, [rgb, wh, vidx]),
        "rgbyuv_pl": (dstep_rgbyuv_pl, wv, [rgb, wh, vidx]),
        "rgbjpg": (dstep_rgbjpg, wv, [rgb, wh, vidx, qto]),
        "rgbjpg_pl": (dstep_rgbjpg_pl, wv, [rgb, wh, vidx, qto]),
        "jpeg8": (dstep_jpeg8, qt_in,
                  [y_dc, y_ac, c_dc, c_ac, c_dc, c_ac,
                   ey[0], ey[1], ec[0], ec[1], ec[0], ec[1],
                   tw[0], tw[1], tw[2], tw[3], vidx]),
        "jpeg8_pl": (dstep_jpeg8_pl, qt_in,
                     [y_dc, y_ac, c_dc, c_ac, c_dc, c_ac,
                      ey[0], ey[1], ec[0], ec[1], ec[0], ec[1],
                      tw[0], tw[1], tw[2], tw[3], vidx]),
        "jxc_pl": (dstep_jxc_pl, qt_in,
                   [y_dc, y_ac, c_dc, c_ac, c_dc, c_ac,
                    ey[0], ey[1], ec[0], ec[1], ec[0], ec[1],
                    qto, tw[0], tw[1], tw[2], tw[3], vidx]),
        "jxc": (dstep_jxc, qt_in,
                [y_dc, y_ac, c_dc, c_ac, c_dc, c_ac,
                 ey[0], ey[1], ec[0], ec[1], ec[0], ec[1],
                 qto, tw[0], tw[1], tw[2], tw[3], vidx]),
    }
    want = [h for h in args_cli.heads.split(",") if h] or list(heads)
    results = {}
    for name in want:
        dstep, dep0, hargs = heads[name]
        try:
            results[name] = measure(name, dstep, dep0, hargs, nb, windows)
        except Exception as e:  # noqa: BLE001 - print and continue
            print(f"{name:8s}: failed ({type(e).__name__}: {e})", flush=True)
            results[name] = None
    print(json.dumps({"nb": nb, "windows": windows, "heads": results}))


if __name__ == "__main__":
    main()
