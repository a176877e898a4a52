"""Device-resident throughput for EVERY fused serving head, measured
with the honest tunnel-proof methodology (see bench.py): inputs staged
on device once, each step carrying a buffer dependency on the previous
step's output, and a 1-element host readback closing the timed loop —
`jax.block_until_ready` alone does NOT synchronize on the tunnelled
runtime and reads up to 40x optimistic.

    python tools/device_resident_bench.py [--nb 32] [--reps 48]

Geometry: the e2e bench shape (1080p source buckets -> 400px target
buckets), hitting the SAME compiled executables production uses (cache
hits, no fresh compiles). Dispatches serialize FIFO on the single
device stream, so the final readback bounds all of them; a chained
variant was measured equivalent but costs a fresh multi-minute compile
per head on the tunnel. Numbers are conservative (readback RTT is
amortized over reps, not subtracted) and link-noise bounded — compare
bands, not points (BASELINE.md correction note).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def measure(name, step, reps, nb):
    """step() -> out_y (device array). Warm then timed loop with a
    final 1-element readback that bounds the FIFO dispatch queue."""
    y = step()
    np.asarray(y[:1])  # full sync after warm-up dispatch
    t0 = time.perf_counter()
    for _ in range(reps):
        y = step()
    _ = np.asarray(y[:1, :1] if y.ndim >= 2 else y[:1])
    dt = time.perf_counter() - t0
    print(f"{name:8s}: {reps * nb / dt:9.0f} img/s resident "
          f"({dt / reps * 1000:7.2f} ms/batch, nb={nb}, reps={reps})",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=32)
    ap.add_argument("--reps", type=int, default=48)
    args = ap.parse_args()
    nb, reps = args.nb, args.reps

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

    def step_yuvsrc():
        return _resize_yuv420_kernel(
            flat, yw[0], yw[1], yw[2], yw[3], vidx,
            bh=bh, bw=bw, obh=obh, obw=obw,
        )

    def step_yuvjpg():
        return _resize_yuv_jpeg_kernel(
            flat, yw[0], yw[1], yw[2], yw[3], qto, vidx,
            bh=bh, bw=bw, obh=obh, obw=obw,
        )

    # --- RGB-source heads ---
    rgb = d(r.integers(0, 255, (nb, bh, bw * 3)).astype(np.uint8))
    wv = d(r.random((nu, obh, bh)).astype(np.float32))
    wh = d(r.random((nu, obw, bw)).astype(np.float32))

    def step_rgbyuv():
        return _resample_rgb_yuv_kernel(rgb, wv, wh, vidx, vidx)

    def step_rgbjpg():
        return _resample_rgb_jpeg_kernel(rgb, wv, wh, vidx, vidx, qto)

    # --- fused JPEG->JPEG transcode (jxc), split-int8 transport, K=2 ---
    from imagekit_tpu.utils.bucketing import bucket_for as _bf

    k = 2
    yb_h, yb_w = _bf(1080), _bf(1920)
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
    ly, lx = yb_h * k // 8, yb_w * k // 8
    tw = (
        d(r.random((nu, obh, ly)).astype(np.float32)),
        d(r.random((nu, obw, lx)).astype(np.float32)),
        d(r.random((nu, obh // 2, ly // 2)).astype(np.float32)),
        d(r.random((nu, obw // 2, lx // 2)).astype(np.float32)),
    )

    def step_jxc():
        return _transcode_i8_kernel(
            y_dc, y_ac, c_dc, c_ac, c_dc, c_ac,
            ey[0], ey[1], ec[0], ec[1], ec[0], ec[1],
            qt_in, qto, tw[0], tw[1], tw[2], tw[3], vidx,
            by_b=by_b, bx_b=bx_b, cy_b=cy_b, cx_b=cx_b, k=k,
        )

    for name, step in (
        ("yuvsrc", step_yuvsrc),
        ("yuvjpg", step_yuvjpg),
        ("rgbyuv", step_rgbyuv),
        ("rgbjpg", step_rgbjpg),
        ("jxc", step_jxc),
    ):
        try:
            measure(name, step, reps, nb)
        except Exception as e:  # noqa: BLE001 - print and continue
            print(f"{name:8s}: failed ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
