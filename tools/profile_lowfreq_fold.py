"""Resident-rate profiler for the flagship truncated split-i8 head.

History (round 4): the nb=64 roofline probe showed the staged form of
this head was ~80% PER-IMAGE VPU/layout-bound (~31 us/img at 2.6% MXU /
1.8% HBM) — the per-block k-point IDCT einsum and the (B,by,k,bx,k)
interleave transpose operate on tensors with minor dims of 2..4 at the
flagship K=2, hostile to the 8x128 VPU tiling. Measured on-chip with
this tool's predecessor (same chained+readback methodology):

    A staged (old production)  : 26,076 img/s   (clean window)
    B front-only (IDCT stage)  : isolates ~21 of the 38 us/img
    C folded, planar wire      : 57,053 img/s   (2.19x)  <- shipped
    C2 folded, grouped wire    : 50,829 img/s   (device-side split)

C is bit-identical to A in the true output region on real content (the
unclipped k/8-scale intermediate only matters for IDCT overshoot).
The folded formulation now IS the production kernel
(ops/dct.py::_folded_lowfreq_plane + fold_lowfreq_weights + the planar
AC wire layout); this tool measures the production head end-to-end so
regressions in it are visible on the real chip without a full bench run.

Usage: python tools/profile_lowfreq_fold.py [--windows N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np  # noqa: E402


def build_inputs():
    """Same flagship construction as bench.measure_device_only: synthetic
    1080p q85 JPEG -> split-i8 truncated coefficients batched at nb,
    PLANAR AC wire layout + folded weight stacks."""
    import jax  # noqa: F401

    from bench import make_sources
    from imagekit_tpu.codecs.native import jpeg_abi, loader
    from imagekit_tpu.ops.dct import (
        LOWFREQ_ESC_C,
        LOWFREQ_ESC_Y,
        fold_lowfreq_weights,
        lowfreq_chroma_half_weights,
        lowfreq_luma_weights,
        pad128,
    )
    from imagekit_tpu.ops.resize import target_dimensions
    from imagekit_tpu.serving.batcher import _esc_batch_rows, _pad_esc
    from imagekit_tpu.utils.bucketing import bucket_for

    lib = loader.load()
    src = make_sources(1)[0]
    hdr = jpeg_abi.parse(lib, src)
    out_w, out_h = target_dimensions(hdr.width, hdr.height, 400, None)
    yb_h = bucket_for(hdr.blocks_h[0] * 8)
    yb_w = bucket_for(hdr.blocks_w[0] * 8)
    obh, obw = bucket_for(out_h), bucket_for(out_w)
    k = 2
    nb = 32
    by_b, bx_b = yb_h // 8, yb_w // 8
    cy_b, cx_b = yb_h // 16, yb_w // 16
    na = k * k - 1
    _, dc8, ac8, esc8, qtabs, ovf = jpeg_abi.decode_lowfreq_i8(lib, src, k)
    assert not ovf
    by, bx = dc8[0].shape
    cy, cx = dc8[1].shape

    pads = (pad128(bx_b), pad128(cx_b))
    y_dc = np.zeros((nb, by_b, pads[0]), np.int16)
    y_ac = np.zeros((nb, by_b, na * pads[0]), np.int8)
    cb_dc = np.zeros((nb, cy_b, pads[1]), np.int16)
    cb_ac = np.zeros((nb, cy_b, na * pads[1]), np.int8)
    cr_dc = np.zeros_like(cb_dc)
    cr_ac = np.zeros_like(cb_ac)
    eidx = [[], [], []]
    evals = [[], [], []]
    for i in range(nb):
        y_dc[i, :by, :bx] = dc8[0]
        cb_dc[i, :cy, :cx] = dc8[1]
        cr_dc[i, :cy, :cx] = dc8[2]
        for j in range(na):
            y_ac[i, :by, j * pads[0] : j * pads[0] + bx] = ac8[0][:, :, j]
            cb_ac[i, :cy, j * pads[1] : j * pads[1] + cx] = ac8[1][:, :, j]
            cr_ac[i, :cy, j * pads[1] : j * pads[1] + cx] = ac8[2][:, :, j]
        for c, (ei, ev) in enumerate(
            _esc_batch_rows(esc8, i, bx, cx, na, pads)
        ):
            eidx[c].append(ei)
            evals[c].append(ev)
    escs = (
        _pad_esc(eidx[0], evals[0], LOWFREQ_ESC_Y),
        _pad_esc(eidx[1], evals[1], LOWFREQ_ESC_C),
        _pad_esc(eidx[2], evals[2], LOWFREQ_ESC_C),
    )

    qt = np.zeros((nb, 128), np.float32)
    for i in range(nb):
        qt[i, :64] = qtabs[hdr.comp_tq[0]]
        qt[i, 64:] = qtabs[hdr.comp_tq[1]]

    nu = 8
    ly, lx = yb_h * k // 8, yb_w * k // 8
    wv_y = np.zeros((nu, obh, ly), np.float32)
    wh_y = np.zeros((nu, obw, lx), np.float32)
    wv_c = np.zeros((nu, obh // 2, ly // 2), np.float32)
    wh_c = np.zeros((nu, obw // 2, lx // 2), np.float32)
    wv_y[0] = lowfreq_luma_weights(hdr.height, out_h, k, ly, obh)
    wh_y[0] = lowfreq_luma_weights(hdr.width, out_w, k, lx, obw)
    wv_c[0] = lowfreq_chroma_half_weights(
        hdr.comp_height[1], hdr.height, out_h, ly // 2, obh // 2, k
    )
    wh_c[0] = lowfreq_chroma_half_weights(
        hdr.comp_width[1], hdr.width, out_w, lx // 2, obw // 2, k
    )
    weights = tuple(
        fold_lowfreq_weights(w, k) for w in (wv_y, wh_y, wv_c, wh_c)
    )
    vidx = np.zeros(nb, np.int32)
    dims = dict(by_b=by_b, bx_b=bx_b, cy_b=cy_b, cx_b=cx_b, k=k)
    return dict(
        dc=(y_dc, cb_dc, cr_dc), ac=(y_ac, cb_ac, cr_ac), escs=escs,
        qt=qt, weights=weights, vidx=vidx, dims=dims, nb=nb,
    )


def _stacked_variant_kernel(dims):
    """EXPERIMENT D: the folded contraction collapsed into TWO batched
    dot_generals per plane instead of 2*k*k small ones — contract (u, h)
    in one multi-dim dot, then (v, w) in a second:

        t   = einsum("buoh,buvhw->bvow", Wv_f, q*C)   # contract {u,h}
        out = einsum("bvpw,bvow->bop",   Wh_f, t)     # contract {v,w}

    MAC count identical to production; the hypothesis is better MXU
    utilisation from fewer, larger matmuls (production's 8 per plane are
    240x272 @ 272x240-ish; this is one 240x272 @ 272x480 + one
    400x480 @ 480x240). The k*k C planes are stacked with one concat
    (~16 MB/batch, ~0.02 ms HBM). Accumulation order changes, so output
    may differ by f32 rounding (mirror tests allow +-1)."""
    import jax
    import jax.numpy as jnp

    from imagekit_tpu.ops.dct import (
        _lowfreq_indices,
        _yuv_range_pack,
    )

    k = dims["k"]
    hp = jax.lax.Precision.HIGHEST

    def plane(dc, ac, eidx, evals, nblk, qt4, wv_f, wh_f, vidx):
        p = ac.shape[2] // (k * k - 1)
        a = ac.astype(jnp.float32)
        a = a.at[eidx[:, 0], eidx[:, 1], eidx[:, 2]].add(
            evals.astype(jnp.float32)
        )
        planes = [dc[:, :, :nblk].astype(jnp.float32)] + [
            a[:, :, j * p : j * p + nblk] for j in range(k * k - 1)
        ]
        C = jnp.stack(planes, axis=1)  # (B, k*k, H, W) u-major
        C = C * qt4[:, :, None, None]
        B, _, H, W = C.shape
        C = C.reshape(B, k, k, H, W)
        wv = wv_f[vidx]  # (B, k, O, H)
        wh = wh_f[vidx]  # (B, k, P, W)
        t = jnp.einsum("buoh,buvhw->bvow", wv, C, precision=hp)
        out = jnp.einsum("bvpw,bvow->bop", wh, t, precision=hp)
        return out + 128.0

    import functools

    @functools.partial(
        jax.jit, static_argnames=("by_b", "bx_b", "cy_b", "cx_b", "k")
    )
    def kern_d(y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac,
               ey_idx, ey_val, eb_idx, eb_val, er_idx, er_val,
               qtabs, wv_y_f, wh_y_f, wv_c_f, wh_c_f, vidx,
               by_b, bx_b, cy_b, cx_b, k):
        idx = jnp.asarray(_lowfreq_indices(k))
        qt_l = qtabs[:, :64][:, idx] * (k / 8.0)
        qt_c = qtabs[:, 64:][:, idx] * (k / 8.0)
        Y = plane(y_dc, y_ac, ey_idx, ey_val, bx_b, qt_l,
                  wv_y_f, wh_y_f, vidx)
        Cb = plane(cb_dc, cb_ac, eb_idx, eb_val, cx_b, qt_c,
                   wv_c_f, wh_c_f, vidx)
        Cr = plane(cr_dc, cr_ac, er_idx, er_val, cx_b, qt_c,
                   wv_c_f, wh_c_f, vidx)
        return _yuv_range_pack(Y, Cb, Cr)

    return kern_d


def _paired_variant_kernel(dims):
    """EXPERIMENT E: variant D plus the two chroma planes stacked into
    ONE pair of contractions (they share weights and quant tables; the
    chroma matmuls are the smallest and least MXU-efficient, so doubling
    their free dim should help)."""
    import jax
    import jax.numpy as jnp

    from imagekit_tpu.ops.dct import (
        _lowfreq_indices,
        _yuv_range_pack,
    )

    k = dims["k"]
    hp = jax.lax.Precision.HIGHEST

    def widen(dc, ac, eidx, evals, nblk):
        p = ac.shape[2] // (k * k - 1)
        a = ac.astype(jnp.float32)
        a = a.at[eidx[:, 0], eidx[:, 1], eidx[:, 2]].add(
            evals.astype(jnp.float32)
        )
        planes = [dc[:, :, :nblk].astype(jnp.float32)] + [
            a[:, :, j * p : j * p + nblk] for j in range(k * k - 1)
        ]
        return jnp.stack(planes, axis=1)  # (B, k*k, H, W)

    def contract(C, qt4, wv_f, wh_f, vidx):
        # C: (B, S, k*k, H, W) with S stacked planes sharing weights
        C = C * qt4[:, None, :, None, None]
        B, S, _, H, W = C.shape
        C = C.reshape(B, S, k, k, H, W)
        wv = wv_f[vidx]
        wh = wh_f[vidx]
        t = jnp.einsum("buoh,bsuvhw->bsvow", wv, C, precision=hp)
        out = jnp.einsum("bvpw,bsvow->bsop", wh, t, precision=hp)
        return out + 128.0

    import functools

    @functools.partial(
        jax.jit, static_argnames=("by_b", "bx_b", "cy_b", "cx_b", "k")
    )
    def kern_e(y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac,
               ey_idx, ey_val, eb_idx, eb_val, er_idx, er_val,
               qtabs, wv_y_f, wh_y_f, wv_c_f, wh_c_f, vidx,
               by_b, bx_b, cy_b, cx_b, k):
        idx = jnp.asarray(_lowfreq_indices(k))
        qt_l = qtabs[:, :64][:, idx] * (k / 8.0)
        qt_c = qtabs[:, 64:][:, idx] * (k / 8.0)
        Cy = widen(y_dc, y_ac, ey_idx, ey_val, bx_b)[:, None]
        Y = contract(Cy, qt_l, wv_y_f, wh_y_f, vidx)[:, 0]
        Cc = jnp.stack(
            [
                widen(cb_dc, cb_ac, eb_idx, eb_val, cx_b),
                widen(cr_dc, cr_ac, er_idx, er_val, cx_b),
            ],
            axis=1,
        )
        CbCr = contract(Cc, qt_c, wv_c_f, wh_c_f, vidx)
        return _yuv_range_pack(Y, CbCr[:, 0], CbCr[:, 1])

    return kern_e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--variant", type=str, default="",
                    help="'stacked' (D) and/or 'paired' (E), comma list")
    ap.add_argument("--skip-production", action="store_true")
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from imagekit_tpu.ops.dct import (
        _decode_resize_yuv_lowfreq_i8_kernel as kern,
    )
    from imagekit_tpu.utils.residency import chained_readback_rate

    print(f"device: {jax.devices()[0].platform}", flush=True)
    inp = build_inputs()
    dims = inp["dims"]
    nb = inp["nb"]
    d = jax.device_put
    y_dc, cb_dc, cr_dc = inp["dc"]
    y_ac, cb_ac, cr_ac = inp["ac"]
    escs = inp["escs"]
    args = [
        d(y_dc), d(y_ac), d(cb_dc), d(cb_ac), d(cr_dc), d(cr_ac),
        d(escs[0][0]), d(escs[0][1]), d(escs[1][0]), d(escs[1][1]),
        d(escs[2][0]), d(escs[2][1]),
    ] + [d(w) for w in inp["weights"]] + [d(inp["vidx"])]

    @jax.jit
    def step(qt_dep, *a):
        out = kern(*a[:12], qt_dep, a[12], a[13], a[14], a[15], a[16],
                   **dims)
        dep = qt_dep + jnp.float32(0) * out.flatten()[0].astype(jnp.float32)
        return dep, out

    def run_one(label, step_fn, ref_out=None):
        if ref_out is not None:
            _, out_v = step_fn(d(inp["qt"]), *args)
            delta = int(
                np.abs(
                    np.asarray(ref_out).astype(int)
                    - np.asarray(out_v).astype(int)
                ).max()
            )
            print(f"{label} vs production max |delta|: {delta}", flush=True)
        t0 = time.time()
        s = chained_readback_rate(
            step_fn, d(inp["qt"]), args, items_per_step=nb,
            readback=lambda out: np.asarray(out[:1, :1]),
            windows=opts.windows,
        )
        print(
            f"{label:24s}: {s['ips_median']:.0f} img/s median "
            f"({1e6 / s['ips_median']:.1f} us/img; windows "
            f"{s['ips_windows']}, reps {s['reps']}, "
            f"rtt {s['rtt_ms']:.0f} ms, "
            f"compile+run {time.time() - t0:.0f}s)",
            flush=True,
        )
        return s

    out_p = None
    if not opts.skip_production:
        run_one("folded production head", step)
    if opts.variant:
        _, out_p = step(d(inp["qt"]), *args)

    def wrap(kern_v):
        @jax.jit
        def step_v(qt_dep, *a):
            out = kern_v(*a[:12], qt_dep, a[12], a[13], a[14], a[15],
                         a[16], **dims)
            dep = qt_dep + jnp.float32(0) * out.flatten()[0].astype(
                jnp.float32
            )
            return dep, out

        return step_v

    for v in [v for v in opts.variant.split(",") if v]:
        if v == "stacked":
            run_one("stacked variant D", wrap(_stacked_variant_kernel(dims)),
                    ref_out=out_p)
        elif v == "paired":
            run_one("paired-chroma variant E",
                    wrap(_paired_variant_kernel(dims)), ref_out=out_p)


if __name__ == "__main__":
    main()
