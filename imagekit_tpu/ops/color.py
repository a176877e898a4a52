"""Device colour conversion + chroma subsampling for the WebP encode path.

The reference encodes WebP by handing libwebp an RGB buffer
(``src/transform.rs:129-137``); libwebp then converts to YUV 4:2:0 and
subsamples on the CPU. Here those stages run on device (SURVEY.md §2.2's
mandated split: "TPU Pallas: fDCT/quantize + chroma subsampling; host C++:
VP8 bitstream + arithmetic coding") and only the serial
prediction/entropy half runs on host (:mod:`codecs.native.vp8_encode`).

Conversion uses libwebp's BT.601 *studio-range* mapping (Y in 16..235,
chroma 16..240) so the quality/quantiser behaviour of the native encoder
matches the reference's libwebp output. Chroma is box-averaged 2x2 after
per-pixel conversion — the affine conversion commutes with averaging, so
this matches libwebp's average-then-convert within rounding.

A second entry point remaps JPEG *full-range* YCbCr planes (what the fused
JPEG decode kernel produces) to the studio range — for JPEG->WebP, no RGB
round-trip is needed at all: resize happens in YUV space (linear resampling
commutes with the affine colour transform) and only the range remap +
subsample consistency differ.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagekit_tpu.utils.precision import MATMUL_PRECISION


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _rgb_to_yuv420_kernel(rgb_flat, h: int, w: int):
    """(B, h*w*3) u8 -> Y (B, h, w), U/V (B, h/2, w/2) u8, studio range.
    h and w must be even (caller pads)."""
    x = rgb_flat.reshape(-1, h, w, 3).astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.25678824 * r + 0.50412941 * g + 0.09790588 * b + 16.0
    u = -0.14822290 * r - 0.29099279 * g + 0.43921569 * b + 128.0
    v = 0.43921569 * r - 0.36778831 * g - 0.07142737 * b + 128.0

    def sub(p):
        B = p.shape[0]
        q = p.reshape(B, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        return jnp.clip(jnp.floor(q + 0.5), 0.0, 255.0).astype(jnp.uint8)

    yq = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0).astype(jnp.uint8)
    return yq, sub(u), sub(v)


def rgb_to_yuv420(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single image HWC u8 RGB -> (Y, U, V) u8 planes at 4:2:0 geometry.
    Odd dimensions are edge-padded to even (libwebp convention)."""
    h, w = img.shape[:2]
    ph, pw = h + (h & 1), w + (w & 1)
    rgb = img[:, :, :3]
    if (ph, pw) != (h, w):
        rgb = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y, u, v = _rgb_to_yuv420_kernel(
        jnp.asarray(np.ascontiguousarray(rgb).reshape(1, -1)), h=ph, w=pw
    )
    return (
        np.asarray(y)[0, :h, :w],
        np.asarray(u)[0],
        np.asarray(v)[0],
    )


@jax.jit
def _resample_rgb_yuv_kernel(imgs_flat, wv_u, wh_u, vidx, hidx):
    """Bucketed RGB resample FUSED with the studio-range YUV 4:2:0
    conversion: (B, H, W*3) u8 in -> one flat
    (B, OH*OW + 2*(OH//2 * OW//2)) u8 out (Y then U then V).

    Serves webp outputs from RGB sources (PNG/GIF/BMP/TIFF decode) in one
    device dispatch — the staged path shipped resized RGB (3 B/px) to host
    and converted there; this halves the D2H bytes and removes the host
    conversion. The resized RGB is rounded to the u8 grid before the
    affine conversion so the math matches the staged
    resize -> rgb_to_yuv420_host hand-off points."""
    hp = MATMUL_PRECISION
    B, H, WC = imgs_flat.shape
    W = WC // 3
    x = imgs_flat.reshape(B, H, W, 3).astype(jnp.float32)
    wv = wv_u[vidx]
    wh = wh_u[hidx]
    x = jnp.einsum("boh,bhwc->bowc", wv, x, precision=hp)
    x = jnp.einsum("bpw,bowc->bopc", wh, x, precision=hp)
    x = jnp.floor(jnp.clip(x, 0.0, 255.0) + 0.5)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.25678824 * r + 0.50412941 * g + 0.09790588 * b + 16.0
    u = -0.14822290 * r - 0.29099279 * g + 0.43921569 * b + 128.0
    v = 0.43921569 * r - 0.36778831 * g - 0.07142737 * b + 128.0
    OH = wv_u.shape[1]
    OW = wh_u.shape[1]

    def q8(p):
        return (
            jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0)
            .astype(jnp.uint8)
            .reshape(B, -1)
        )

    def sub(p):  # 2x2 box average (bucket dims are even)
        return p.reshape(B, OH // 2, 2, OW // 2, 2).mean(axis=(2, 4))

    return jnp.concatenate([q8(y), q8(sub(u)), q8(sub(v))], axis=1)


def resample_rgb_yuv_batch(imgs_flat, weights, vidx, hidx, out_shape):
    """Run the fused resample+convert kernel; returns (Y, U, V) u8 planes
    of shapes (B, OHb, OWb) and (B, OHb/2, OWb/2) x2 (crop on host)."""
    wv, wh = weights
    obh, obw = out_shape
    # opt-in Pallas layout-fusion front (VERDICT r4 #5 third front):
    # same rounded-u8 hand-off point, see ops/pallas_resize.py
    from imagekit_tpu.ops import pallas_resize

    if pallas_resize.rgb_enabled():
        flat = np.asarray(
            pallas_resize._resample_rgb_yuv_pallas(
                jnp.asarray(imgs_flat),
                jnp.asarray(wv),
                jnp.asarray(wh),
                jnp.asarray(vidx),
                jnp.asarray(hidx),
                interpret=pallas_resize.rgb_mode() == "interpret",
            )
        )
    else:
        flat = np.asarray(
            _resample_rgb_yuv_kernel(
                jnp.asarray(imgs_flat),
                jnp.asarray(wv),
                jnp.asarray(wh),
                jnp.asarray(vidx),
                jnp.asarray(hidx),
            )
        )
    B = flat.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = flat[:, :ny].reshape(B, obh, obw)
    u = flat[:, ny:ny + nc].reshape(B, obh // 2, obw // 2)
    v = flat[:, ny + nc:].reshape(B, obh // 2, obw // 2)
    return y, u, v


def rgb_to_yuv420_host(
    img: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Numpy mirror of the device kernel (host fallback; same math)."""
    h, w = img.shape[:2]
    ph, pw = h + (h & 1), w + (w & 1)
    rgb = img[:, :, :3].astype(np.float32)
    if (ph, pw) != (h, w):
        rgb = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.25678824 * r + 0.50412941 * g + 0.09790588 * b + 16.0
    u = -0.14822290 * r - 0.29099279 * g + 0.43921569 * b + 128.0
    v = 0.43921569 * r - 0.36778831 * g - 0.07142737 * b + 128.0

    def sub(p):
        q = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        return np.clip(np.floor(q + 0.5), 0, 255).astype(np.uint8)

    yq = np.clip(np.floor(y + 0.5), 0, 255).astype(np.uint8)
    return yq[:h, :w], sub(u), sub(v)


# JPEG full-range YCbCr -> VP8 studio-range YUV remap coefficients.
# Y' = 16 + (219/255) Y ; C' = 128 + (224/255)(C - 128). Both colour spaces
# share the BT.601 primaries, so this affine remap is exact.
Y_SCALE = 219.0 / 255.0
Y_OFFSET = 16.0
C_SCALE = 224.0 / 255.0


def jpeg_to_vp8_range(y, cb, cr):
    """Full-range YCbCr planes (float or u8 arrays) -> studio-range u8."""

    def remap(p, scale, off):
        q = np.asarray(p, np.float32) * scale + off
        return np.clip(np.floor(q + 0.5), 0, 255).astype(np.uint8)

    return (
        remap(y, Y_SCALE, Y_OFFSET),
        remap(cb, C_SCALE, 128.0 * (1 - C_SCALE)),
        remap(cr, C_SCALE, 128.0 * (1 - C_SCALE)),
    )
