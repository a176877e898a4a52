"""Separable image resampling as batched matmuls.

The reference resizes with the ``image`` crate's two-pass sampler
(``src/transform.rs:85-89`` -> imageops ``resize``: vertical pass then
horizontal pass, f32 intermediate, per-output-pixel kernel windows with
normalised weights, final clamp to [0,255] and round-half-away-from-zero).
Rather than porting that scalar loop, we express each pass as a dense
weight matrix so a whole batch resamples as two MXU matmuls:

    out[b, o, p, c] = sum_h sum_w  Wv[o, h] * img[b, h, w, c] * Wh[p, w]

Weight matrices are computed on host in float32 with the *same* windowing,
clamping, and normalisation semantics as the reference's sampler, so the
linear map is identical; only the summation order differs (f32 matmul with
HIGHEST precision), which is far inside the 45 dB PSNR budget.

Output-dimension math is also reproduced exactly:
- the /img handler's aspect math in f32 with round-half-away-from-zero
  (``src/transform.rs:74-82``),
- fit-within box semantics in f64 (``DynamicImage::resize`` ->
  ``resize_dimensions``; confirmed by the reference's own test:
  1920x1080 + (640,480) -> 640x360, ``tests/transform.rs:239-248``),
- the ``max(1)`` clamp (``src/transform.rs:86-87``).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagekit_tpu.utils.precision import MATMUL_PRECISION

# ---------------------------------------------------------------------------
# Filter kernels (f32 semantics, matching the classic windowed-sinc family
# used by the reference's resampler).
# ---------------------------------------------------------------------------


def _sinc(x: np.ndarray) -> np.ndarray:
    a = (x * np.float32(np.pi)).astype(np.float32)
    out = np.ones_like(x, dtype=np.float32)
    nz = x != 0
    out[nz] = (np.sin(a[nz]) / a[nz]).astype(np.float32)
    return out


def _lanczos3(x: np.ndarray) -> np.ndarray:
    t = np.float32(3.0)
    out = np.zeros_like(x, dtype=np.float32)
    m = np.abs(x) < t
    out[m] = (_sinc(x[m]) * _sinc(x[m] / t)).astype(np.float32)
    return out


def _triangle(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x).astype(np.float32)
    return np.where(ax < 1.0, np.float32(1.0) - ax, np.float32(0.0)).astype(
        np.float32
    )


def _catmull_rom(x: np.ndarray) -> np.ndarray:
    a = np.abs(x).astype(np.float32)
    a2 = a * a
    a3 = a2 * a
    out = np.zeros_like(a)
    m1 = a < 1.0
    m2 = (a >= 1.0) & (a < 2.0)
    out[m1] = (1.5 * a3 - 2.5 * a2 + 1.0)[m1]
    out[m2] = (-0.5 * a3 + 2.5 * a2 - 4.0 * a + 2.0)[m2]
    return out.astype(np.float32)


def _gaussian(x: np.ndarray) -> np.ndarray:
    r = np.float32(0.5)
    return (
        np.exp(-(x.astype(np.float32) ** 2) / (2.0 * r * r))
        / np.float32(np.sqrt(2.0 * np.pi) * r)
    ).astype(np.float32)


def _box(x: np.ndarray) -> np.ndarray:
    return (np.abs(x) <= 0.5).astype(np.float32)


# name -> (support, kernel). "lanczos3" is what the reference always uses.
FILTERS: Dict[str, Tuple[float, Callable[[np.ndarray], np.ndarray]]] = {
    "lanczos3": (3.0, _lanczos3),
    "triangle": (1.0, _triangle),
    "bilinear": (1.0, _triangle),
    "catmullrom": (2.0, _catmull_rom),
    "gaussian": (3.0, _gaussian),
    "nearest": (0.0, _box),
}


# ---------------------------------------------------------------------------
# Weight-matrix construction (host, numpy, f32).
# ---------------------------------------------------------------------------


from imagekit_tpu.utils.sized_cache import SizedArrayCache

_WEIGHTS_CACHE = SizedArrayCache(64 * 1024 * 1024)


def resample_weights(true_in, true_out, filter_name="lanczos3"):
    """Cached (byte-budgeted) resample weight matrix; see the impl below."""
    key = ("rw", true_in, true_out, filter_name)
    return _WEIGHTS_CACHE.get_or_build(
        key, lambda: _resample_weights_impl(true_in, true_out, filter_name)
    )


def _resample_weights_impl(
    in_size: int, out_size: int, filter_name: str = "lanczos3"
) -> np.ndarray:
    """Dense (out_size, in_size) f32 weight matrix for one axis.

    Per output pixel: window centre ``(o + 0.5) * ratio`` in source space,
    support scaled by ``max(ratio, 1)``, window ``[floor(c - s), ceil(c + s))``
    clamped to the image, kernel evaluated at ``(i - (c - 0.5)) / sratio``,
    weights normalised to sum 1 — the same sampling rule as the reference's
    two-pass resampler (see module docstring).
    """
    if filter_name not in FILTERS:
        raise ValueError(f"unknown filter: {filter_name}")
    if filter_name == "nearest":
        return _nearest_weights(in_size, out_size)

    support, kernel = FILTERS[filter_name]
    ratio = np.float32(in_size) / np.float32(out_size)
    sratio = ratio if ratio >= 1.0 else np.float32(1.0)
    src_support = np.float32(support) * sratio

    W = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        center = np.float32(np.float32(o) + np.float32(0.5)) * ratio
        left = int(np.floor(np.float32(center - src_support)))
        left = min(max(left, 0), in_size - 1)
        right = int(np.ceil(np.float32(center + src_support)))
        right = min(max(right, left + 1), in_size)
        c = np.float32(center - np.float32(0.5))
        idx = np.arange(left, right, dtype=np.float32)
        w = kernel(((idx - c) / sratio).astype(np.float32))
        s = w.sum(dtype=np.float32)
        if s != 0:
            w = (w / s).astype(np.float32)
        W[o, left:right] = w
    return W


def _nearest_weights(in_size: int, out_size: int) -> np.ndarray:
    """Nearest-neighbour as a 0/1 selection matrix."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    ratio = in_size / out_size
    for o in range(out_size):
        src = min(int((o + 0.5) * ratio), in_size - 1)
        W[o, src] = 1.0
    return W


# ---------------------------------------------------------------------------
# Output-dimension math (reference parity).
# ---------------------------------------------------------------------------


def _round_f32_half_away(x: np.float32) -> int:
    """Rust f32::round — round half away from zero (positive inputs here)."""
    return int(np.floor(np.float32(x) + np.float32(0.5)))


def _round_f64_half_away(x: float) -> int:
    return int(np.floor(x + 0.5))


def fit_within(
    orig_w: int, orig_h: int, box_w: int, box_h: int
) -> Tuple[int, int]:
    """Aspect-preserving fit inside a bounding box, f64 math with
    round-half-away-from-zero and a floor of 1 px — the semantics of the
    resize entry the reference calls (``src/transform.rs:85-89``)."""
    wratio = box_w / orig_w
    hratio = box_h / orig_h
    ratio = min(wratio, hratio)
    nw = max(_round_f64_half_away(orig_w * ratio), 1)
    nh = max(_round_f64_half_away(orig_h * ratio), 1)
    return nw, nh


def target_dimensions(
    orig_w: int, orig_h: int, w: Optional[int], h: Optional[int]
) -> Tuple[int, int]:
    """Full reference dimension pipeline (``src/transform.rs:62-90``):
    fill in the missing dimension with f32 ratio math, clamp to >= 1, then
    fit-within. Returns the original size when both are None."""
    if w is None and h is None:
        return orig_w, orig_h
    if w is None:
        ratio = np.float32(h) / np.float32(orig_h)
        w = _round_f32_half_away(np.float32(orig_w) * ratio)
    if h is None:
        ratio = np.float32(w) / np.float32(orig_w)
        h = _round_f32_half_away(np.float32(orig_h) * ratio)
    return fit_within(orig_w, orig_h, max(int(w), 1), max(int(h), 1))


# ---------------------------------------------------------------------------
# Batched device resample.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _resample_kernel(
    imgs: jax.Array, wv: jax.Array, wh: jax.Array, out_dtype=jnp.uint8
) -> jax.Array:
    """(B, H, W, C) -> (B, OH, OW, C). Two MXU matmuls in f32 HIGHEST,
    then clamp + round-half-away-from-zero to match the reference's final
    u8 conversion."""
    x = imgs.astype(jnp.float32)
    # vertical pass first, like the reference's resampler
    x = jnp.einsum("oh,bhwc->bowc", wv, x, precision=MATMUL_PRECISION)
    x = jnp.einsum("pw,bowc->bopc", wh, x, precision=MATMUL_PRECISION)
    if out_dtype == jnp.uint8:
        x = jnp.clip(x, 0.0, 255.0)
        x = jnp.floor(x + 0.5)
    return x.astype(out_dtype)


def resize_batch(
    imgs: jax.Array | np.ndarray,
    out_h: int,
    out_w: int,
    filter_name: str = "lanczos3",
    out_dtype=jnp.uint8,
) -> jax.Array:
    """Resample a batch of NHWC images to (out_h, out_w).

    Weight matrices are host-computed (cached per shape/filter) and shipped
    once per compiled shape; the data path is two f32 matmuls on device.
    """
    _, h, w, _ = imgs.shape
    wv = jnp.asarray(resample_weights(h, out_h, filter_name))
    wh = jnp.asarray(resample_weights(w, out_w, filter_name))
    return _resample_kernel(jnp.asarray(imgs), wv, wh, out_dtype=out_dtype)


def resize_image_array(
    img: np.ndarray,
    w: Optional[int],
    h: Optional[int],
    filter_name: str = "lanczos3",
) -> np.ndarray:
    """Single-image convenience with full reference semantics
    (``src/transform.rs:62-90``): no-op when both dims are None, aspect
    math + fit-within otherwise. HWC uint8 in, HWC uint8 out."""
    if w is None and h is None:
        return img
    oh, ow = img.shape[0], img.shape[1]
    tw, th = target_dimensions(ow, oh, w, h)
    if (tw, th) == (ow, oh) and filter_name == "nearest":
        return img
    squeeze = False
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    out = np.asarray(resize_batch(img[None], th, tw, filter_name))[0]
    return out[:, :, 0] if squeeze else out


def padded_weights(
    true_in: int,
    true_out: int,
    bucket_in: int,
    bucket_out: int,
    filter_name: str = "lanczos3",
) -> np.ndarray:
    """Weight matrix for a (true_in -> true_out) resample embedded in a
    (bucket_out, bucket_in) zero matrix.

    This is the key to shape-bucketed batching without recompilation storms
    (SURVEY.md §7 "hard parts"): the *compiled* shapes are bucket shapes,
    while the true geometry lives in the weights, which are runtime data.
    Zero columns mean padded input rows/cols contribute nothing (so padding
    never corrupts borders — unlike padding the image and using bucket-sized
    weights), and output rows beyond ``true_out`` come out zero and are
    cropped on host.
    """
    if true_in > bucket_in or true_out > bucket_out:
        raise ValueError("true size exceeds bucket")
    w = resample_weights(true_in, true_out, filter_name)
    out = np.zeros((bucket_out, bucket_in), dtype=np.float32)
    out[:true_out, :true_in] = w
    return out


@jax.jit
def _resample_perimage_kernel(
    imgs: jax.Array, wv: jax.Array, wh: jax.Array
) -> jax.Array:
    """(B, Hb, Wb, C) x (B, OHb, Hb) x (B, OWb, Wb) -> (B, OHb, OWb, C) u8.

    Per-image weights let one compiled executable serve every (true in,
    true out) combination that fits the bucket pair. Batched matmuls map
    onto the MXU; f32 HIGHEST for PSNR parity.
    """
    x = imgs.astype(jnp.float32)
    x = jnp.einsum("boh,bhwc->bowc", wv, x, precision=MATMUL_PRECISION)
    x = jnp.einsum("bpw,bowc->bopc", wh, x, precision=MATMUL_PRECISION)
    x = jnp.clip(x, 0.0, 255.0)
    return jnp.floor(x + 0.5).astype(jnp.uint8)


def resample_bucketed(
    imgs: np.ndarray | jax.Array, wv: np.ndarray, wh: np.ndarray
) -> jax.Array:
    """Run the bucket-shaped per-image resample; crop on host afterwards."""
    return _resample_perimage_kernel(
        jnp.asarray(imgs), jnp.asarray(wv), jnp.asarray(wh)
    )


@functools.partial(jax.jit, static_argnames=("channels",))
def _resample_flat_kernel(
    imgs_flat: jax.Array,
    wv_u: jax.Array,
    wh_u: jax.Array,
    vidx: jax.Array,
    hidx: jax.Array,
    channels: int = 3,
) -> jax.Array:
    """Transfer-optimised bucketed resample.

    Host<->device transfers of u8 NHWC arrays are catastrophic on TPU: the
    minor dimension (C=3) pads to the 128-lane tile, inflating bytes moved
    by ~42x. Inputs/outputs here are therefore *flat* ``(B, H, W*C)`` u8
    (minor dim a multiple of 128 for standard buckets) and the NHWC view
    exists only on device. Weight matrices arrive deduplicated — ``wv_u``
    is the stack of unique (true_in -> true_out) matrices and ``vidx`` maps
    each batch element to its matrix — so a uniform batch ships one matrix
    instead of B copies.
    """
    B, H, WC = imgs_flat.shape
    W = WC // channels
    x = imgs_flat.reshape(B, H, W, channels).astype(jnp.float32)
    wv = wv_u[vidx]  # (B, OH, H) gather on device
    wh = wh_u[hidx]  # (B, OW, W)
    x = jnp.einsum("boh,bhwc->bowc", wv, x, precision=MATMUL_PRECISION)
    x = jnp.einsum("bpw,bowc->bopc", wh, x, precision=MATMUL_PRECISION)
    x = jnp.clip(x, 0.0, 255.0)
    x = jnp.floor(x + 0.5).astype(jnp.uint8)
    OH = wv_u.shape[1]
    OW = wh_u.shape[1]
    # fully flat 2D output: 3D u8 outputs with a non-128-multiple minor dim
    # transfer pathologically slowly off-device (measured ~400x slower)
    return x.reshape(B, OH * OW * channels)


def resample_bucketed_flat(
    imgs_flat: np.ndarray,
    wv_unique: np.ndarray,
    wh_unique: np.ndarray,
    vidx: np.ndarray,
    hidx: np.ndarray,
    channels: int = 3,
) -> jax.Array:
    return _resample_flat_kernel(
        jnp.asarray(imgs_flat),
        jnp.asarray(wv_unique),
        jnp.asarray(wh_unique),
        jnp.asarray(vidx),
        jnp.asarray(hidx),
        channels=channels,
    )


def resample_reference(
    img: np.ndarray, out_h: int, out_w: int, filter_name: str = "lanczos3"
) -> np.ndarray:
    """Pure-numpy golden model (vertical pass then horizontal pass with an
    f32 intermediate, clamp+round at the end) used by tests to validate the
    matmul formulation against the reference algorithm's structure."""
    x = img.astype(np.float32)
    wv = resample_weights(x.shape[0], out_h, filter_name)
    x = np.einsum("oh,hwc->owc", wv, x)
    wh = resample_weights(img.shape[1], out_w, filter_name)
    x = np.einsum("pw,owc->opc", wh, x)
    x = np.clip(x, 0.0, 255.0)
    return np.floor(x + 0.5).astype(np.uint8)
