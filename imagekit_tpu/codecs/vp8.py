"""TPU-native WebP (VP8) encode glue.

Split per SURVEY.md §2.2 (reference arm: ``src/transform.rs:129-137``):

- device (:mod:`imagekit_tpu.ops.color`): RGB -> studio-range YUV + 4:2:0
  box subsampling, batched;
- host C++ (:mod:`codecs.native` ``vp8_encode.cpp``): intra prediction from
  reconstructed neighbours, 4x4 fDCT/WHT, quantisation, boolean arithmetic
  coding, RIFF container.

Quality->quantiser uses libwebp's mapping (sns_strength=0), so output
quality tracks the reference's ``webp::Encoder`` closely; parity is
validated by the PSNR sweep in ``tests/test_vp8.py`` (within 1.5 dB of
libwebp at every q), not byte equality — SURVEY.md §7.

Set ``IMAGEKIT_NO_NATIVE_WEBP=1`` to force the host libwebp path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from imagekit_tpu.errors import TransformError

_configured = False


def _lib() -> Optional[ctypes.CDLL]:
    global _configured
    from imagekit_tpu.codecs.native import loader

    lib = loader.load()
    if lib is None:
        return None
    if not _configured:
        if not hasattr(lib, "ik_vp8_encode"):
            return None  # stale library built before vp8_encode.cpp existed
        lib.ik_vp8_encode.restype = ctypes.c_int64
        lib.ik_vp8_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        _configured = True
    return lib


def available() -> bool:
    if os.environ.get("IMAGEKIT_NO_NATIVE_WEBP"):
        return False
    try:
        return _lib() is not None
    except Exception:
        return False


def encode_yuv420(
    y: np.ndarray, u: np.ndarray, v: np.ndarray, quality: int
) -> bytes:
    """Encode studio-range YUV 4:2:0 planes to a complete WebP file."""
    lib = _lib()
    if lib is None:
        raise TransformError("native VP8 encoder unavailable")
    y = np.ascontiguousarray(y, np.uint8)
    u = np.ascontiguousarray(u, np.uint8)
    v = np.ascontiguousarray(v, np.uint8)
    h, w = y.shape
    if u.shape != ((h + 1) // 2, (w + 1) // 2) or v.shape != u.shape:
        raise TransformError("chroma planes must be 4:2:0 geometry")
    cap = w * h * 2 + 65536
    out = np.empty(cap, np.uint8)
    n = lib.ik_vp8_encode(
        y.ctypes.data,
        u.ctypes.data,
        v.ctypes.data,
        w,
        h,
        y.strides[0],
        u.strides[0],
        int(min(max(quality, 1), 100)),
        out.ctypes.data,
        cap,
    )
    if n < 0:
        raise TransformError(f"VP8 encode failed ({n})")
    return out[:n].tobytes()


def encode_rgb(
    img: np.ndarray, quality: int, *, prefer_device: bool = False
) -> bytes:
    """RGB -> WebP via the native VP8 encoder.

    Colour conversion runs on HOST here by default: this entry takes exact
    (unbucketed) shapes, and jitting the device conversion per exact shape
    would violate the compiled-shape discipline (each distinct target size
    would pay a 30s-7min remote compile on the tunnelled TPU). The batched
    serving path instead produces YUV planes directly from the *bucketed*
    device kernels (bounded shape set) and calls :func:`encode_yuv420`.
    """
    from imagekit_tpu.ops import color

    if prefer_device:
        try:
            y, u, v = color.rgb_to_yuv420(img)
        except Exception:
            y, u, v = color.rgb_to_yuv420_host(img)
    else:
        y, u, v = color.rgb_to_yuv420_host(img)
    return encode_yuv420(y, u, v, quality)
