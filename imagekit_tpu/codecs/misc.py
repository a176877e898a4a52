"""Native GIF/BMP decode glue (host unpack stages of the remaining small
source formats; reference decode arm ``src/transform.rs:27-43``).

GIF: first frame, LZW, interlace, GCE transparency (-> RGBA). BMP:
uncompressed 24/32bpp + 8bpp palette. Unsupported variants return None and
callers fall back to the host library. ``IMAGEKIT_NO_NATIVE_MISC=1`` forces
the host library path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_configured = False

_OK = 0
_UNSUPPORTED = -3


class _IkMiscInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("channels", ctypes.c_int32),
    ]


def _lib() -> Optional[ctypes.CDLL]:
    global _configured
    from imagekit_tpu.codecs.native import loader

    lib = loader.load()
    if lib is None or not hasattr(lib, "ik_gif_decode"):
        return None
    if not _configured:
        for name in ("ik_gif_parse", "ik_bmp_parse"):
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(_IkMiscInfo),
            ]
            fn.restype = ctypes.c_int
        for name in ("ik_gif_decode", "ik_bmp_decode"):
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_size_t,
            ]
            fn.restype = ctypes.c_int
        _configured = True
    return lib


def available() -> bool:
    if os.environ.get("IMAGEKIT_NO_NATIVE_MISC"):
        return False
    try:
        return _lib() is not None
    except Exception:
        return False


def _decode(data: bytes, parse_name: str, decode_name: str):
    lib = _lib()
    if lib is None:
        return None
    info = _IkMiscInfo()
    rc = getattr(lib, parse_name)(data, len(data), ctypes.byref(info))
    if rc == _UNSUPPORTED:
        return None
    if rc != _OK:
        raise ValueError(f"corrupt image ({rc})")
    _check_pixel_count(info.width, info.height)
    out = np.empty((info.height, info.width, info.channels), np.uint8)
    rc = getattr(lib, decode_name)(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc == _UNSUPPORTED:
        return None
    if rc != _OK:
        raise ValueError(f"corrupt image ({rc})")
    return out


def decode_gif(data: bytes) -> Optional[np.ndarray]:
    return _decode(data, "ik_gif_parse", "ik_gif_decode")


def decode_bmp(data: bytes) -> Optional[np.ndarray]:
    return _decode(data, "ik_bmp_parse", "ik_bmp_decode")


def _check_pixel_count(w: int, h: int) -> None:
    """Decompression-bomb guard: the native decoders bypass PIL's
    MAX_IMAGE_PIXELS check, so enforce the same ceiling here (a tiny
    compressed file must not allocate gigabytes of pixels)."""
    from PIL import Image

    limit = Image.MAX_IMAGE_PIXELS or 89_478_485
    if w * h > 2 * limit:  # PIL errors at 2x its warning threshold
        raise ValueError(f"image is too large ({w}x{h} pixels)")
