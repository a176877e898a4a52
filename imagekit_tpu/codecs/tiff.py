"""Native baseline-TIFF decode glue (host entropy stage of the TIFF
source path).

Replaces the host-library decode for strip-organised 8-bit TIFFs
(reference decode arm: ``src/transform.rs:27-43`` via the `image` crate's
bundled TIFF decoder): C++ parses the IFD, reassembles strips (none /
LZW / PackBits compression, horizontal-differencing predictor) and
expands gray/palette/RGB(A). Tiled, planar, 16-bit or exotic
compressions return None and callers fall back to the host library.

Set ``IMAGEKIT_NO_NATIVE_TIFF=1`` to force the host library path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_OK = 0
_UNSUPPORTED = -3

_configured = False


class _IkTiffInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("channels", ctypes.c_int32),
    ]


def _lib() -> Optional[ctypes.CDLL]:
    global _configured
    from imagekit_tpu.codecs.native import loader

    lib = loader.load()
    if lib is None or not hasattr(lib, "ik_tiff_decode"):
        return None
    if not _configured:
        lib.ik_tiff_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(_IkTiffInfo),
        ]
        lib.ik_tiff_parse.restype = ctypes.c_int
        lib.ik_tiff_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ik_tiff_decode.restype = ctypes.c_int
        _configured = True
    return lib


def available() -> bool:
    if os.environ.get("IMAGEKIT_NO_NATIVE_TIFF"):
        return False
    try:
        return _lib() is not None
    except Exception:
        return False


def decode(data: bytes) -> Optional[np.ndarray]:
    """Decode a TIFF to HWC u8 (RGB, or RGBA for ExtraSamples alpha).
    Returns None when this source needs the host-library fallback
    (tiled/planar/16-bit/exotic compression); raises ValueError on
    corrupt data."""
    lib = _lib()
    if lib is None:
        return None
    info = _IkTiffInfo()
    rc = lib.ik_tiff_parse(data, len(data), ctypes.byref(info))
    if rc == _UNSUPPORTED:
        return None
    if rc != _OK:
        raise ValueError(f"corrupt TIFF ({rc})")
    _check_pixel_count(info.width, info.height)
    out = np.empty((info.height, info.width, info.channels), np.uint8)
    rc = lib.ik_tiff_decode(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc == _UNSUPPORTED:
        return None
    if rc != _OK:
        raise ValueError(f"corrupt TIFF ({rc})")
    return out


def _check_pixel_count(w: int, h: int) -> None:
    """Decompression-bomb guard, same ceiling as the host library."""
    from PIL import Image

    limit = Image.MAX_IMAGE_PIXELS or 89_478_485
    if w * h > 2 * limit:
        raise ValueError(f"image is too large ({w}x{h} pixels)")
