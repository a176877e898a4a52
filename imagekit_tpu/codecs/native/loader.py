"""Lazy builder/loader for the native codec shared library (ctypes).

The extension is compiled on first use:

    g++ -O3 -march=native -shared -fPIC jpeg_entropy.cpp -o libik_native.so

and memoised. ``load()`` returns None when the source or toolchain is
missing so callers can fall back to host-library codecs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "jpeg_entropy.cpp"
_SOURCES = (
    "jpeg_entropy.cpp",
    "vp8_encode.cpp",
    "vp8_decode.cpp",
    "vp8l_decode.cpp",
    "png_decode.cpp",
    "misc_decode.cpp",
    "tiff_decode.cpp",
    "av1_enc.cpp",
)
_LIB = _HERE / "libik_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_attempted = False


def _build() -> bool:
    srcs = [_HERE / s for s in _SOURCES if (_HERE / s).exists()]
    if not srcs:
        return False
    newest = max(s.stat().st_mtime for s in srcs)
    hdr = _HERE / "vp8_tables.h"
    if hdr.exists():
        newest = max(newest, hdr.stat().st_mtime)
    if _LIB.exists() and _LIB.stat().st_mtime >= newest:
        return True
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-funroll-loops",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fvisibility=hidden",
        *[str(s) for s in srcs],
        "-o",
        str(_LIB),
        "-lz",  # png_decode.cpp inflates IDAT via zlib
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120, cwd=_HERE
        )
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _attempted
    with _lock:
        if _lib is not None:
            return _lib
        if _attempted and not os.environ.get("IMAGEKIT_NATIVE_RETRY"):
            return None
        _attempted = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        _configure(lib)
        _lib = lib
        return _lib


def _configure(lib: ctypes.CDLL) -> None:
    """Declare C ABI signatures (filled in alongside jpeg_entropy.cpp)."""
    from imagekit_tpu.codecs.native import jpeg_abi

    jpeg_abi.configure(lib)


def decode_jpeg(data: bytes):
    from imagekit_tpu.codecs.native import jpeg_abi

    lib = load()
    if lib is None:
        raise RuntimeError("native codec library unavailable")
    return jpeg_abi.decode(lib, data)


def encode_jpeg(planes, qtabs, width: int, height: int) -> bytes:
    from imagekit_tpu.codecs.native import jpeg_abi

    lib = load()
    if lib is None:
        raise RuntimeError("native codec library unavailable")
    return jpeg_abi.encode(lib, planes, qtabs, width, height)
