"""AVIF encode: direct libavif ctypes ABI fed device-produced YUV planes.

The reference encodes AVIF from RGBA via ravif at speed 4 / quality q
(``src/transform.rs:138-146``). Here the serving engine's fused device
heads (``rgbyuv`` for RGB sources, ``yuvsrc`` for WebP/AVIF sources —
docs/ARCHITECTURE.md fusion matrix) already produce studio-range BT.601
YUV 4:2:0, which is libavif's *native* input type (``avifImage``) — so
AVIF outputs take the same no-RGB-round-trip path as WebP outputs: the
host contributes only the AV1 bitstream, exactly mirroring the decode
side's direct dav1d split (codecs/avif_native.py).

ABI safety (the dav1d pattern, strengthened): libavif 0.11.1's structs
are bound by explicit offsets that were pinned empirically on this ABI
(encoder: codecChoice@0 maxThreads@4 speed@8 minQuantizer@24
maxQuantizer@28 minQuantizerAlpha@32 maxQuantizerAlpha@36 — verified by
default-fingerprint AND by observing each field's effect on real
encodes; image: yuvRange@16, yuvPlanes@24, yuvRowBytes@48, alpha@64-72,
CICP u16 trio@104). On first use the module runs a full LOSSLESS
round-trip self-check — encode known planes at quantizer 0, re-parse the
container with this codebase's own native parser, decode through the
direct dav1d core, and require BIT-EXACT planes plus the exact nclx
properties written. Any mismatch permanently disables the path and
callers fall back to the host PIL encoder, so an ABI drift can never
emit a wrong bitstream.

Codec choice: libavif on this box bundles aom, rav1e (the reference's
ravif engine) and SVT-AV1. Default is aom — measured strictly better
than rav1e on this host (smaller output at equal quantizer, 3-5x
faster; docs/PARITY_REPORT.md AVIF table) — selectable via
``IMAGEKIT_AVIF_CODEC`` for reference-engine parity runs.

Speed: ``IMAGEKIT_AVIF_SPEED`` (default 8) — the calibrated operating
point that holds the reference's published 10-25 enc/s/core AVIF band
on the 1-core dev host (docs/ARCHITECTURE.md); the reference's ravif
speed-4 point is a different scale and is covered by the parity table,
not the serving default.

Alpha: fully-opaque sources are encoded WITHOUT an alpha plane (the
reference pads to RGBA and always carries one, ``src/transform.rs:140``)
— a ledger'd deliberate fix (docs/ARCHITECTURE.md): an all-255 plane
costs bytes and carries no information; decoders composite identically.
Sources with a real alpha channel keep the host-library path.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Tuple

import numpy as np

# -- pinned ABI offsets (libavif.so.15 / 0.11.1, LP64) --
_ENC_CODEC_CHOICE = 0
_ENC_MAX_THREADS = 4
_ENC_SPEED = 8
_ENC_MIN_Q = 24
_ENC_MAX_Q = 28
_ENC_MIN_Q_ALPHA = 32
_ENC_MAX_Q_ALPHA = 36

_IMG_YUV_RANGE = 16
_IMG_YUV_PLANES = 24     # uint8_t *yuvPlanes[3]
_IMG_YUV_ROWBYTES = 48   # uint32_t yuvRowBytes[3]
_IMG_ALPHA_PLANE = 64
_IMG_ALPHA_ROWBYTES = 72
_IMG_CICP = 104          # u16 colorPrimaries, transferCharacteristics,
#                          matrixCoefficients at 104/106/108

_PIXEL_FORMAT_YUV420 = 3
_PIXEL_FORMAT_YUV400 = 4
_RANGE_LIMITED = 0
_PLANES_YUV = 1
_PLANES_ALPHA = 2
_CODEC_CHOICE_AUTO = 0

# CICP written on every image: BT.709 primaries, sRGB transfer, BT.601
# matrix — matching the YUV the fused device heads produce and the gate
# the native decode side accepts (avif_native.decode_yuv420_studio).
_CICP_VALUES = (1, 13, 6)

AVIF_SPEED = int(os.environ.get("IMAGEKIT_AVIF_SPEED", "8"))
_CODEC_ENV = os.environ.get("IMAGEKIT_AVIF_CODEC", "")

_lock = threading.Lock()
_state: dict = {"lib": None, "attempted": False, "disabled": False,
                "codec": _CODEC_CHOICE_AUTO}


class _RWData(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("size", ctypes.c_size_t)]


def _bind(lib: ctypes.CDLL) -> None:
    lib.avifEncoderCreate.restype = ctypes.c_void_p
    lib.avifEncoderCreate.argtypes = []
    lib.avifEncoderDestroy.argtypes = [ctypes.c_void_p]
    lib.avifEncoderWrite.restype = ctypes.c_int
    lib.avifEncoderWrite.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p
    ]
    lib.avifImageCreate.restype = ctypes.c_void_p
    lib.avifImageCreate.argtypes = [
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int
    ]
    lib.avifImageDestroy.argtypes = [ctypes.c_void_p]
    lib.avifImageAllocatePlanes.restype = ctypes.c_int
    lib.avifImageAllocatePlanes.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.avifRWDataFree.argtypes = [ctypes.c_void_p]
    lib.avifResultToString.restype = ctypes.c_char_p
    lib.avifResultToString.argtypes = [ctypes.c_int]
    lib.avifCodecChoiceFromName.restype = ctypes.c_int
    lib.avifCodecChoiceFromName.argtypes = [ctypes.c_char_p]
    lib.avifCodecName.restype = ctypes.c_char_p
    lib.avifCodecName.argtypes = [ctypes.c_int, ctypes.c_uint32]


def _fingerprint_ok(lib: ctypes.CDLL) -> bool:
    """Cheap layout check: a fresh encoder must show exactly the 0.11.1
    default pattern at the pinned offsets (codecChoice 0, maxThreads 1,
    speed -1, keyframeInterval 0, timescale u64 1, then zeroed quantiser/
    tile block). Anything else means a different libavif ABI."""
    enc = lib.avifEncoderCreate()
    if not enc:
        return False
    try:
        i32 = (ctypes.c_int32 * 14).from_address(enc)
        expect = [0, 1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        return list(i32) == expect
    finally:
        lib.avifEncoderDestroy(enc)


def _selftest(lib: ctypes.CDLL, codec: int) -> bool:
    """Lossless round trip through our OWN container parser + direct
    dav1d core: bit-exact planes or the path is disabled."""
    rng = np.random.default_rng(7)
    y = rng.integers(16, 236, (32, 48), dtype=np.uint8)
    cb = rng.integers(16, 241, (16, 24), dtype=np.uint8)
    cr = rng.integers(16, 241, (16, 24), dtype=np.uint8)
    try:
        data = _encode_planes(lib, codec, y, cb, cr, quantizer=0, speed=6)
    except Exception:  # noqa: BLE001 - any ABI surprise disables
        return False
    if not (len(data) > 12 and data[4:8] == b"ftyp"):
        return False
    from imagekit_tpu.codecs import avif_native

    try:
        info = avif_native.parse_container(data)
    except ValueError:
        return False
    if (
        info.width != 48 or info.height != 32
        or not info.has_nclx or info.matrix != 6 or info.full_range
        or info.has_alpha or info.high_bitdepth
    ):
        return False
    if not avif_native.decode_available():
        # encoder ABI can't be *proven* without the independent decoder
        return False
    planes = avif_native.decode_yuv420_studio(data)
    if planes is None:
        return False
    y2, cb2, cr2 = planes
    return (
        np.array_equal(y, y2)
        and np.array_equal(cb, cb2)
        and np.array_equal(cr, cr2)
    )


def _load() -> Optional[ctypes.CDLL]:
    with _lock:
        if _state["disabled"]:
            return None
        if _state["lib"] is not None:
            return _state["lib"]
        if _state["attempted"]:
            return None
        _state["attempted"] = True
        try:
            lib = ctypes.CDLL("libavif.so.15")
            _bind(lib)
        except (OSError, AttributeError):
            return None
        if not _fingerprint_ok(lib):
            _state["disabled"] = True
            return None
        codec = _CODEC_CHOICE_AUTO
        if _CODEC_ENV:
            c = lib.avifCodecChoiceFromName(_CODEC_ENV.encode())
            # must actually be able to encode (flag 1<<1)
            if c > 0 and lib.avifCodecName(c, 1 << 1):
                codec = c
        if not _selftest(lib, codec):
            _state["disabled"] = True
            return None
        _state["codec"] = codec
        _state["lib"] = lib
        return lib


def available() -> bool:
    return _load() is not None


def quality_to_quantizer(quality: int) -> int:
    """Reference-shaped quality (1-100) -> AV1 quantizer (0-63), the
    linear map modern libavif uses for its quality knob; q=100 hits
    quantizer 0 (aom lossless)."""
    q = min(max(int(quality), 1), 100)
    return ((100 - q) * 63 + 50) // 100


def quantizer_to_qindex(quantizer: int) -> int:
    """AV1 quantizer (0-63) -> base_q_idx (0-255), aom's
    av1_quantizer_to_qindex linear map (qindex = quantizer * 4), floored
    at 1 because the first-party encoder has no lossless mode."""
    return min(max(int(quantizer) * 4, 1), 255)


def firstparty_requested() -> bool:
    """IMAGEKIT_AVIF_FIRSTPARTY routes AVIF encodes through the
    in-process first-party AV1 encoder (codecs/av1_image.py) instead of
    the libavif ABI — always-available (pure in-process), dav1d-
    conformant output, but a simpler rate model than aom (DC-pred
    intra), so it is opt-in for production and the automatic last
    resort when no system AVIF encoder exists at all."""
    return os.environ.get("IMAGEKIT_AVIF_FIRSTPARTY", "") not in (
        "", "0", "off", "false")


def encode_firstparty(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    quality: int,
    alpha: Optional[np.ndarray] = None,
) -> bytes:
    """First-party AVIF from studio-range BT.601 4:2:0 planes — the
    in-process encoder behind the same plane contract as
    encode_yuv420_studio (arbitrary dims via pad + CleanAperture)."""
    from .av1_image import encode_avif

    return encode_avif(
        y, cb, cr,
        qindex=quantizer_to_qindex(quality_to_quantizer(quality)),
        alpha=alpha)


def _encode_planes(
    lib: ctypes.CDLL,
    codec: int,
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    quantizer: int,
    speed: int,
    alpha: Optional[np.ndarray] = None,
) -> bytes:
    h, w = y.shape
    img = lib.avifImageCreate(w, h, 8, _PIXEL_FORMAT_YUV420)
    if not img:
        raise MemoryError("avifImageCreate failed")
    enc = None
    out = _RWData()
    try:
        ctypes.c_int32.from_address(img + _IMG_YUV_RANGE).value = (
            _RANGE_LIMITED
        )
        for i, v in enumerate(_CICP_VALUES):
            ctypes.c_uint16.from_address(img + _IMG_CICP + 2 * i).value = v
        res = lib.avifImageAllocatePlanes(img, _PLANES_YUV)
        if res != 0:
            raise ValueError(_result_str(lib, res))
        planes = (ctypes.c_void_p * 3).from_address(img + _IMG_YUV_PLANES)
        rowbytes = (ctypes.c_uint32 * 3).from_address(img + _IMG_YUV_ROWBYTES)
        for idx, arr in ((0, y), (1, cb), (2, cr)):
            _copy_plane(planes[idx], rowbytes[idx], arr)
        if alpha is not None:
            res = lib.avifImageAllocatePlanes(img, _PLANES_ALPHA)
            if res != 0:
                raise ValueError(_result_str(lib, res))
            aptr = ctypes.c_void_p.from_address(img + _IMG_ALPHA_PLANE).value
            arb = ctypes.c_uint32.from_address(
                img + _IMG_ALPHA_ROWBYTES
            ).value
            _copy_plane(aptr, arb, alpha)
        enc = lib.avifEncoderCreate()
        if not enc:
            raise MemoryError("avifEncoderCreate failed")
        qz = min(max(int(quantizer), 0), 63)
        for off, val in (
            (_ENC_CODEC_CHOICE, codec),
            (_ENC_MAX_THREADS, 1),
            (_ENC_SPEED, min(max(int(speed), 0), 10)),
            (_ENC_MIN_Q, qz),
            (_ENC_MAX_Q, qz),
            # alpha is shape data: keep it near-lossless like the host
            # libraries do
            (_ENC_MIN_Q_ALPHA, 0),
            (_ENC_MAX_Q_ALPHA, min(qz, 16)),
        ):
            ctypes.c_int32.from_address(enc + off).value = val
        res = lib.avifEncoderWrite(enc, img, ctypes.byref(out))
        if res != 0 or not out.size:
            raise ValueError(f"avif encode failed: {_result_str(lib, res)}")
        return ctypes.string_at(out.data, out.size)
    finally:
        if out.data:
            lib.avifRWDataFree(ctypes.byref(out))
        if enc:
            lib.avifEncoderDestroy(enc)
        lib.avifImageDestroy(img)


def _copy_plane(dst: int, rowbytes: int, arr: np.ndarray) -> None:
    ph, pw = arr.shape
    src = np.ascontiguousarray(arr)
    if rowbytes == pw:
        ctypes.memmove(dst, src.ctypes.data, ph * pw)
        return
    for row in range(ph):
        ctypes.memmove(dst + row * rowbytes, src.ctypes.data + row * pw, pw)


def _result_str(lib: ctypes.CDLL, res: int) -> str:
    s = lib.avifResultToString(res)
    return s.decode("ascii", "replace") if s else f"avifResult {res}"


def encode_yuv420_studio(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    quality: int,
    speed: Optional[int] = None,
    alpha: Optional[np.ndarray] = None,
) -> bytes:
    """Studio-range BT.601 4:2:0 planes (the fused device heads' output
    layout: y (H,W) u8, cb/cr ((H+1)//2,(W+1)//2) u8) -> AVIF bytes.
    Raises ValueError if the path is unavailable or the encode fails —
    callers decide the fallback.  IMAGEKIT_AVIF_FIRSTPARTY routes
    through the in-process encoder instead; with no libavif at all the
    first-party encoder serves automatically (AVIF output never depends
    on a system AV1 library)."""
    if y.dtype != np.uint8 or cb.dtype != np.uint8 or cr.dtype != np.uint8:
        raise ValueError("planes must be uint8")
    h, w = y.shape
    if cb.shape != ((h + 1) // 2, (w + 1) // 2) or cr.shape != cb.shape:
        raise ValueError("chroma geometry must be 4:2:0 of the luma plane")
    if alpha is not None and alpha.shape != (h, w):
        raise ValueError("alpha plane must match luma geometry")
    if firstparty_requested():
        return encode_firstparty(y, cb, cr, quality, alpha=alpha)
    lib = _load()
    if lib is None:
        return encode_firstparty(y, cb, cr, quality, alpha=alpha)
    return _encode_planes(
        lib,
        _state["codec"],
        y,
        cb,
        cr,
        quantizer=quality_to_quantizer(quality),
        speed=AVIF_SPEED if speed is None else speed,
        alpha=alpha,
    )


def encode_y400_studio(
    y: np.ndarray,
    quality: int,
    speed: Optional[int] = None,
    full_range: bool = False,
) -> bytes:
    """Single Y plane -> true monochrome (YUV400, mono_chrome=1) AVIF.

    Production outputs stay colour 4:2:0 for reference parity (ravif
    encodes RGBA; src/transform.rs:138-146), so this is a diagnostic /
    fixture entry: PIL's plugin encodes mode-L images as neutral-chroma
    COLOUR, which means the real mono source class — the one
    decode_yuv_studio serves with synthesized neutral chroma — can only
    be produced here. Used by tests/test_avif_native.py and the soak
    corpus. Raises ValueError when the path is unavailable."""
    lib = _load()
    if lib is None:
        raise ValueError("native avif encode unavailable")
    if y.dtype != np.uint8 or y.ndim != 2:
        raise ValueError("y must be a 2-D uint8 plane")
    h, w = y.shape
    img = lib.avifImageCreate(w, h, 8, _PIXEL_FORMAT_YUV400)
    if not img:
        raise MemoryError("avifImageCreate failed")
    enc = None
    out = _RWData()
    try:
        ctypes.c_int32.from_address(img + _IMG_YUV_RANGE).value = (
            1 if full_range else _RANGE_LIMITED
        )
        for i, v in enumerate(_CICP_VALUES):
            ctypes.c_uint16.from_address(img + _IMG_CICP + 2 * i).value = v
        res = lib.avifImageAllocatePlanes(img, _PLANES_YUV)
        if res != 0:
            raise ValueError(_result_str(lib, res))
        planes = (ctypes.c_void_p * 3).from_address(img + _IMG_YUV_PLANES)
        rowbytes = (ctypes.c_uint32 * 3).from_address(img + _IMG_YUV_ROWBYTES)
        _copy_plane(planes[0], rowbytes[0], y)
        enc = lib.avifEncoderCreate()
        if not enc:
            raise MemoryError("avifEncoderCreate failed")
        qz = quality_to_quantizer(quality)
        for off, val in (
            (_ENC_CODEC_CHOICE, _state["codec"]),
            (_ENC_MAX_THREADS, 1),
            (_ENC_SPEED, AVIF_SPEED if speed is None else speed),
            (_ENC_MIN_Q, qz),
            (_ENC_MAX_Q, qz),
        ):
            ctypes.c_int32.from_address(enc + off).value = val
        res = lib.avifEncoderWrite(enc, img, ctypes.byref(out))
        if res != 0 or not out.size:
            raise ValueError(f"avif y400 encode failed: {_result_str(lib, res)}")
        return ctypes.string_at(out.data, out.size)
    finally:
        if out.data:
            lib.avifRWDataFree(ctypes.byref(out))
        if enc:
            lib.avifEncoderDestroy(enc)
        lib.avifImageDestroy(img)


def _split_rgba(img: np.ndarray):
    """RGB(A) -> (BT.601 studio 4:2:0 planes, real-alpha-or-None): the
    same conversion the device heads apply (ops/color.py); fully-opaque
    alpha planes are dropped (ledger'd fix, module docstring)."""
    from imagekit_tpu.ops.color import rgb_to_yuv420_host

    alpha = None
    if img.ndim == 3 and img.shape[2] == 4:
        a = img[:, :, 3]
        if not (a == 255).all():
            alpha = np.ascontiguousarray(a)
        img = img[:, :, :3]
    y, cb, cr = rgb_to_yuv420_host(img)
    return y, cb, cr, alpha


def encode_rgb(
    img: np.ndarray, quality: int, speed: Optional[int] = None
) -> bytes:
    """Host-side RGB(A) -> AVIF for the staged/generic paths: BT.601
    studio conversion, then the direct bitstream encode. Alpha, when
    present and not fully opaque, rides as a near-lossless alpha
    plane."""
    y, cb, cr, alpha = _split_rgba(img)
    return encode_yuv420_studio(y, cb, cr, quality, speed=speed, alpha=alpha)


def encode_rgb_firstparty(img: np.ndarray, quality: int) -> bytes:
    """RGB(A) -> AVIF through the in-process first-party AV1 encoder
    unconditionally (the no-system-encoder last resort; pil_backend
    calls this when both the libavif ABI and the PIL plugin fail)."""
    y, cb, cr, alpha = _split_rgba(img)
    return encode_firstparty(y, cb, cr, quality, alpha=alpha)
