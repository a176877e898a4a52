"""Image codecs: format detection, decode, encode.

Replaces the reference's third-party codec layer (the ``image`` crate's
JPEG/PNG/WebP/AVIF coders and bundled libwebp, SURVEY.md §2.2):

- :func:`guess_format` — magic-byte detection, the analogue of
  ``image::guess_format`` used at ``src/transform.rs:28`` and
  ``src/fetch.rs:104``.
- :func:`decode_bytes` / :func:`encode_bytes` — dispatch to the backends.

Backends:

- :mod:`imagekit_tpu.codecs.jpeg` — the TPU-native JPEG path: host C++
  Huffman entropy coding, device IDCT/fDCT + colour + quantisation.
- :mod:`imagekit_tpu.codecs.pil_backend` — libjpeg/libwebp/libavif via PIL
  for formats whose entropy stages we haven't moved to the native path and
  as the host fallback when no device is available (SURVEY.md §5.3).

WebP/AVIF lossy encoding intentionally goes through the same C libraries
the reference links (libwebp; libavif vs the reference's rav1e — both AV1),
so quality->quantiser behaviour matches the reference closely.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import numpy as np

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.errors import TransformError


class SourceFormat(str, enum.Enum):
    """Decodable input container formats (superset of the three output
    formats, like the ``image`` crate's format enum)."""

    jpeg = "jpeg"
    png = "png"
    webp = "webp"
    avif = "avif"
    gif = "gif"
    bmp = "bmp"
    tiff = "tiff"
    # long-tail formats (round 5): the full image::guess_format magic
    # table. The REFERENCE detects these but rejects them at decode (its
    # image crate is built default-features=false with only
    # jpeg/png/webp/avif enabled, Cargo.toml:20); we decode them —
    # ledger'd superset divergence (docs/PARITY_REPORT.md input matrix).
    ico = "ico"
    qoi = "qoi"
    pnm = "pnm"
    dds = "dds"
    hdr = "hdr"
    exr = "exr"
    farbfeld = "farbfeld"

    @property
    def as_output(self) -> Optional[ImageFormat]:
        """Map to a supported transformation format when possible
        (``src/transform.rs:35-40``)."""
        return {
            SourceFormat.jpeg: ImageFormat.jpeg,
            SourceFormat.webp: ImageFormat.webp,
            SourceFormat.avif: ImageFormat.avif,
        }.get(self)


def guess_format(data: bytes) -> SourceFormat:
    """Magic-byte container detection; raises TransformError when the format
    cannot be detected (parity with ``image::guess_format`` failing on
    garbage/empty input, covered by the reference's own tests
    ``tests/transform.rs:102-120``)."""
    if len(data) >= 3 and data[:3] == b"\xff\xd8\xff":
        return SourceFormat.jpeg
    if len(data) >= 8 and data[:8] == b"\x89PNG\r\n\x1a\n":
        return SourceFormat.png
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return SourceFormat.webp
    if len(data) >= 12 and data[4:8] == b"ftyp":
        brand = data[8:12]
        if brand in (b"avif", b"avis", b"mif1", b"msf1"):
            return SourceFormat.avif
    if len(data) >= 6 and data[:6] in (b"GIF87a", b"GIF89a"):
        return SourceFormat.gif
    if len(data) >= 2 and data[:2] == b"BM":
        return SourceFormat.bmp
    if len(data) >= 4 and data[:4] in (b"II*\x00", b"MM\x00*"):
        return SourceFormat.tiff
    # long-tail magic table (the rest of image::guess_format's list;
    # TGA has no magic, so it is undetectable there AND here)
    if len(data) >= 4 and data[:4] == b"\x00\x00\x01\x00":
        return SourceFormat.ico
    if len(data) >= 4 and data[:4] == b"qoif":
        return SourceFormat.qoi
    if (
        len(data) >= 3
        and data[0:1] == b"P"
        and data[1:2] in b"1234567"
        and data[2:3] in b" \t\n\r"
    ):
        return SourceFormat.pnm
    if len(data) >= 4 and data[:4] == b"DDS ":
        return SourceFormat.dds
    if data.startswith((b"#?RADIANCE", b"#?RGBE")):
        return SourceFormat.hdr
    if len(data) >= 4 and data[:4] == b"\x76\x2f\x31\x01":
        return SourceFormat.exr
    if len(data) >= 8 and data[:8] == b"farbfeld":
        return SourceFormat.farbfeld
    raise TransformError("unsupported or undetectable image format")


def decode_bytes(data: bytes) -> Tuple[np.ndarray, SourceFormat]:
    """Decode to an HWC uint8 array (RGB, or RGBA when the source carries
    alpha). Raises TransformError on malformed input."""
    fmt = guess_format(data)
    if fmt == SourceFormat.png:
        # native entropy stage: C++ inflate + unfilter + expansion
        # (interlaced / non-8-bit sources return None -> host library)
        from imagekit_tpu.codecs import png as png_native

        if png_native.available():
            try:
                arr = png_native.decode(data)
            except ValueError as e:
                raise TransformError(str(e)) from e
            if arr is not None:
                return arr, fmt
    elif fmt == SourceFormat.webp:
        # native VP8 (lossy) + VP8L (lossless) decode; VP8X containers
        # fall back to the host library
        from imagekit_tpu.codecs import vp8 as vp8_native

        if vp8_native.decode_available():
            try:
                arr = vp8_native.decode_rgb(data)
            except ValueError as e:
                raise TransformError(str(e)) from e
            if arr is not None:
                return arr, fmt
    elif fmt in (SourceFormat.gif, SourceFormat.bmp):
        from imagekit_tpu.codecs import misc as misc_native

        if misc_native.available():
            try:
                arr = (
                    misc_native.decode_gif(data)
                    if fmt == SourceFormat.gif
                    else misc_native.decode_bmp(data)
                )
            except ValueError as e:
                raise TransformError(str(e)) from e
            if arr is not None:
                return arr, fmt
    elif fmt == SourceFormat.tiff:
        # native baseline TIFF: strips/tiles/planar, none/LZW/PackBits,
        # 8/16-bit; exotic layouts fall back to the host library
        from imagekit_tpu.codecs import tiff as tiff_native

        if tiff_native.available():
            try:
                arr = tiff_native.decode(data)
            except ValueError as e:
                raise TransformError(str(e)) from e
            if arr is not None:
                return arr, fmt
    elif fmt == SourceFormat.avif:
        # native ISOBMFF container parse + direct dav1d core (no PIL/
        # libavif in the loop), incl. alpha aux items since round 3;
        # 10-bit/premultiplied-alpha/ABI-drift fall back
        from imagekit_tpu.codecs import avif_native

        if avif_native.decode_available():
            try:
                arr = avif_native.decode_rgb(data)
            except ValueError as e:
                raise TransformError(str(e)) from e
            if arr is not None:
                return arr, fmt
    elif fmt in (SourceFormat.hdr, SourceFormat.farbfeld):
        # PIL has no Radiance HDR / farbfeld plugins; tiny native
        # decoders (round 5 long-tail)
        from imagekit_tpu.codecs import longtail

        arr = (
            longtail.decode_hdr(data)
            if fmt == SourceFormat.hdr
            else longtail.decode_farbfeld(data)
        )
        return arr, fmt
    elif fmt == SourceFormat.exr:
        # detected so the error names the format; decoding OpenEXR
        # (half-float + zip/piz) is out of scope — the reference
        # rejects EXR too (features=[jpeg,png,webp,avif])
        raise TransformError("EXR input is not supported")
    from imagekit_tpu.codecs import pil_backend

    arr = pil_backend.decode(data)
    return arr, fmt


def encode_bytes(
    img: np.ndarray, fmt: ImageFormat, quality: int, *, prefer_device: bool = True
) -> bytes:
    """Encode an HWC uint8 array (RGB or RGBA). Quality is clamped to
    [1, 100] like every reference encoder arm (``src/transform.rs:122-139``)."""
    q = int(min(max(quality, 1), 100))
    # routing is declared per format family in models/pipelines.py
    from imagekit_tpu.models.pipelines import get_pipeline

    if get_pipeline(fmt).device_encode and prefer_device:
        try:
            if fmt == ImageFormat.jpeg:
                from imagekit_tpu.codecs import jpeg as jpeg_native

                if jpeg_native.available():
                    return jpeg_native.encode_rgb(_to_rgb(img), q)
            elif fmt == ImageFormat.webp:
                from imagekit_tpu.codecs import vp8 as vp8_native

                if vp8_native.available():
                    return vp8_native.encode_rgb(_to_rgb(img), q)
        except TransformError:
            raise
        except Exception:
            pass  # fall back to the host library path
    from imagekit_tpu.codecs import pil_backend

    return pil_backend.encode(img, fmt, q)


def _to_rgb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 4:
        return img[:, :, :3]
    return img
