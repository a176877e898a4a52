"""Transform core: decode -> resize -> encode.

Public API parity with the reference ``src/transform.rs``:

- :func:`decode_image` — format detection + decode, returning the decoded
  pixels and the detected format *when it is one of the three supported
  output formats*, else None (``src/transform.rs:27-43``).
- :func:`resize_image` — aspect-preserving fit-within resize with Lanczos3,
  no-op when both dims are None, minimum 1 px (``src/transform.rs:62-90``;
  the fit-within behaviour is confirmed by the reference's own test,
  ``tests/transform.rs:239-248``, SURVEY.md §2.4.2).
- :func:`encode_image` — JPEG (RGB), WebP (RGB, libwebp lossy), AVIF (RGBA),
  quality clamped to [1, 100] per encoder (``src/transform.rs:113-150``).

Unlike the reference — which runs these per request on the serving thread —
the serving layer batches decoded images and runs the resize/encode math on
TPU (:mod:`imagekit_tpu.serving.batcher`); these single-image functions are
the same pipeline at batch size 1 and are what the unit tests exercise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from imagekit_tpu.codecs import decode_bytes, encode_bytes
from imagekit_tpu.config import ImageFormat
from imagekit_tpu.errors import TransformError
from imagekit_tpu.ops.resize import resize_image_array, target_dimensions


def decode_image(data: bytes) -> Tuple[np.ndarray, Optional[ImageFormat]]:
    """Decode raw bytes; returns (HWC uint8 array, detected output-format or
    None). Raises TransformError on undetectable/malformed input."""
    arr, src_fmt = decode_bytes(data)
    return arr, src_fmt.as_output


def resize_image(
    img: np.ndarray,
    w: Optional[int] = None,
    h: Optional[int] = None,
    *,
    filter_name: str = "lanczos3",
) -> np.ndarray:
    """Aspect-preserving fit-within resize (Lanczos3 by default)."""
    if img.size == 0:
        raise TransformError("empty image")
    return resize_image_array(img, w, h, filter_name)


def encode_image(img: np.ndarray, fmt: ImageFormat, quality: int) -> bytes:
    """Encode to the target format at the given quality (clamped 1-100)."""
    if img.size == 0:
        raise TransformError("empty image")
    return encode_bytes(img, fmt, quality)


def transform_bytes(
    data: bytes,
    w: Optional[int],
    h: Optional[int],
    fmt: ImageFormat,
    quality: int,
) -> bytes:
    """Full single-image pipeline: decode -> resize -> encode. This is the
    /img miss path's transform chain (``src/lib.rs:175-191``) at batch 1."""
    img, _ = decode_image(data)
    resized = resize_image(img, w, h)
    return encode_image(resized, fmt, quality)


def output_dimensions(
    orig_w: int, orig_h: int, w: Optional[int], h: Optional[int]
) -> Tuple[int, int]:
    """Expose the exact output-dimension math (used by the batcher to plan
    bucket shapes without decoding twice)."""
    return target_dimensions(orig_w, orig_h, w, h)
