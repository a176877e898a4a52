"""Batch item types shared by the engine's head modules.

Split out of batcher.py in round 5 (VERDICT r4 next #7): these are the
queue-item dataclasses and small shared helpers with no engine state.
"""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.ops.resize import padded_weights
from imagekit_tpu.utils.sized_cache import SizedArrayCache

@dataclass
class _Item:
    img: np.ndarray
    out_h: int
    out_w: int
    fmt: ImageFormat
    quality: int
    future: asyncio.Future
    enqueued: float = field(default_factory=time.perf_counter)


_BucketKey = Tuple[int, int, int, int, int]  # (bh, bw, obh, obw, channels)

class _NativeUnsupported(Exception):
    """JPEG can't take the native coeffs path; use the generic one."""


def _avif_encode_available() -> bool:
    from imagekit_tpu.codecs import avif_encode

    return avif_encode.available()


@dataclass
class _YuvItem:
    """A decoded YUV 4:2:0 source (native WebP/AVIF decode) bound for a
    webp or jpeg output — resized entirely in YUV space, no RGB anywhere
    (jpeg outputs ride the fused resize+remap+fDCT kernel)."""

    y: np.ndarray
    cb: np.ndarray
    cr: np.ndarray
    out_h: int
    out_w: int
    quality: int
    future: asyncio.Future
    fmt: ImageFormat = ImageFormat.webp
    alpha: Optional[np.ndarray] = None  # full-range u8, luma geometry
    mix: bool = False  # BT.709 source: head applies the 709->601 mix
    enqueued: float = field(default_factory=time.perf_counter)

# Byte-budgeted host weight cache: entry-capped lru_cache leaked gigabytes
# under random-dimension traffic (each entry is a 0.5-3 MB matrix keyed by
# true dims; see utils/sized_cache.py).
_HOST_WEIGHTS = SizedArrayCache(128 * 1024 * 1024)

def _cached_weights(
    true_in: int, true_out: int, bucket_in: int, bucket_out: int
) -> np.ndarray:
    key = (true_in, true_out, bucket_in, bucket_out)
    return _HOST_WEIGHTS.get_or_build(
        key, lambda: padded_weights(true_in, true_out, bucket_in, bucket_out)
    )
