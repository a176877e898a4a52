"""Resolution bucketing.

XLA compiles one executable per shape, so arbitrary (w, h) requests would
cause a recompilation storm (SURVEY.md §7 "hard parts"). Dimensions are
padded up to a small geometric ladder of bucket sizes; the true geometry
lives in runtime weight matrices (see :func:`ops.resize.padded_weights`),
so the number of compiled executables is bounded by (ladder size)² per
(source, target) pairing — and in practice only the pairs traffic actually
hits get compiled, lazily.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

DEFAULT_MIN = 64
DEFAULT_MAX = 8192
DEFAULT_RATIO = 1.35
ALIGN = 16  # sublane-friendly


# Standard media dimensions get exact-fit buckets so common traffic
# (1080p/720p/4K sources, thumbnail targets) pays near-zero padding waste.
# Every entry MUST be a multiple of ALIGN: the JPEG native path requires
# 16-aligned buckets (yb % 16 check) and chroma planes need 128-multiple
# minor transfer dims — 368 stands in for the 360p family (ADVICE.md r1).
STANDARD_SIZES = (
    128, 144, 240, 256, 272, 368, 400, 480, 512, 544, 640, 720, 736,
    768, 800, 960, 1024, 1088, 1280, 1440, 1600, 1920, 2176, 2560,
    2880, 3840, 4352,
)

assert all(s % ALIGN == 0 for s in STANDARD_SIZES)


@functools.lru_cache(maxsize=8)
def bucket_ladder(
    min_size: int = DEFAULT_MIN,
    max_size: int = DEFAULT_MAX,
    ratio: float = DEFAULT_RATIO,
) -> Tuple[int, ...]:
    sizes = set()
    s = min_size
    while s < max_size:
        sizes.add(s)
        s = int(math.ceil(s * ratio / ALIGN) * ALIGN)
    sizes.add(max_size)
    sizes.update(x for x in STANDARD_SIZES if x <= max_size)
    return tuple(sorted(sizes))


# Few sizes: every (shape, batch) pair costs a full remote compile on the
# tunnelled TPU; powers of 4 bound padding waste at 4x worst-case while
# keeping the compiled-shape count tiny.
BATCH_SIZES = (1, 4, 16, 64)


def batch_bucket(n: int, max_batch: int = 64) -> int:
    """Pad batch size up to a small ladder so each (shape, batch) pair
    compiles once."""
    for b in BATCH_SIZES:
        if b >= n and b <= max(max_batch, 1):
            return b
    return min(max_batch, BATCH_SIZES[-1])


def bucket_for(size: int, ladder: Sequence[int] = None) -> int:
    """Smallest bucket >= size; raises if nothing fits (caller falls back to
    the exact-shape path)."""
    ladder = ladder or bucket_ladder()
    for b in ladder:
        if b >= size:
            return b
    raise ValueError(f"size {size} exceeds largest bucket {ladder[-1]}")


def bucket_shape(h: int, w: int) -> Tuple[int, int]:
    return bucket_for(h), bucket_for(w)
