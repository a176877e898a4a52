"""Transform execution engine.

The reference runs decode/resize/encode inline on the request task
(``src/lib.rs:175-191``, SURVEY.md §2.3 — a noted perf weakness). Here the
engine owns execution: host codec stages run on a thread pool and the
pixel math runs on TPU. Two implementations share one interface:

- :class:`ThreadedEngine` — per-request execution (decode -> device resize
  at batch 1 -> encode). Used for /upload and as the simple default.
- :class:`BatchedEngine` (``batcher.py``) — queues requests, buckets them by
  (source bucket, target bucket) and runs device work batched. This is the
  throughput path (BASELINE north star).
"""

from __future__ import annotations

import asyncio
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from imagekit_tpu.config import ImageFormat, ImageKitConfig
from imagekit_tpu.serving.metrics import METRICS, Metrics
from imagekit_tpu.transform import decode_image, encode_image, resize_image


class TransformEngine:
    """Interface: async decode / resize+encode on pre-decoded pixels."""

    async def transform(
        self,
        data: bytes,
        w: Optional[int],
        h: Optional[int],
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        img = await self.decode(data)
        return await self.resize_encode(img, w, h, fmt, quality)

    async def decode(self, data: bytes) -> np.ndarray:
        raise NotImplementedError

    async def resize_encode(
        self,
        img: np.ndarray,
        w: Optional[int],
        h: Optional[int],
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        raise NotImplementedError

    async def close(self) -> None:
        pass


class ThreadedEngine(TransformEngine):
    """Thread-pool execution of the single-image pipeline. The resize still
    runs on the accelerator (batch of 1); codecs run on host threads."""

    def __init__(
        self,
        config: Optional[ImageKitConfig] = None,
        metrics: Metrics = METRICS,
        max_workers: Optional[int] = None,
    ) -> None:
        self.config = config
        self.metrics = metrics
        self._pool = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="ik-transform"
        )

    async def decode(self, data: bytes) -> np.ndarray:
        loop = asyncio.get_running_loop()
        t0 = time.perf_counter()
        img, _ = await loop.run_in_executor(self._pool, decode_image, data)
        self.metrics.add_stage_time("decode", time.perf_counter() - t0)
        return img

    async def resize_encode(
        self,
        img: np.ndarray,
        w: Optional[int],
        h: Optional[int],
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        loop = asyncio.get_running_loop()

        def work() -> bytes:
            t0 = time.perf_counter()
            resized = resize_image(img, w, h)
            t1 = time.perf_counter()
            out = encode_image(resized, fmt, quality)
            t2 = time.perf_counter()
            self.metrics.add_stage_time("resize", t1 - t0)
            self.metrics.add_stage_time("encode", t2 - t1)
            return out

        return await loop.run_in_executor(self._pool, work)

    async def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)


def default_engine(
    config: Optional[ImageKitConfig] = None, metrics: Metrics = METRICS
) -> TransformEngine:
    """Engine used by the app when none is injected: the batched engine when
    available, else the threaded one. The app's metrics registry is shared
    so engine stage timings land where /metrics reads them."""
    try:
        from imagekit_tpu.serving.batcher import BatchedEngine

        return BatchedEngine(config or ImageKitConfig(), metrics=metrics)
    except ImportError:
        return ThreadedEngine(config, metrics=metrics)
