"""Dynamic bucketed batching engine — the TPU throughput path.

The reference transforms one image per request, inline on the serving
thread (SURVEY.md §2.3). Here, concurrent requests are queued and grouped
by (source bucket, target bucket, channels); each group executes as ONE
device call — a batched per-image-weights resample
(:func:`ops.resize.resample_bucketed`) — while host codec stages run on a
thread pool, pipelined against device compute. A group flushes when it
reaches ``max_batch`` or its oldest item has waited ``max_delay_ms``
(BASELINE north star: dynamic batching + resolution bucketing).

Shapes beyond the bucket ladder (e.g. extreme upscales) fall back to the
exact-shape single-image path.
"""

from __future__ import annotations

import asyncio
import functools
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from imagekit_tpu.config import ImageFormat, ImageKitConfig
from imagekit_tpu.ops.resize import (
    padded_weights,
    resample_bucketed,
    target_dimensions,
)
from imagekit_tpu.serving.engine import TransformEngine
from imagekit_tpu.serving.metrics import METRICS, Metrics
from imagekit_tpu.transform import decode_image, encode_image
from imagekit_tpu.utils.bucketing import bucket_for


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


@functools.lru_cache(maxsize=4096)
def _cached_weights(
    true_in: int, true_out: int, bucket_in: int, bucket_out: int
) -> np.ndarray:
    return padded_weights(true_in, true_out, bucket_in, bucket_out)


class BatchedEngine(TransformEngine):
    def __init__(
        self,
        config: Optional[ImageKitConfig] = None,
        metrics: Metrics = METRICS,
        codec_workers: Optional[int] = None,
    ) -> None:
        from imagekit_tpu.utils import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        self.config = config or ImageKitConfig()
        self.metrics = metrics
        bc = self.config.batch
        self.max_batch = bc.max_batch
        self.max_delay = bc.max_delay_ms / 1000.0
        import os

        workers = codec_workers or max(2, (os.cpu_count() or 1) * 2)
        self._codec_pool = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="ik-codec"
        )
        # Single device-dispatch thread: one stream of batched launches.
        self._device_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ik-device"
        )
        self._queues: Dict[_BucketKey, List[_Item]] = {}
        self._flusher: Optional[asyncio.Task] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._closed = False

    # -- decode (host codec pool) --
    async def decode(self, data: bytes) -> np.ndarray:
        loop = asyncio.get_running_loop()
        t0 = time.perf_counter()
        img, _ = await loop.run_in_executor(self._codec_pool, decode_image, data)
        self.metrics.add_stage_time("decode", time.perf_counter() - t0)
        return img

    # -- resize + encode (batched device + codec pool) --
    async def resize_encode(
        self,
        img: np.ndarray,
        w: Optional[int],
        h: Optional[int],
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        loop = asyncio.get_running_loop()
        self._ensure_flusher(loop)

        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)

        ih, iw, ch = img.shape
        if w is None and h is None:
            # no-op resize (src/transform.rs:67-69): straight to encode
            return await self._encode(loop, img, fmt, quality)

        out_w, out_h = target_dimensions(iw, ih, w, h)
        try:
            bh, bw = bucket_for(ih), bucket_for(iw)
            obh, obw = bucket_for(out_h), bucket_for(out_w)
        except ValueError:
            # outside the ladder -> exact-shape fallback
            return await self._exact_path(loop, img, out_h, out_w, fmt, quality)

        fut: asyncio.Future = loop.create_future()
        item = _Item(img, out_h, out_w, fmt, quality, fut)
        key = (bh, bw, obh, obw, ch)
        queue = self._queues.setdefault(key, [])
        queue.append(item)
        self.metrics.queue_depth = sum(len(q) for q in self._queues.values())
        if len(queue) >= self.max_batch:
            self._queues[key] = []
            asyncio.ensure_future(self._flush(key, queue))
        return await fut

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

    # -- internals --
    def _ensure_flusher(self, loop: asyncio.AbstractEventLoop) -> None:
        if self._flusher is None or self._loop is not loop:
            self._loop = loop
            self._flusher = loop.create_task(self._flush_loop())

    async def _flush_loop(self) -> None:
        try:
            while not self._closed:
                await asyncio.sleep(self.max_delay / 2)
                now = time.perf_counter()
                for key in list(self._queues):
                    queue = self._queues.get(key) or []
                    if queue and (now - queue[0].enqueued) >= self.max_delay:
                        self._queues[key] = []
                        asyncio.ensure_future(self._flush(key, queue))
        except asyncio.CancelledError:
            pass

    async def _flush(self, key: _BucketKey, items: List[_Item]) -> None:
        loop = asyncio.get_running_loop()
        bh, bw, obh, obw, ch = key
        try:
            t0 = time.perf_counter()
            # pad the batch axis to a small ladder so each (shape, batch)
            # pair compiles exactly once; zero weights make pad entries free
            from imagekit_tpu.ops.resize import resample_bucketed_flat
            from imagekit_tpu.utils.bucketing import batch_bucket

            nb = batch_bucket(len(items), self.max_batch)
            # flat (B, H, W*C) u8 layout: keeps the minor transfer dim wide
            # (avoids the 128-lane padding blowup of NHWC u8 transfers)
            batch = np.zeros((nb, bh, bw * ch), dtype=np.uint8)
            # dedupe weight matrices: uniform batches ship one matrix
            v_keys: Dict[Tuple[int, int], int] = {}
            h_keys: Dict[Tuple[int, int], int] = {}
            vidx = np.zeros(nb, np.int32)
            hidx = np.zeros(nb, np.int32)
            for i, it in enumerate(items):
                h_i, w_i = it.img.shape[:2]
                batch[i, :h_i, : w_i * ch] = it.img.reshape(h_i, w_i * ch)
                vidx[i] = v_keys.setdefault((h_i, it.out_h), len(v_keys))
                hidx[i] = h_keys.setdefault((w_i, it.out_w), len(h_keys))
            nu_v = batch_bucket(len(v_keys), self.max_batch)
            nu_h = batch_bucket(len(h_keys), self.max_batch)
            wv = np.zeros((nu_v, obh, bh), dtype=np.float32)
            wh = np.zeros((nu_h, obw, bw), dtype=np.float32)
            for (ti, to), u in v_keys.items():
                wv[u] = _cached_weights(ti, to, bh, obh)
            for (ti, to), u in h_keys.items():
                wh[u] = _cached_weights(ti, to, bw, obw)
            t1 = time.perf_counter()

            def device_step() -> np.ndarray:
                flat = np.asarray(
                    resample_bucketed_flat(batch, wv, wh, vidx, hidx, ch)
                )
                return flat.reshape(nb, obh, obw, ch)

            # (device_step returns the NHWC view of the flat 2D transfer)

            out = await loop.run_in_executor(self._device_pool, device_step)
            t2 = time.perf_counter()
            self.metrics.add_stage_time("batch_build", t1 - t0)
            self.metrics.add_stage_time("device_resize", t2 - t1)
            self.metrics.record_batch(len(items))

            async def finish(i: int, it: _Item) -> None:
                cropped = out[i, : it.out_h, : it.out_w]
                try:
                    encoded = await self._encode(loop, cropped, it.fmt, it.quality)
                except Exception as e:  # noqa: BLE001
                    if not it.future.done():
                        it.future.set_exception(e)
                    return
                if not it.future.done():
                    it.future.set_result(encoded)

            await asyncio.gather(*(finish(i, it) for i, it in enumerate(items)))
        except Exception as e:  # noqa: BLE001
            for it in items:
                if not it.future.done():
                    it.future.set_exception(e)
        finally:
            self.metrics.queue_depth = sum(
                len(q) for q in self._queues.values()
            )

    async def _encode(
        self, loop: asyncio.AbstractEventLoop, img: np.ndarray, fmt: ImageFormat, q: int
    ) -> bytes:
        t0 = time.perf_counter()
        data = await loop.run_in_executor(
            self._codec_pool, encode_image, np.ascontiguousarray(img), fmt, q
        )
        self.metrics.add_stage_time("encode", time.perf_counter() - t0)
        return data

    async def _exact_path(
        self,
        loop: asyncio.AbstractEventLoop,
        img: np.ndarray,
        out_h: int,
        out_w: int,
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        from imagekit_tpu.ops.resize import resize_batch

        def work() -> np.ndarray:
            return np.asarray(resize_batch(img[None], out_h, out_w))[0]

        resized = await loop.run_in_executor(self._device_pool, work)
        return await self._encode(loop, resized, fmt, quality)

    async def warmup(
        self, shapes: Optional[List[Tuple[int, int, int, int, int]]] = None
    ) -> None:
        """Pre-compile the hot bucket pairs (first TPU compile is ~20-40 s;
        without this the first request eats it)."""
        from imagekit_tpu.ops.resize import resample_bucketed_flat
        from imagekit_tpu.utils.bucketing import BATCH_SIZES

        if shapes is None:
            bh, bw = bucket_for(1080), bucket_for(1920)
            obh, obw = bucket_for(225), bucket_for(400)
            shapes = [
                (b, bh, bw, obh, obw, 3)
                for b in BATCH_SIZES
                if b <= self.max_batch
            ]
        loop = asyncio.get_running_loop()
        for b, bh, bw, obh, obw, ch in shapes:
            batch = np.zeros((b, bh, bw * ch), dtype=np.uint8)
            wv = np.zeros((1, obh, bh), dtype=np.float32)
            wh = np.zeros((1, obw, bw), dtype=np.float32)
            idx = np.zeros(b, np.int32)

            def step(batch=batch, wv=wv, wh=wh, idx=idx, ch=ch):
                return np.asarray(
                    resample_bucketed_flat(batch, wv, wh, idx, idx, ch)
                )

            await loop.run_in_executor(self._device_pool, step)

    async def close(self) -> None:
        self._closed = True
        if self._flusher is not None:
            self._flusher.cancel()
        self._codec_pool.shutdown(wait=False, cancel_futures=True)
        self._device_pool.shutdown(wait=False, cancel_futures=True)
