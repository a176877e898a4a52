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
import contextlib
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np

from imagekit_tpu.config import ImageFormat, ImageKitConfig
from imagekit_tpu.ops.resize import target_dimensions
from imagekit_tpu.serving.batch_types import (  # noqa: F401  (re-exported)
    _avif_encode_available,
    _BucketKey,
    _cached_weights,
    _HOST_WEIGHTS,
    _Item,
    _NativeUnsupported,
    _YuvItem,
)
from imagekit_tpu.serving.engine import TransformEngine
from imagekit_tpu.serving.engine_jpeg import JpegPathMixin
from imagekit_tpu.serving.engine_rgb import RgbPathMixin
from imagekit_tpu.serving.engine_yuv import YuvPathMixin
from imagekit_tpu.serving.jpeg_transport import (  # noqa: F401  (re-exported)
    _esc_batch_rows,
    _esc_comp_counts,
    _esc_within_batch_budget,
    _esc_within_image_budget,
    _GrayAs420,
    _JpegItem,
    _pad_esc,
    _widen_items,
)
from imagekit_tpu.serving.metrics import METRICS, Metrics
from imagekit_tpu.transform import decode_image, encode_image
from imagekit_tpu.utils.bucketing import bucket_for
from imagekit_tpu.utils.sized_cache import SizedArrayCache


class BatchedEngine(YuvPathMixin, JpegPathMixin, RgbPathMixin, TransformEngine):
    def __init__(
        self,
        config: Optional[ImageKitConfig] = None,
        metrics: Metrics = METRICS,
        codec_workers: Optional[int] = None,
        mesh=None,
    ) -> None:
        from imagekit_tpu.utils import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        self.config = config or ImageKitConfig()
        self.metrics = metrics
        # Multi-chip data parallelism is a property of the engine, not a
        # side module (SURVEY.md §5.8: "multi-chip DP sharding of the batch
        # is config, not code"): with >1 device, batches are placed with a
        # NamedSharding over the mesh's data axis and XLA partitions the
        # batched kernels per-device; with one device nothing changes.
        self._mesh = mesh
        if self._mesh is None:
            try:
                import jax

                if len(jax.devices()) > 1:
                    from imagekit_tpu.parallel.mesh import make_mesh

                    self._mesh = make_mesh()
            except Exception:  # noqa: BLE001
                self._mesh = None
        self._mesh_ndev = self._mesh.devices.size if self._mesh is not None else 1
        bc = self.config.batch
        self.max_batch = bc.max_batch
        self.max_compiled = getattr(bc, "max_compiled_shapes", 32)
        self.max_delay = bc.max_delay_ms / 1000.0
        self.hard_delay = bc.hard_delay_ms / 1000.0
        # admission control (VERDICT r2 weak #1): shed when the estimated
        # queue-drain latency exceeds the budget instead of queueing
        self.admit_budget_s = getattr(bc, "max_queue_latency_s", 2.0)
        self._insystem = 0  # requests admitted and not yet completed
        from collections import deque

        self._done_times: "deque[float]" = deque(maxlen=256)
        import os

        workers = codec_workers or max(2, (os.cpu_count() or 1) * 2)
        self._codec_pool = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="ik-codec"
        )
        # Two dispatch threads: batch N+1's host->device transfer overlaps
        # batch N's compute + device->host readback (the device itself
        # serialises compute; only the transfers pipeline).
        self._device_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="ik-device"
        )
        self._queues: Dict[_BucketKey, List[_Item]] = {}
        self._jqueues: Dict[tuple, list] = {}
        self._yqueues: Dict[tuple, list] = {}
        # weight stacks are identical batch-to-batch for steady traffic;
        # keep them device-resident so only coefficients/pixels transfer
        # (byte-budgeted: the tunnelled device client mirrors placements in
        # host memory, so an entry-capped cache leaks under random dims)
        self._dweights = SizedArrayCache(
            int(os.environ.get("IMAGEKIT_DEVICE_WEIGHT_CACHE_MB", "64")) * 1024 * 1024
        )
        # shape signatures whose executable is known compiled; batches for
        # cold shapes run on a host fallback while the compile warms in the
        # background (per-request device->host fallback, SURVEY.md §5.3)
        self._compiled: set = set()
        self._compiling: set = set()
        self._inflight = 0  # device calls dispatched but not finished
        # time from warmup start until the hottest signature serves on
        # device (set by warmup(); None before then)
        self.hot_shape_ready_s: Optional[float] = None
        self._flusher: Optional[asyncio.Task] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._closed = False

    # -- decode (host codec pool) --
    async def decode(self, data: bytes) -> np.ndarray:
        # per-source-format decode timing (VERDICT r1: a decode-time entry
        # for the native PNG path in stage metrics)
        stage = "decode_png" if data[:8] == b"\x89PNG\r\n\x1a\n" else "decode"
        img, _ = await self._pool_run(stage, decode_image, data)
        return img

    # -- admission control (engine-level load shedding) --
    def _admission_check(self) -> None:
        """Refuse work the engine cannot serve within its latency budget:
        estimated drain time = in-system requests / recent completion
        rate. No recent history (cold start, post-idle) admits freely —
        the estimator only ever sheds under MEASURED sustained load, so
        a misestimate degrades to the old queue-everything behaviour,
        never to spurious 429s on an idle server."""
        budget = self.admit_budget_s
        if budget <= 0:
            return
        now = time.monotonic()
        recent = [t for t in self._done_times if now - t <= 30.0]
        if len(recent) < 8:
            return
        newest = max(recent)
        # A lull after a burst must not deflate the rate: 8 completions
        # in 1 s followed by 20 s idle is an idle engine, not a 0.4/s
        # one (ADVICE r3). Rate is measured over the busy span
        # (newest - oldest completion), and shedding is skipped outright
        # when the newest completion is no longer fresh — an engine that
        # finished draining has capacity regardless of history shape.
        if now - newest > 5.0:
            return
        span = newest - min(recent)
        if span <= 0:
            return
        rate = (len(recent) - 1) / span
        wait = self._insystem / rate
        if wait > budget:
            self.metrics.inc("shed")
            from imagekit_tpu.errors import EngineOverloaded

            raise EngineOverloaded(max(1.0, wait - budget))

    @contextlib.contextmanager
    def _admission(self):
        self._admission_check()
        self._insystem += 1
        try:
            yield
            self._done_times.append(time.monotonic())
        finally:
            self._insystem -= 1

    async def _pool_run(self, stage: str, fn, *args):
        """Run ``fn`` on the codec pool with the stage metric SPLIT:
        ``stage_seconds`` gets on-CPU time inside the call,
        ``stage_wait_seconds`` gets submit->pickup pool-queue time. At
        high concurrency on a saturated host the wait share dominates —
        conflating the two (pre-round-3 accounting) made queue pressure
        look like codec cost (VERDICT r2 weak #7)."""
        loop = asyncio.get_running_loop()
        t_submit = time.perf_counter()

        def timed():
            t_start = time.perf_counter()
            self.metrics.add_stage_wait(stage, t_start - t_submit)
            try:
                return fn(*args)
            finally:
                self.metrics.add_stage_time(
                    stage, time.perf_counter() - t_start
                )

        return await loop.run_in_executor(self._codec_pool, timed)

    # -- resize + encode (batched device + codec pool) --
    async def resize_encode(
        self,
        img: np.ndarray,
        w: Optional[int],
        h: Optional[int],
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        with self._admission():
            return await self._resize_encode(img, w, h, fmt, quality)

    async def _resize_encode(
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

        from imagekit_tpu.codecs import vp8 as vp8_native
        from imagekit_tpu.codecs.native import loader as _nloader

        fut: asyncio.Future = loop.create_future()
        item = _Item(img, out_h, out_w, fmt, quality, fut)
        # fused output kinds keep batches homogeneous: webp AND avif
        # outputs ride resample+RGB->YUV (half the D2H, no host
        # conversion — the YUV planes are libavif's native input type),
        # jpeg outputs ride resample+YCbCr+fDCT/quant (no per-image
        # device encode call); 4-channel stays on the plain RGB kernel
        from imagekit_tpu.codecs import avif_encode as _avif_enc

        if fmt == ImageFormat.webp and ch == 3 and vp8_native.available():
            okind = "yuv"
        elif (
            fmt == ImageFormat.avif and ch == 3 and _avif_enc.available()
        ):
            okind = "yuv"
        elif (
            fmt == ImageFormat.jpeg and ch == 3
            and _nloader.load() is not None
        ):
            okind = "jpg"
        else:
            okind = ""
        key = (bh, bw, obh, obw, ch, okind)
        queue = self._queues.setdefault(key, [])
        queue.append(item)
        self.metrics.queue_depth = self._total_queued()
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
        with self._admission():
            return await self._transform_inner(data, w, h, fmt, quality)

    async def _transform_inner(
        self,
        data: bytes,
        w: Optional[int],
        h: Optional[int],
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        # TPU-native JPEG fast path: host C++ Huffman decode to quantised
        # coefficients, then ONE fused device kernel does dequant+IDCT,
        # chroma-upsample∘resize, and colour conversion (the north-star
        # pipeline). Anything unsupported falls back to the generic path.
        # The stage split is declared in models/pipelines.py; the source
        # format's pipeline must start with the host entropy stage.
        from imagekit_tpu.models.pipelines import Stage, get_pipeline

        native_src = (
            data[:3] == b"\xff\xd8\xff"
            and Stage.HOST_ENTROPY_DECODE
            in get_pipeline(ImageFormat.jpeg).decode_stages
        )
        if native_src and (w is not None or h is not None):
            try:
                return await self._transform_jpeg_native(data, w, h, fmt, quality)
            except _NativeUnsupported:
                pass
        # WebP source: native VP8 decode feeds the YUV-domain batched path
        # directly — resize-only for webp/avif outputs, resize+remap+fDCT
        # for jpeg outputs; no RGB round trip anywhere
        if (
            fmt in (ImageFormat.webp, ImageFormat.jpeg, ImageFormat.avif)
            and len(data) >= 12
            and data[:4] == b"RIFF"
            and data[8:12] == b"WEBP"
            and (w is not None or h is not None)
        ):
            try:
                return await self._transform_webp_native(
                    data, w, h, fmt, quality
                )
            except _NativeUnsupported:
                pass
        # AVIF source: native container parse + direct dav1d core feed the
        # same YUV-domain batched path (no RGB round trip; avif->avif
        # re-encodes through the direct libavif ABI from the same planes)
        if (
            fmt in (ImageFormat.webp, ImageFormat.jpeg, ImageFormat.avif)
            and len(data) >= 12
            and data[4:8] == b"ftyp"
            and (w is not None or h is not None)
        ):
            try:
                return await self._transform_avif_native(
                    data, w, h, fmt, quality
                )
            except _NativeUnsupported:
                pass
        img = await self.decode(data)
        return await self._resize_encode(img, w, h, fmt, quality)

    def _may_compile(self, sig) -> bool:
        """Runtime compile budget: each executable permanently retains
        host+device memory (~65 MB on the tunnelled dev TPU), so
        shape-diverse traffic must not compile without bound. Shapes
        beyond the budget ride the host fallback forever."""
        if sig in self._compiling:
            return True  # already accounted
        return (
            len(self._compiled) + len(self._compiling) < self.max_compiled
        )

    MAX_UNIQUE = 4  # fixed unique-geometry slots per device call

    def _total_queued(self) -> int:
        return sum(
            len(q)
            for queues in (self._queues, self._jqueues, self._yqueues)
            for q in queues.values()
        )

    # -- mesh placement helpers ------------------------------------------

    def _use_mesh(self, nb: int) -> bool:
        """Shard this batch over the data axis? Requires an even split
        (JAX shardings need the axis divisible by the mesh extent)."""
        return self._mesh is not None and nb % self._mesh_ndev == 0

    def _put_sharded(self, arr):
        """Place with the batch axis over the mesh's data axis."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from imagekit_tpu.parallel.mesh import DATA_AXIS

        spec = P(DATA_AXIS, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self._mesh, spec))

    def _put_replicated(self, arr):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._mesh is None:
            return jax.device_put(arr)
        return jax.device_put(
            arr, NamedSharding(self._mesh, P(*([None] * arr.ndim)))
        )

    @staticmethod
    def _split_by_geometry(items, key_fn, max_unique):
        """Partition into groups containing at most ``max_unique`` distinct
        geometries, preserving order (keeps the compiled nu dimension
        constant instead of varying with traffic)."""
        groups, current, seen = [], [], set()
        for it in items:
            k = key_fn(it)
            if k not in seen and len(seen) >= max_unique:
                groups.append(current)
                current, seen = [], set()
            seen.add(k)
            current.append(it)
        if current:
            groups.append(current)
        return groups

    def _ensure_flusher(self, loop: asyncio.AbstractEventLoop) -> None:
        if self._flusher is None or self._loop is not loop:
            self._loop = loop
            self._flusher = loop.create_task(self._flush_loop())

    def _hold_for_depth(self, queue, now: float) -> bool:
        """Queue-depth-aware soft flush (VERDICT r3 #3): the device is
        idle and the oldest item passed the soft deadline, but if the
        measured arrival rate projects the queue reaching the next
        batch-ladder step before the HARD deadline, holding deepens the
        batch and amortizes the ~35 ms dispatch RTT over more images —
        round 3 dispatched mean batches of 4.8 against a ladder built
        for 32 precisely because the soft flush fired the moment the
        device idled. Bounded: the hard deadline always flushes, and a
        paused arrival stream (no fresh enqueue) flushes immediately,
        so low-concurrency latency is unchanged."""
        n = len(queue)
        if n < 2:
            return False
        from imagekit_tpu.utils.bucketing import BATCH_SIZES

        steps = sorted(
            {b for b in BATCH_SIZES if b < self.max_batch} | {self.max_batch}
        )
        next_step = next((b for b in steps if b > n), None)
        if next_step is None:
            return False
        oldest = queue[0].enqueued
        newest = queue[-1].enqueued
        span = newest - oldest
        if span <= 0:
            return False
        rate = (n - 1) / span
        # arrival-pause guard: nothing new within ~2 interarrival times
        # (or the soft deadline, whichever is larger) means the burst is
        # over — flush what we have
        if now - newest > max(2.0 / rate, self.max_delay):
            return False
        remaining = oldest + self.hard_delay - now
        if remaining <= 0:
            return False
        return n + rate * remaining >= next_step

    async def _flush_loop(self) -> None:
        # Batch-while-busy: while a device call is in flight, partial
        # batches keep accumulating (each launch has a large fixed transfer
        # latency, so bigger batches win); the soft deadline applies only
        # when the device is idle, the hard deadline always. An idle-device
        # soft flush additionally holds while arrivals project the queue
        # to the next ladder step (see _hold_for_depth).
        try:
            while not self._closed:
                await asyncio.sleep(self.max_delay / 2)
                now = time.perf_counter()
                for queues, flush in (
                    (self._queues, self._flush),
                    (self._jqueues, self._flush_jpeg),
                    (self._yqueues, self._flush_yuv),
                ):
                    for key in sorted(
                        list(queues), key=lambda k: -len(queues.get(k) or [])
                    ):
                        queue = queues.get(key) or []
                        if not queue:
                            continue
                        age = now - queue[0].enqueued
                        if age >= self.hard_delay:
                            pass  # hard deadline: always flush
                        elif self._inflight == 0 and age >= self.max_delay:
                            if self._hold_for_depth(queue, now):
                                self.metrics.inc("flush_holds")
                                continue
                        else:
                            continue
                        queues[key] = []
                        asyncio.ensure_future(flush(key, queue))
        except asyncio.CancelledError:
            pass

    async def _encode(
        self, loop: asyncio.AbstractEventLoop, img: np.ndarray, fmt: ImageFormat, q: int
    ) -> bytes:
        return await self._pool_run(
            "encode", encode_image, np.ascontiguousarray(img), fmt, q
        )

    async def _exact_path(
        self,
        loop: asyncio.AbstractEventLoop,
        img: np.ndarray,
        out_h: int,
        out_w: int,
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        # Oversized images (beyond the bucket ladder): spatially tiled
        # across the mesh when multiple devices exist, plain jitted resample
        # otherwise (parallel/tiling.py).
        from imagekit_tpu.parallel.tiling import resize_oversized

        def work() -> np.ndarray:
            return resize_oversized(img, out_h, out_w)

        resized = await loop.run_in_executor(self._device_pool, work)
        return await self._encode(loop, resized, fmt, quality)

    async def warmup(
        self,
        shapes: Optional[List[Tuple[int, int, int, int, int]]] = None,
        paths: Tuple[str, ...] = ("rgb", "jpeg"),
    ) -> None:
        """Pre-compile the hot bucket pairs (first TPU compile is ~20-40 s;
        without this the first request eats it)."""
        from imagekit_tpu.ops.resize import resample_bucketed_flat
        from imagekit_tpu.utils.bucketing import BATCH_SIZES

        loop0 = asyncio.get_running_loop()
        # the avif ABI self-check (~100 ms encode+decode round trip) runs
        # on first use; do it in the codec pool now so no request's event
        # loop ever pays it
        await loop0.run_in_executor(self._codec_pool, _avif_encode_available)

        if shapes is None:
            bh, bw = bucket_for(1080), bucket_for(1920)
            obh, obw = bucket_for(225), bucket_for(400)
            # every batch size the runtime can actually produce: the ladder
            # values below max_batch, plus max_batch itself (batch_bucket
            # clamps to it)
            sizes = sorted(
                {b for b in BATCH_SIZES if b < self.max_batch}
                | {self.max_batch}
            )
            shapes = [(b, bh, bw, obh, obw, 3) for b in sizes]
        from imagekit_tpu.codecs import vp8 as _vp8
        from imagekit_tpu.ops.color import resample_rgb_yuv_batch

        loop = asyncio.get_running_loop()
        # JPEG coefficient-path shapes FIRST: JPEG sources -> webp are the
        # hot class, so they must warm before the slower rgb-head compiles. "jpeg" warms the
        # fused coefficients->YUV kernel (webp is the default output format)
        # with the truncation factor the bucket geometry would choose;
        # "jpeg_rgb" additionally warms the coefficients->RGB variant used by
        # jpeg/avif outputs (otherwise it compiles in the background on first
        # use while requests ride the host fallback).
        from imagekit_tpu.codecs.native import loader as _loader

        _lib = _loader.load() or object()
        lowfreq_ok = hasattr(_lib, "ik_jpeg_decode_coeffs_lowfreq")
        i8_ok = hasattr(_lib, "ik_jpeg_decode_coeffs_lowfreq_i8")
        kinds = []
        if "jpeg" in paths:
            kinds.append("yuv")
        if "jpeg_rgb" in paths:
            # jpeg outputs ride the fused transcode kernel when the split
            # transport exists; the RGB kernel still serves 4-channel
            # sources and escape-demoted jpeg items (avif outputs ride
            # the YUV heads since the direct libavif ABI landed)
            if i8_ok:
                kinds.append("jxc")
            kinds.append("rgb")
        # submit every signature to the device pool CONCURRENTLY: compiles
        # hit the persistent cache and what remains is the tunnelled
        # execute round trip per signature, which overlaps across the
        # pool's threads (a serial await here measured 200-270 s of
        # server cold start; overlap cuts it ~in half).
        # PRIORITY ORDER (VERDICT r3 #2): the hottest signature — the
        # yuv head at the saturated batch size — is submitted FIRST, so
        # on a cold compile cache the flagship (1080p JPEG -> webp)
        # traffic class starts serving on device after ONE compile
        # instead of after the whole shape set (841 s in the round-3
        # driver run). hot_shape_ready_s records that moment.
        t_w0 = time.perf_counter()
        self.hot_shape_ready_s: Optional[float] = None
        ordered = []
        for kind in kinds:  # "yuv" (the hot webp-output head) is first
            for b, bh, bw, obh, obw, ch in sorted(
                shapes, key=lambda s: -s[0]  # saturated batch size first
            ):
                if bh % 16 or bw % 16 or ch != 3:
                    continue
                shard = self._use_mesh(b)
                k = (
                    self._choose_k(bh, bw, obh, obw)
                    if kind in ("yuv", "jxc") and lowfreq_ok
                    else 8
                )
                # the split int8 transport serves every k and kind when the
                # native symbol exists; escape-dense outliers ride the
                # int16 variant, background-compiled on first occurrence
                head = "jpeg8" if i8_ok else "jpeg"
                ordered.append((head, kind, k, shard, b, bh, bw, obh, obw))

        def compile_one(sig, hot: bool):
            self._compile_jpeg_sig(sig)
            if hot and self.hot_shape_ready_s is None:
                self.hot_shape_ready_s = time.perf_counter() - t_w0

        jpeg_futs = [
            loop.run_in_executor(
                self._device_pool, compile_one, sig, i == 0
            )
            for i, sig in enumerate(ordered)
        ]
        if jpeg_futs:
            await asyncio.gather(*jpeg_futs)
        rgb_like = bool({"rgb", "rgb_jpeg"} & set(paths))
        rgb_futs: list = []
        rgb_sigs: list = []
        for b, bh, bw, obh, obw, ch in shapes if rgb_like else []:
            shard = self._use_mesh(b)
            batch = np.zeros((b, bh, bw * ch), dtype=np.uint8)
            idx = np.zeros(b, np.int32)
            wv = np.zeros((self.MAX_UNIQUE, obh, bh), dtype=np.float32)
            wh = np.zeros((self.MAX_UNIQUE, obw, bw), dtype=np.float32)
            if shard:
                batch, idx = self._put_sharded(batch), self._put_sharded(idx)
                wv, wh = self._put_replicated(wv), self._put_replicated(wh)

            def step(batch=batch, wv=wv, wh=wh, idx=idx, ch=ch):
                return np.asarray(
                    resample_bucketed_flat(batch, wv, wh, idx, idx, ch)
                )

            if "rgb" in paths:
                rgb_futs.append(loop.run_in_executor(
                    self._device_pool, step
                ))
                rgb_sigs.append(("rgb", shard, b, bh, bw, obh, obw, ch))
            if ch == 3 and "rgb" in paths and (
                _vp8.available() or _avif_encode_available()
            ):
                # webp AND avif outputs from RGB sources ride the fused
                # resample+RGB->YUV kernel — warm it for the same shapes

                def step_wy(batch=batch, wv=wv, wh=wh, idx=idx,
                            obh=obh, obw=obw):
                    return resample_rgb_yuv_batch(
                        batch, (wv, wh), idx, idx, (obh, obw)
                    )

                rgb_futs.append(loop.run_in_executor(
                    self._device_pool, step_wy
                ))
                rgb_sigs.append(("rgbyuv", shard, b, bh, bw, obh, obw, ch))
            if ch == 3 and "rgb_jpeg" in paths:
                # jpeg outputs from RGB sources (fused resample+fDCT);
                # opt-in token — this class backgrounds-compiles otherwise
                from imagekit_tpu.ops.dct import resample_rgb_jpeg_batch

                qto = np.zeros((b, 128), np.float32)
                if shard:
                    qto = self._put_sharded(qto)

                def step_jq(batch=batch, wv=wv, wh=wh, idx=idx, qto=qto,
                            obh=obh, obw=obw):
                    return resample_rgb_jpeg_batch(
                        batch, (wv, wh), idx, idx, qto, (obh, obw)
                    )

                rgb_futs.append(loop.run_in_executor(
                    self._device_pool, step_jq
                ))
                rgb_sigs.append(("rgbjpg", shard, b, bh, bw, obh, obw, ch))
        if rgb_futs:
            await asyncio.gather(*rgb_futs)
            for sig in rgb_sigs:
                self._compiled.add(sig)
        # jpeg-format OUTPUTS encode via the device fDCT kernel only for
        # warmed bucket shapes (cold shapes host-mirror); warm the target
        # buckets these shapes produce
        if "rgb" in paths or "jpeg_rgb" in paths:
            from imagekit_tpu.ops.dct import warm_encode_shape

            seen = set()
            for _b, _bh, _bw, obh, obw, _ch in shapes:
                if (obh, obw) in seen:
                    continue
                seen.add((obh, obw))
                await loop.run_in_executor(
                    self._device_pool, warm_encode_shape, obh, obw
                )

    async def close(self) -> None:
        self._closed = True
        if self._flusher is not None:
            self._flusher.cancel()
        self._codec_pool.shutdown(wait=False, cancel_futures=True)
        self._device_pool.shutdown(wait=False, cancel_futures=True)
