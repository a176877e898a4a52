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


class _NativeUnsupported(Exception):
    """JPEG can't take the native coeffs path; use the generic one."""


def _avif_encode_available() -> bool:
    from imagekit_tpu.codecs import avif_encode

    return avif_encode.available()


class _GrayAs420:
    """Header view presenting a grayscale JPEG as 4:2:0 with synthetic
    (zero) chroma, for the shared batch path."""

    def __init__(self, hdr):
        self._h = hdr
        self.width = hdr.width
        self.height = hdr.height
        self.ncomp = 3
        self.comp_h = (2, 1, 1)
        self.comp_v = (2, 1, 1)
        self.comp_width = (
            hdr.comp_width[0],
            (hdr.comp_width[0] + 1) // 2,
            (hdr.comp_width[0] + 1) // 2,
        )
        self.comp_height = (
            hdr.comp_height[0],
            (hdr.comp_height[0] + 1) // 2,
            (hdr.comp_height[0] + 1) // 2,
        )


@dataclass
class _JpegItem:
    hdr: object
    coeffs: list  # int16 (by, bx, k*k) level planes, or None when split set
    qtabs: object
    out_h: int
    out_w: int
    fmt: ImageFormat
    quality: int
    future: asyncio.Future
    k: int = 8  # coefficients kept per block axis (8 = full)
    # split int8 transport (truncated path only): (dc_planes, ac_planes,
    # esc) per jpeg_abi.decode_lowfreq_i8 — halves the host->device upload
    split: tuple = None
    enqueued: float = field(default_factory=time.perf_counter)


def _esc_comp_counts(esc) -> Tuple[int, int, int]:
    """Escape rows per component of one image's (n, 3) escape array."""
    if len(esc) == 0:
        return 0, 0, 0
    comp = np.asarray(esc)[:, 0]
    return (
        int((comp == 0).sum()),
        int((comp == 1).sum()),
        int((comp == 2).sum()),
    )


def _esc_within_image_budget(esc) -> bool:
    """A single image's escapes must fit the BATCH caps of the split-int8
    kernel, else no batch containing it could ever ride that kernel."""
    from imagekit_tpu.ops.dct import LOWFREQ_ESC_C, LOWFREQ_ESC_Y

    ny, nb, nr = _esc_comp_counts(esc)
    return ny <= LOWFREQ_ESC_Y and nb <= LOWFREQ_ESC_C and nr <= LOWFREQ_ESC_C


def _esc_within_batch_budget(items) -> bool:
    from imagekit_tpu.ops.dct import LOWFREQ_ESC_C, LOWFREQ_ESC_Y

    ny = nb = nr = 0
    for it in items:
        a, b, c = _esc_comp_counts(it.split[2])
        ny, nb, nr = ny + a, nb + b, nr + c
    return ny <= LOWFREQ_ESC_Y and nb <= LOWFREQ_ESC_C and nr <= LOWFREQ_ESC_C


def _widen_items(items, k: int) -> None:
    """Demote split-int8 items back to int16 level planes (rare: combined
    escape load exceeded the kernel's static caps)."""
    from imagekit_tpu.codecs.native import jpeg_abi

    for it in items:
        if it.split is not None:
            it.coeffs = jpeg_abi.reconstruct_lowfreq_levels(*it.split, k)
            it.split = None


def _esc_batch_rows(esc, img: int, bx: int, cx: int, na: int,
                    pads: tuple = None):
    """Map one image's escape rows (comp, flat_ac_index, residual) to batch
    scatter coordinates (img, block_row, ac_col) — the layout the split-int8
    kernel scatters into. Returns [(idx (m,3) i32, val (m,) i32)] x 3.

    ``pads`` = (pad128(bx_b), pad128(cx_b)) of the BATCH bucket selects the
    truncated path's PLANAR layout (col = plane * pad + block_col, see
    ops.dct.lowfreq_ac_width); None keeps the full path's block-grouped
    layout (col = block_col * na + plane)."""
    out = []
    esc = np.asarray(esc, np.int64).reshape(-1, 3)
    for c in range(3):
        rows = esc[esc[:, 0] == c]
        bxi = bx if c == 0 else cx
        bi, n = np.divmod(rows[:, 1], na)
        r, b = np.divmod(bi, bxi)
        if pads is not None:
            col = n * (pads[0] if c == 0 else pads[1]) + b
        else:
            col = b * na + n
        idx = np.stack(
            [np.full(len(rows), img, np.int64), r, col], axis=1
        )
        out.append((idx.astype(np.int32), rows[:, 2].astype(np.int32)))
    return out


def _pad_esc(idx_parts, val_parts, cap: int):
    """Concatenate per-image scatter rows and zero-pad to the kernel's
    static capacity (padding adds 0 at (0, 0, 0) — a no-op)."""
    ei = np.zeros((cap, 3), np.int32)
    ev = np.zeros((cap,), np.int32)
    if idx_parts:
        idx = np.concatenate(idx_parts)
        val = np.concatenate(val_parts)
        ei[: len(idx)] = idx
        ev[: len(val)] = val
    return ei, ev


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
from imagekit_tpu.utils.sized_cache import SizedArrayCache  # noqa: E402

_HOST_WEIGHTS = SizedArrayCache(128 * 1024 * 1024)


def _cached_weights(
    true_in: int, true_out: int, bucket_in: int, bucket_out: int
) -> np.ndarray:
    key = (true_in, true_out, bucket_in, bucket_out)
    return _HOST_WEIGHTS.get_or_build(
        key, lambda: padded_weights(true_in, true_out, bucket_in, bucket_out)
    )


class BatchedEngine(TransformEngine):
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

    async def _transform_webp_native(
        self, data: bytes, w, h, fmt, quality: int
    ) -> bytes:
        from imagekit_tpu.codecs import vp8 as vp8_native
        from imagekit_tpu.codecs.native import loader as _nloader

        if not vp8_native.decode_available():
            raise _NativeUnsupported()
        if fmt == ImageFormat.webp and not vp8_native.available():
            raise _NativeUnsupported()
        if fmt == ImageFormat.jpeg and _nloader.load() is None:
            raise _NativeUnsupported()
        if fmt == ImageFormat.avif and not _avif_encode_available():
            raise _NativeUnsupported()
        loop = asyncio.get_running_loop()
        self._ensure_flusher(loop)

        def vp8_decode():
            try:
                return vp8_native.decode_yuv420(data)
            except ValueError as e:
                raise _NativeUnsupported() from e

        planes = await self._pool_run("vp8_decode", vp8_decode)
        if planes is None:  # VP8L / VP8X -> host-library path
            raise _NativeUnsupported()
        return await self._enqueue_yuv(planes, w, h, quality, loop, fmt=fmt)

    async def _transform_avif_native(
        self, data: bytes, w, h, fmt, quality: int
    ) -> bytes:
        """AVIF source -> webp output without an RGB round trip: native
        container parse + direct dav1d core yield studio-range 4:2:0
        planes that feed the YUV-domain batched resize (the webp-source
        pattern)."""
        from imagekit_tpu.codecs import avif_native
        from imagekit_tpu.codecs import vp8 as vp8_native
        from imagekit_tpu.codecs.native import loader as _nloader

        if not avif_native.decode_available():
            raise _NativeUnsupported()
        if fmt == ImageFormat.webp and not vp8_native.available():
            raise _NativeUnsupported()
        if fmt == ImageFormat.jpeg and _nloader.load() is None:
            raise _NativeUnsupported()
        if fmt == ImageFormat.avif and not _avif_encode_available():
            raise _NativeUnsupported()
        loop = asyncio.get_running_loop()
        self._ensure_flusher(loop)

        def avif_decode():
            try:
                return avif_native.decode_yuv_studio(data)
            except ValueError as e:
                raise _NativeUnsupported() from e

        out = await self._pool_run("avif_decode", avif_decode)
        if out is None:  # 10-bit / identity-matrix / unprovable range ->
            #              generic path (mono rides with synthesized
            #              neutral chroma; alpha and BT.709 ride too
            #              since round 5 — VERDICT r4 next #4)
            raise _NativeUnsupported()
        if (out.csy, out.csx) != (2, 2) and fmt == ImageFormat.jpeg:
            # the fDCT head is 4:2:0-geometry only; 444/422 jpeg output
            # stays on the generic path (rare combination)
            raise _NativeUnsupported()
        # alpha survives only into alpha-capable outputs: AVIF keeps it
        # (the encoder's alpha arm); webp drops it like the reference's
        # from_rgb lossy encode, jpeg has no alpha
        alpha = out.alpha if fmt == ImageFormat.avif else None
        return await self._enqueue_yuv(
            (out.y, out.u, out.v), w, h, quality, loop, fmt=fmt,
            cs=(out.csy, out.csx), alpha=alpha, mix=out.bt709,
        )

    async def _enqueue_yuv(
        self, planes, w, h, quality: int, loop, fmt=ImageFormat.webp,
        cs=(2, 2), alpha=None, mix=False,
    ) -> bytes:
        """Queue decoded studio-range planes on the YUV-domain batched
        path (shared by the native WebP and AVIF sources); the
        output-format tag keeps resize-only (webp) and resize+fDCT (jpeg)
        batches homogeneous, and ``cs`` (source chroma subsample factors,
        (2,2)=4:2:0 / (1,2)=4:2:2 / (1,1)=4:4:4) keys batches by chroma
        geometry so 444/422 AVIF sources ride the same fused head with
        folded weights (VERDICT r3 #7). ``alpha`` (full-range u8, luma
        geometry) and ``mix`` (BT.709 source planes) key their own batch
        variants of the same head (round 5: the last AVIF carve-outs)."""
        y, cb, cr = planes
        ih, iw = y.shape
        out_w, out_h = target_dimensions(iw, ih, w, h)
        try:
            bh, bw = bucket_for(ih), bucket_for(iw)
            obh, obw = bucket_for(out_h), bucket_for(out_w)
        except ValueError:
            raise _NativeUnsupported()
        if bh % 16 or bw % 16:
            raise _NativeUnsupported()

        fut: asyncio.Future = loop.create_future()
        item = _YuvItem(
            y, cb, cr, out_h, out_w, quality, fut, fmt=fmt,
            alpha=alpha, mix=mix,
        )
        key = (
            bh, bw, obh, obw, fmt == ImageFormat.jpeg, cs[0], cs[1],
            mix, alpha is not None,
        )
        queue = self._yqueues.setdefault(key, [])
        queue.append(item)
        if len(queue) >= self.max_batch:
            self._yqueues[key] = []
            asyncio.ensure_future(self._flush_yuv(key, queue))
        return await fut

    async def _flush_yuv(self, key, items) -> None:
        groups = self._split_by_geometry(
            items,
            lambda it: (it.y.shape[1], it.y.shape[0], it.out_w, it.out_h),
            self.MAX_UNIQUE,
        )
        await asyncio.gather(*(self._flush_yuv_group(key, g) for g in groups))

    async def _flush_yuv_group(self, key, items) -> None:
        from imagekit_tpu.ops.dct import (
            combined_chroma_half_weights,
            combined_chroma_weights,
            pad128,
            quality_tables,
            resize_yuv420_batch,
            resize_yuv_jpeg_batch,
        )
        from imagekit_tpu.utils.bucketing import batch_bucket

        loop = asyncio.get_running_loop()
        bh, bw, obh, obw, jq, csy, csx, mix, al = key
        ch_b, cw_b = bh // csy, bw // csx  # source chroma bucket dims
        try:
            t0 = time.perf_counter()
            nb = batch_bucket(len(items), self.max_batch)
            shard = self._use_mesh(nb)
            sig = (
                "yuvjpg" if jq else "yuvsrc", shard, nb, bh, bw, obh, obw,
                csy, csx, mix, al,
            )
            if sig not in self._compiled:
                self._kick_compile_yuvsrc(sig)
                await self._host_fallback_yuv(items)
                return
            ny = bh * bw
            nc = ch_b * cw_b
            flat = np.zeros(
                (nb, pad128(ny + 2 * nc + (ny if al else 0))), np.uint8
            )
            u_keys: Dict[Tuple[int, int, int, int], int] = {
                k: i
                for i, k in enumerate(
                    sorted(
                        {
                            (it.y.shape[1], it.y.shape[0], it.out_w, it.out_h)
                            for it in items
                        }
                    )
                )
            }
            vidx = np.zeros(nb, np.int32)
            qto = np.zeros((nb, 128), np.float32) if jq else None
            for i, it in enumerate(items):
                ihh, iww = it.y.shape
                yv = flat[i, :ny].reshape(bh, bw)
                yv[:ihh, :iww] = it.y
                chh, cww = it.cb.shape
                cbv = flat[i, ny:ny + nc].reshape(ch_b, cw_b)
                crv = flat[i, ny + nc:ny + 2 * nc].reshape(ch_b, cw_b)
                cbv[:chh, :cww] = it.cb
                crv[:chh, :cww] = it.cr
                if al:
                    av = flat[i, ny + 2 * nc:ny + 2 * nc + ny].reshape(
                        bh, bw
                    )
                    # pad region stays 0 (transparent) — cropped on host
                    av[:ihh, :iww] = it.alpha
                vidx[i] = u_keys[(iww, ihh, it.out_w, it.out_h)]
                if jq:
                    qy_o, qc_o = quality_tables(it.quality)
                    qto[i, :64] = qy_o
                    qto[i, 64:] = qc_o
            wkey = (key, shard, tuple(sorted(u_keys)))
            cached = self._dweights.get(wkey)
            if cached is None:
                nu = self.MAX_UNIQUE
                wv_y = np.zeros((nu, obh, bh), np.float32)
                wh_y = np.zeros((nu, obw, bw), np.float32)
                wv_c = np.zeros((nu, obh // 2, ch_b), np.float32)
                wh_c = np.zeros((nu, obw // 2, cw_b), np.float32)
                if mix:
                    # the 709->601 mix's luma-row chroma terms need the
                    # chroma planes on the FULL output grid too
                    wv_cf = np.zeros((nu, obh, ch_b), np.float32)
                    wh_cf = np.zeros((nu, obw, cw_b), np.float32)
                for (iww, ihh, ow_, oh_), u in u_keys.items():
                    # true source chroma dims follow the source geometry
                    # (csy/csx = 1 means no subsampling on that axis;
                    # upsample_weights is the identity there)
                    ch_ = (ihh + csy - 1) // csy
                    cw_ = (iww + csx - 1) // csx
                    wv_y[u] = _cached_weights(ihh, oh_, bh, obh)
                    wh_y[u] = _cached_weights(iww, ow_, bw, obw)
                    wv_c[u] = combined_chroma_half_weights(
                        ch_, ihh, oh_, ch_b, obh // 2
                    )
                    wh_c[u] = combined_chroma_half_weights(
                        cw_, iww, ow_, cw_b, obw // 2
                    )
                    if mix:
                        wv_cf[u] = combined_chroma_weights(
                            ch_, ihh, oh_, ch_b, obh
                        )
                        wh_cf[u] = combined_chroma_weights(
                            cw_, iww, ow_, cw_b, obw
                        )
                    if jq:
                        # encode tail: replicate the last true row/col up
                        # to the MCU grid (np.pad mode='edge' semantics)
                        m_h = min((oh_ + 15) // 16 * 16, obh)
                        m_w = min((ow_ + 15) // 16 * 16, obw)
                        wv_y[u, oh_:m_h] = wv_y[u, oh_ - 1]
                        wh_y[u, ow_:m_w] = wh_y[u, ow_ - 1]
                        ch_t = (oh_ + 1) // 2
                        cw_t = (ow_ + 1) // 2
                        wv_c[u, ch_t : m_h // 2] = wv_c[u, ch_t - 1]
                        wh_c[u, cw_t : m_w // 2] = wh_c[u, cw_t - 1]
                        if mix:
                            wv_cf[u, oh_:m_h] = wv_cf[u, oh_ - 1]
                            wh_cf[u, ow_:m_w] = wh_cf[u, ow_ - 1]
                import jax as _jax

                place = self._put_replicated if shard else _jax.device_put
                stacks = (wv_y, wh_y, wv_c, wh_c)
                if mix:
                    stacks = stacks + (wv_cf, wh_cf)
                cached = tuple(place(x) for x in stacks)
                self._dweights.put(wkey, cached)
            weights = cached
            t1 = time.perf_counter()

            def device_step():
                f_, v_ = flat, vidx
                if shard:
                    f_, v_ = self._put_sharded(flat), self._put_sharded(vidx)
                if jq:
                    qto_ = self._put_sharded(qto) if shard else qto
                    return resize_yuv_jpeg_batch(
                        f_, weights, qto_, v_, (bh, bw), (obh, obw),
                        mix=mix,
                    )
                return resize_yuv420_batch(
                    f_, weights, v_, (bh, bw), (obh, obw),
                    chroma_sub=(csy, csx), mix=mix, alpha=al,
                )

            self._inflight += 1
            try:
                out = await loop.run_in_executor(
                    self._device_pool, device_step
                )
            finally:
                self._inflight -= 1
            self._compiled.add(sig)
            t2 = time.perf_counter()
            self.metrics.add_stage_time("batch_build", t1 - t0)
            self.metrics.add_stage_time("device_resize", t2 - t1)
            self.metrics.record_batch(len(items))

            if jq:
                ylv, cblv, crlv = out
                from imagekit_tpu.codecs.native import loader as _nloader

                async def finish(i: int, it) -> None:
                    mby = (it.out_h + 15) // 16 * 2
                    mbx = (it.out_w + 15) // 16 * 2

                    def run():
                        planes = [
                            ylv[i, :mby, :mbx],
                            cblv[i, : mby // 2, : mbx // 2],
                            crlv[i, : mby // 2, : mbx // 2],
                        ]
                        return _nloader.encode_jpeg(
                            planes,
                            quality_tables(it.quality),
                            it.out_w,
                            it.out_h,
                        )

                    try:
                        encoded = await self._pool_run("encode", run)
                    except Exception as e:  # noqa: BLE001
                        if not it.future.done():
                            it.future.set_exception(e)
                        return
                    if not it.future.done():
                        it.future.set_result(encoded)

            else:

                async def finish(i: int, it) -> None:
                    if al:
                        yb, cbb, crb, ab = out
                    else:
                        yb, cbb, crb = out
                    ch_ = (it.out_h + 1) // 2
                    cw_ = (it.out_w + 1) // 2
                    try:
                        encoded = await self._encode_yuv(
                            loop,
                            yb[i, : it.out_h, : it.out_w],
                            cbb[i, :ch_, :cw_],
                            crb[i, :ch_, :cw_],
                            it.quality,
                            fmt=it.fmt,
                            alpha=(
                                ab[i, : it.out_h, : it.out_w] if al else None
                            ),
                        )
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

    def _kick_compile_yuvsrc(self, sig) -> None:
        if sig in self._compiling or not self._may_compile(sig):
            return
        self._compiling.add(sig)
        from imagekit_tpu.ops.dct import (
            pad128,
            resize_yuv420_batch,
            resize_yuv_jpeg_batch,
        )

        head, shard, nb, bh, bw, obh, obw, csy, csx, mix, al = sig

        def compile_step():
            try:
                ny = bh * bw
                nc = (bh // csy) * (bw // csx)
                flat = np.zeros(
                    (nb, pad128(ny + 2 * nc + (ny if al else 0))), np.uint8
                )
                nu = self.MAX_UNIQUE
                weights = (
                    np.zeros((nu, obh, bh), np.float32),
                    np.zeros((nu, obw, bw), np.float32),
                    np.zeros((nu, obh // 2, bh // csy), np.float32),
                    np.zeros((nu, obw // 2, bw // csx), np.float32),
                )
                if mix:
                    weights = weights + (
                        np.zeros((nu, obh, bh // csy), np.float32),
                        np.zeros((nu, obw, bw // csx), np.float32),
                    )
                idx = np.zeros(nb, np.int32)
                qto = np.zeros((nb, 128), np.float32)
                if shard:
                    flat, idx, qto = (
                        self._put_sharded(flat),
                        self._put_sharded(idx),
                        self._put_sharded(qto),
                    )
                    weights = tuple(self._put_replicated(w) for w in weights)
                if head == "yuvjpg":
                    resize_yuv_jpeg_batch(
                        flat, weights, qto, idx, (bh, bw), (obh, obw),
                        mix=mix,
                    )
                else:
                    resize_yuv420_batch(
                        flat, weights, idx, (bh, bw), (obh, obw),
                        chroma_sub=(csy, csx), mix=mix, alpha=al,
                    )
                self._compiled.add(sig)
            except Exception:
                pass
            finally:
                self._compiling.discard(sig)

        self._device_pool.submit(compile_step)

    async def _host_fallback_yuv(self, items) -> None:
        from imagekit_tpu.ops.dct import (
            host_resize_yuv420_single,
            host_yuv_jpeg_single,
        )

        loop = asyncio.get_running_loop()
        self.metrics.inc("host_fallbacks", len(items))

        async def one(it) -> None:
            try:
                if it.fmt == ImageFormat.jpeg:
                    from imagekit_tpu.codecs.native import loader as _nl

                    def run_jpeg():
                        planes, qt2 = host_yuv_jpeg_single(
                            it.y, it.cb, it.cr, it.out_h, it.out_w,
                            it.quality, mix=it.mix,
                        )
                        return _nl.encode_jpeg(
                            planes, qt2, it.out_w, it.out_h
                        )

                    encoded = await loop.run_in_executor(
                        self._codec_pool, run_jpeg
                    )
                    if not it.future.done():
                        it.future.set_result(encoded)
                    return
                planes = await loop.run_in_executor(
                    self._codec_pool,
                    functools.partial(
                        host_resize_yuv420_single,
                        it.y,
                        it.cb,
                        it.cr,
                        it.out_h,
                        it.out_w,
                        alpha=it.alpha,
                        mix=it.mix,
                    ),
                )
                yo, cbo, cro = planes[:3]
                ao = planes[3] if len(planes) == 4 else None
                encoded = await self._encode_yuv(
                    loop, yo, cbo, cro, it.quality, fmt=it.fmt, alpha=ao
                )
            except Exception as e:  # noqa: BLE001
                if not it.future.done():
                    it.future.set_exception(e)
                return
            if not it.future.done():
                it.future.set_result(encoded)

        await asyncio.gather(*(one(it) for it in items))

    async def _transform_jpeg_native(
        self,
        data: bytes,
        w: Optional[int],
        h: Optional[int],
        fmt: ImageFormat,
        quality: int,
    ) -> bytes:
        from imagekit_tpu.codecs import jpeg as jpeg_native

        if not jpeg_native.available():
            raise _NativeUnsupported()
        loop = asyncio.get_running_loop()
        self._ensure_flusher(loop)

        from imagekit_tpu.codecs import vp8 as vp8_native
        from imagekit_tpu.codecs.native import jpeg_abi, loader

        lib = loader.load()
        try:
            pre_hdr = jpeg_abi.parse(lib, data)  # header-only, microseconds
        except jpeg_abi.NativeJpegError as e:
            raise _NativeUnsupported() from e

        # Truncated-coefficient path for thumbnail-class downscales: keep
        # only each block's KxK low-frequency coefficients, shrinking the
        # host->device upload and the IDCT by (8/K)^2 (the dropped
        # frequencies are the ones the Lanczos downsample would remove).
        # Only for webp output (the fused YUV kernel has the lowfreq
        # variant); K=8 means the full path.
        pre_out_w, pre_out_h = target_dimensions(
            pre_hdr.width, pre_hdr.height, w, h
        )
        use_i8 = hasattr(lib, "ik_jpeg_decode_coeffs_lowfreq_i8")
        if fmt == ImageFormat.webp and vp8_native.available():
            kind = "yuv"
        elif fmt == ImageFormat.avif and _avif_encode_available():
            kind = "yuv"
        elif fmt == ImageFormat.jpeg and use_i8:
            # fused JPEG->JPEG transcode: one batched device round trip
            # (dequant/IDCT -> YUV-resident resize -> fDCT/quantise), host
            # does entropy only. Requires the split transport; escape-dense
            # outliers demote to the staged RGB path after decode.
            kind = "jxc"
        else:
            kind = "rgb"
        k = 8
        if kind in ("yuv", "jxc") and hasattr(
            lib, "ik_jpeg_decode_coeffs_lowfreq"
        ):
            # K is chosen from the BUCKET geometry (not true dims) so the
            # runtime choice always matches what warmup compiled; within a
            # bucket step of an exact 2x boundary the intermediate may be
            # slightly below the true target and the Lanczos weights upscale
            # mildly — a corner case the PSNR tests cover.
            try:
                k = self._choose_k(
                    bucket_for(pre_hdr.blocks_h[0] * 8),
                    bucket_for(pre_hdr.blocks_w[0] * 8),
                    bucket_for(pre_out_h),
                    bucket_for(pre_out_w),
                )
            except ValueError:
                k = 8  # outside the ladder; later checks handle fallback

        # Split int8 transport (all k, every kind): AC levels ride as int8
        # + a sparse escape list, ~halving the host->device upload on the
        # bandwidth-limited link. Escape-dense images (pathological noise
        # at q>=94) exceed the per-image budget and ride int16 instead.
        def entropy_decode():
            try:
                if use_i8:
                    # k=8 emits the full 63-AC split layout (the "lowfreq"
                    # entry covers K in [2, 8])
                    hdr2, dc, ac, esc, qt, ovf = (
                        jpeg_abi.decode_lowfreq_i8(lib, data, k, pre_hdr)
                    )
                    if not ovf and _esc_within_image_budget(esc):
                        return hdr2, None, (dc, ac, esc), qt
                if k < 8 and kind != "jxc":
                    h3, ck, qt = jpeg_abi.decode_lowfreq(lib, data, k, pre_hdr)
                else:
                    # the transcode kernel is split-only: a demoted jxc item
                    # needs the full int16 decode for the staged RGB path
                    h3, ck, qt = jpeg_abi.decode(lib, data)
                return h3, ck, None, qt
            except jpeg_abi.NativeJpegError as e:
                raise _NativeUnsupported() from e

        hdr, coeffs, split, qtabs = await self._pool_run(
            "entropy_decode", entropy_decode
        )
        if kind == "jxc" and split is None:
            kind, k = "rgb", 8
        if hdr.ncomp == 1:
            # grayscale: fabricate zero chroma coefficient planes at 4:2:0
            # geometry — zero blocks IDCT to flat 128, so the colour matrix
            # contributes exactly nothing and R=G=B=Y
            by, bx = (coeffs[0] if split is None else split[0][0]).shape[:2]
            if split is not None:
                dc, ac, esc = split
                dz = np.zeros(((by + 1) // 2, (bx + 1) // 2), np.int16)
                az = np.zeros(
                    ((by + 1) // 2, (bx + 1) // 2, k * k - 1), np.int8
                )
                split = ([dc[0], dz, dz], [ac[0], az, az], esc)
            else:
                cz = np.zeros(
                    ((by + 1) // 2, (bx + 1) // 2, k * k), np.int16
                )
                coeffs = [coeffs[0], cz, cz]
            # zero chroma coeffs dequantise to zero under any table, so the
            # chroma slot just reuses the luma's selected table
            qtabs = np.stack([qtabs[hdr.comp_tq[0]], qtabs[hdr.comp_tq[0]]])
            hdr = _GrayAs420(hdr)
        elif (
            hdr.ncomp != 3
            or tuple(hdr.comp_h) != (2, 1, 1)
            or tuple(hdr.comp_v) != (2, 1, 1)
            # the fused kernel carries one luma + one chroma table per image;
            # Cb/Cr with distinct selectors (legal, rare) use the generic path
            or hdr.comp_tq[1] != hdr.comp_tq[2]
        ):
            raise _NativeUnsupported()
        else:
            # index the 4x64 table array by the actual SOF selectors instead
            # of assuming the conventional (0, 1, 1) mapping (ADVICE.md r1)
            qtabs = np.stack([qtabs[hdr.comp_tq[0]], qtabs[hdr.comp_tq[1]]])

        out_w, out_h = target_dimensions(hdr.width, hdr.height, w, h)
        planes = coeffs if split is None else split[0]
        by_y, bx_y = planes[0].shape[:2]
        by_c, bx_c = planes[1].shape[:2]
        try:
            yb_h, yb_w = bucket_for(by_y * 8), bucket_for(bx_y * 8)
            obh, obw = bucket_for(out_h), bucket_for(out_w)
        except ValueError:
            raise _NativeUnsupported()
        if yb_h % 16 or yb_w % 16:
            raise _NativeUnsupported()

        fut: asyncio.Future = loop.create_future()
        item = _JpegItem(
            hdr, coeffs, qtabs, out_h, out_w, fmt, quality, fut, k=k,
            split=split,
        )
        # webp output takes the fused coefficients->YUV kernel (no RGB round
        # trip, half the D2H bytes); other formats the coefficients->RGB one.
        # The transport tag keeps int8- and int16-transport items in
        # separate queues so every flushed batch is homogeneous.
        key = (yb_h, yb_w, obh, obw, kind, k, split is not None)
        queue = self._jqueues.setdefault(key, [])
        queue.append(item)
        if len(queue) >= self.max_batch:
            self._jqueues[key] = []
            asyncio.ensure_future(self._flush_jpeg(key, queue))
        return await fut

    @staticmethod
    def _choose_k(src_bh: int, src_bw: int, out_bh: int, out_bw: int) -> int:
        """Smallest K in {2, 4, 8} whose K/8-scale intermediate still covers
        the target — computed on BUCKET dims so warmup and the request path
        always agree (downscales >=2x get truncated decode)."""
        for cand in (2, 4):
            if src_bh * cand // 8 >= out_bh and src_bw * cand // 8 >= out_bw:
                return cand
        return 8

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

    async def _flush_jpeg(self, key, items) -> None:
        groups = self._split_by_geometry(
            items,
            lambda it: (it.hdr.width, it.hdr.height, it.out_w, it.out_h),
            self.MAX_UNIQUE,
        )
        await asyncio.gather(
            *(self._flush_jpeg_group(key, g) for g in groups)
        )

    async def _flush_jpeg_group(self, key, items) -> None:
        from imagekit_tpu.ops.dct import (
            LOWFREQ_ESC_C,
            LOWFREQ_ESC_Y,
            combined_chroma_half_weights,
            combined_chroma_weights,
            decode_resize_rgb_batch,
            decode_resize_rgb_i8_batch,
            decode_resize_yuv_batch,
            decode_resize_yuv_i8_batch,
            decode_resize_yuv_lowfreq_batch,
            decode_resize_yuv_lowfreq_i8_batch,
            fold_lowfreq_weights,
            lowfreq_chroma_half_weights,
            lowfreq_luma_weights,
            pad128,
            quality_tables,
            transcode_i8_batch,
        )
        from imagekit_tpu.utils.bucketing import batch_bucket

        loop = asyncio.get_running_loop()
        yb_h, yb_w, obh, obw, kind, k, t8 = key
        by_b, bx_b = yb_h // 8, yb_w // 8
        cy_b, cx_b = yb_h // 16, yb_w // 16
        lowfreq = k < 8
        nk = k * k if lowfreq else 64
        na = nk - 1
        try:
            t0 = time.perf_counter()
            if t8 and not _esc_within_batch_budget(items):
                if kind == "jxc":
                    # NO int16 transcode kernel exists — widening would
                    # misroute jpeg requests onto the YUV path. Each item
                    # fits the budget alone (enqueue gate), so split the
                    # batch until every sub-batch fits.
                    if len(items) == 1:  # unreachable, defensive
                        await self._host_fallback_jpeg(items)
                        return
                    mid = len(items) // 2
                    await asyncio.gather(
                        self._flush_jpeg_group(key, items[:mid]),
                        self._flush_jpeg_group(key, items[mid:]),
                    )
                    return
                # combined escape load exceeds the split-int8 kernel's
                # static caps (each image fit alone): widen this batch back
                # to the int16 transport
                await loop.run_in_executor(
                    self._codec_pool, _widen_items, items, k
                )
                t8 = False
            nb = batch_bucket(len(items), self.max_batch)
            shard = self._use_mesh(nb)
            sig = (
                "jpeg8" if t8 else "jpeg",
                kind, k, shard, nb, yb_h, yb_w, obh, obw,
            )
            if sig not in self._compiled:
                self._kick_compile_jpeg(sig)
                await self._host_fallback_jpeg(items)
                return
            # lowfreq layout: flat (B, by, pad128(bx*k*k)) keeps the minor
            # transfer dim 128-aligned regardless of k; the split transport
            # carries DC (int16) and AC (int8) in separate 128-aligned
            # planes — PLANAR (one 128-aligned slice per coefficient plane,
            # ops.dct.lowfreq_ac_width) on the truncated path so the folded
            # kernels read each (u, v) plane as a contiguous slice
            if t8:
                pads = (pad128(bx_b), pad128(cx_b)) if lowfreq else None
                y_dc = np.zeros((nb, by_b, pad128(bx_b)), np.int16)
                cb_dc = np.zeros((nb, cy_b, pad128(cx_b)), np.int16)
                if lowfreq:
                    y_ac = np.zeros((nb, by_b, na * pads[0]), np.int8)
                    cb_ac = np.zeros((nb, cy_b, na * pads[1]), np.int8)
                else:
                    y_ac = np.zeros((nb, by_b, pad128(bx_b * na)), np.int8)
                    cb_ac = np.zeros((nb, cy_b, pad128(cx_b * na)), np.int8)
                cr_dc = np.zeros_like(cb_dc)
                cr_ac = np.zeros_like(cb_ac)
                esc_idx: list = [[], [], []]
                esc_val: list = [[], [], []]
            else:
                ym = pad128(bx_b * nk) if lowfreq else bx_b * 64
                cm = pad128(cx_b * nk) if lowfreq else cx_b * 64
                y = np.zeros((nb, by_b, ym), np.int16)
                cb = np.zeros((nb, cy_b, cm), np.int16)
                cr = np.zeros((nb, cy_b, cm), np.int16)
            qt = np.zeros((nb, 128), np.float32)
            # transcode batches also carry per-image OUTPUT quant tables
            qto = np.zeros((nb, 128), np.float32) if kind == "jxc" else None
            # canonical (sorted) unique-geometry indexing: groups holding the
            # same SET of geometries share one device-resident weight stack
            # regardless of arrival order (order-dependent keys thrashed the
            # cache and re-uploaded ~1 MB of weights per flush)
            u_keys: Dict[Tuple[int, int, int, int], int] = {
                k: i
                for i, k in enumerate(
                    sorted(
                        {
                            (it.hdr.width, it.hdr.height, it.out_w, it.out_h)
                            for it in items
                        }
                    )
                )
            }
            vidx = np.zeros(nb, np.int32)
            for i, it in enumerate(items):
                if t8:
                    dc, ac, esc = it.split
                    byi, bxi = dc[0].shape
                    cyi, cxi = dc[1].shape
                    y_dc[i, :byi, :bxi] = dc[0]
                    cb_dc[i, :cyi, :cxi] = dc[1]
                    cr_dc[i, :cyi, :cxi] = dc[2]
                    if lowfreq:
                        for j in range(na):
                            y_ac[i, :byi, j * pads[0] : j * pads[0] + bxi] = (
                                ac[0][:, :, j]
                            )
                            cb_ac[i, :cyi, j * pads[1] : j * pads[1] + cxi] = (
                                ac[1][:, :, j]
                            )
                            cr_ac[i, :cyi, j * pads[1] : j * pads[1] + cxi] = (
                                ac[2][:, :, j]
                            )
                    else:
                        y_ac[i, :byi, : bxi * na] = ac[0].reshape(byi, -1)
                        cb_ac[i, :cyi, : cxi * na] = ac[1].reshape(cyi, -1)
                        cr_ac[i, :cyi, : cxi * na] = ac[2].reshape(cyi, -1)
                    if len(esc):
                        for c, (ei, ev) in enumerate(
                            _esc_batch_rows(esc, i, bxi, cxi, na, pads)
                        ):
                            esc_idx[c].append(ei)
                            esc_val[c].append(ev)
                else:
                    byi, bxi = it.coeffs[0].shape[:2]
                    cyi, cxi = it.coeffs[1].shape[:2]
                    y[i, :byi, : bxi * nk] = it.coeffs[0].reshape(byi, -1)
                    cb[i, :cyi, : cxi * nk] = it.coeffs[1].reshape(cyi, -1)
                    cr[i, :cyi, : cxi * nk] = it.coeffs[2].reshape(cyi, -1)
                qt[i, :64] = it.qtabs[0]
                qt[i, 64:] = it.qtabs[1]
                if kind == "jxc":
                    qy_o, qc_o = quality_tables(it.quality)
                    qto[i, :64] = qy_o
                    qto[i, 64:] = qc_o
                vidx[i] = u_keys[(it.hdr.width, it.hdr.height, it.out_w, it.out_h)]
            nu = self.MAX_UNIQUE
            chroma_dims = {}
            for it in items:
                ukey = (it.hdr.width, it.hdr.height, it.out_w, it.out_h)
                chroma_dims.setdefault(
                    ukey, (it.hdr.comp_height[1], it.hdr.comp_width[1])
                )
            wkey = (key, nu, shard, tuple(sorted(u_keys)))
            cached = self._dweights.get(wkey)
            if cached is None:
                # chroma weights: to full output res for the RGB kernel, to
                # half res (subsample∘resize∘upsample folded) for the YUV one;
                # lowfreq weights resample the k/8-scale intermediate planes
                if lowfreq:
                    ly, lx = yb_h * k // 8, yb_w * k // 8
                    wv_y = np.zeros((nu, obh, ly), np.float32)
                    wh_y = np.zeros((nu, obw, lx), np.float32)
                    wv_c = np.zeros((nu, obh // 2, ly // 2), np.float32)
                    wh_c = np.zeros((nu, obw // 2, lx // 2), np.float32)
                else:
                    c_obh = obh if kind == "rgb" else obh // 2
                    c_obw = obw if kind == "rgb" else obw // 2
                    wv_y = np.zeros((nu, obh, yb_h), np.float32)
                    wh_y = np.zeros((nu, obw, yb_w), np.float32)
                    wv_c = np.zeros((nu, c_obh, yb_h // 2), np.float32)
                    wh_c = np.zeros((nu, c_obw, yb_w // 2), np.float32)
                for (iw, ih, ow_, oh_), u in u_keys.items():
                    c_h, c_w = chroma_dims[(iw, ih, ow_, oh_)]
                    if lowfreq:
                        wv_y[u] = lowfreq_luma_weights(
                            ih, oh_, k, yb_h * k // 8, obh
                        )
                        wh_y[u] = lowfreq_luma_weights(
                            iw, ow_, k, yb_w * k // 8, obw
                        )
                        wv_c[u] = lowfreq_chroma_half_weights(
                            c_h, ih, oh_, yb_h * k // 16, obh // 2, k
                        )
                        wh_c[u] = lowfreq_chroma_half_weights(
                            c_w, iw, ow_, yb_w * k // 16, obw // 2, k
                        )
                        continue
                    wv_y[u] = _cached_weights(ih, oh_, yb_h, obh)
                    wh_y[u] = _cached_weights(iw, ow_, yb_w, obw)
                    if kind == "rgb":
                        wv_c[u] = combined_chroma_weights(
                            c_h, ih, oh_, yb_h // 2, obh
                        )
                        wh_c[u] = combined_chroma_weights(
                            c_w, iw, ow_, yb_w // 2, obw
                        )
                    else:
                        wv_c[u] = combined_chroma_half_weights(
                            c_h, ih, oh_, yb_h // 2, obh // 2
                        )
                        wh_c[u] = combined_chroma_half_weights(
                            c_w, iw, ow_, yb_w // 2, obw // 2
                        )
                if kind == "jxc":
                    # encode-side edge replication: output rows/cols beyond
                    # the true dims replicate the last true row up to the
                    # MCU grid — mirroring np.pad(mode="edge") in the staged
                    # encoder (zero padding would put a hard step inside
                    # the edge MCU blocks and bloat/ring their encode)
                    for (iw, ih, ow_, oh_), u in u_keys.items():
                        m_h = min((oh_ + 15) // 16 * 16, obh)
                        m_w = min((ow_ + 15) // 16 * 16, obw)
                        wv_y[u, oh_:m_h] = wv_y[u, oh_ - 1]
                        wh_y[u, ow_:m_w] = wh_y[u, ow_ - 1]
                        ch_t = (oh_ + 1) // 2
                        cw_t = (ow_ + 1) // 2
                        wv_c[u, ch_t : m_h // 2] = wv_c[u, ch_t - 1]
                        wh_c[u, cw_t : m_w // 2] = wh_c[u, cw_t - 1]
                import jax as _jax

                if lowfreq:
                    # fold the k-point IDCT basis into the stacks (after
                    # jxc edge replication — replicated OUTPUT rows stay
                    # valid because folding acts on the column axis only)
                    wv_y, wh_y, wv_c, wh_c = (
                        fold_lowfreq_weights(w, k)
                        for w in (wv_y, wh_y, wv_c, wh_c)
                    )
                place = self._put_replicated if shard else _jax.device_put
                cached = tuple(place(x) for x in (wv_y, wh_y, wv_c, wh_c))
                self._dweights.put(wkey, cached)
            wv_y, wh_y, wv_c, wh_c = cached
            t1 = time.perf_counter()

            if t8:
                ey = _pad_esc(esc_idx[0], esc_val[0], LOWFREQ_ESC_Y)
                eb = _pad_esc(esc_idx[1], esc_val[1], LOWFREQ_ESC_C)
                er = _pad_esc(esc_idx[2], esc_val[2], LOWFREQ_ESC_C)

            def device_step():
                if t8:
                    dcs = (y_dc, cb_dc, cr_dc)
                    acs = (y_ac, cb_ac, cr_ac)
                    escs, qt_, vidx_ = (ey, eb, er), qt, vidx
                    if shard:  # DP over the mesh's data axis
                        dcs = tuple(self._put_sharded(a) for a in dcs)
                        acs = tuple(self._put_sharded(a) for a in acs)
                        qt_ = self._put_sharded(qt_)
                        vidx_ = self._put_sharded(vidx_)
                        # escape coordinates index the GLOBAL batch axis;
                        # replicate and let GSPMD partition the scatter
                        escs = tuple(
                            (self._put_replicated(i_), self._put_replicated(v_))
                            for i_, v_ in escs
                        )
                    if kind == "jxc":
                        qto_ = self._put_sharded(qto) if shard else qto
                        return transcode_i8_batch(
                            dcs, acs, escs, qt_, qto_,
                            (wv_y, wh_y, wv_c, wh_c),
                            vidx_,
                            (by_b, bx_b, cy_b, cx_b),
                            (obh, obw),
                            k,
                        )
                    if lowfreq:
                        return decode_resize_yuv_lowfreq_i8_batch(
                            dcs, acs, escs, qt_,
                            (wv_y, wh_y, wv_c, wh_c),
                            vidx_,
                            (by_b, bx_b, cy_b, cx_b),
                            (obh, obw),
                            k,
                        )
                    fn8 = (
                        decode_resize_rgb_i8_batch
                        if kind == "rgb"
                        else decode_resize_yuv_i8_batch
                    )
                    return fn8(
                        dcs, acs, escs, qt_,
                        (wv_y, wh_y, wv_c, wh_c),
                        vidx_,
                        (by_b, bx_b, cy_b, cx_b),
                        (obh, obw),
                    )
                yb_, cbb_, crb_, qt_, vidx_ = y, cb, cr, qt, vidx
                if shard:  # DP over the mesh's data axis
                    yb_, cbb_, crb_, qt_, vidx_ = (
                        self._put_sharded(a)
                        for a in (yb_, cbb_, crb_, qt_, vidx_)
                    )
                if lowfreq:
                    return decode_resize_yuv_lowfreq_batch(
                        yb_, cbb_, crb_, qt_,
                        (wv_y, wh_y, wv_c, wh_c),
                        vidx_,
                        (by_b, bx_b, cy_b, cx_b),
                        (obh, obw),
                        k,
                    )
                fn = (
                    decode_resize_rgb_batch
                    if kind == "rgb"
                    else decode_resize_yuv_batch
                )
                return fn(
                    yb_, cbb_, crb_, qt_,
                    (wv_y, wh_y, wv_c, wh_c),
                    vidx_,
                    (by_b, bx_b, cy_b, cx_b),
                    (obh, obw),
                )

            self._inflight += 1
            try:
                out = await loop.run_in_executor(self._device_pool, device_step)
            finally:
                self._inflight -= 1
            self._compiled.add(sig)
            t2 = time.perf_counter()
            self.metrics.add_stage_time("batch_build", t1 - t0)
            self.metrics.add_stage_time("device_decode_resize", t2 - t1)
            self.metrics.record_batch(len(items))

            if kind == "jxc":
                ylv, cblv, crlv = out
                from imagekit_tpu.codecs.native import loader as _nloader

                async def finish(i: int, it) -> None:
                    # slice the true MCU grid (luma 2*ceil(h/16) block rows,
                    # chroma ceil(h/16)) and entropy-encode on host
                    mby = (it.out_h + 15) // 16 * 2
                    mbx = (it.out_w + 15) // 16 * 2

                    def run():
                        planes = [
                            ylv[i, :mby, :mbx],
                            cblv[i, : mby // 2, : mbx // 2],
                            crlv[i, : mby // 2, : mbx // 2],
                        ]
                        return _nloader.encode_jpeg(
                            planes,
                            quality_tables(it.quality),
                            it.out_w,
                            it.out_h,
                        )

                    try:
                        encoded = await self._pool_run("encode", run)
                    except Exception as e:  # noqa: BLE001
                        if not it.future.done():
                            it.future.set_exception(e)
                        return
                    if not it.future.done():
                        it.future.set_result(encoded)

            elif kind == "rgb":

                async def finish(i: int, it) -> None:
                    cropped = out[i, : it.out_h, : it.out_w]
                    try:
                        encoded = await self._encode(
                            loop, cropped, it.fmt, it.quality
                        )
                    except Exception as e:  # noqa: BLE001
                        if not it.future.done():
                            it.future.set_exception(e)
                        return
                    if not it.future.done():
                        it.future.set_result(encoded)

            else:
                yb, cbb, crb = out

                async def finish(i: int, it) -> None:
                    ch = (it.out_h + 1) // 2
                    cw = (it.out_w + 1) // 2
                    try:
                        encoded = await self._encode_yuv(
                            loop,
                            yb[i, : it.out_h, : it.out_w],
                            cbb[i, :ch, :cw],
                            crb[i, :ch, :cw],
                            it.quality,
                            fmt=it.fmt,
                        )
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

    # -- internals --
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

    async def _flush(self, key: _BucketKey, items: List[_Item]) -> None:
        groups = self._split_by_geometry(
            items,
            lambda it: (it.img.shape[0], it.img.shape[1], it.out_h, it.out_w),
            self.MAX_UNIQUE,
        )
        await asyncio.gather(*(self._flush_group(key, g) for g in groups))

    async def _flush_group(self, key: _BucketKey, items: List[_Item]) -> None:
        loop = asyncio.get_running_loop()
        bh, bw, obh, obw, ch, okind = key
        wy = okind == "yuv"
        jq = okind == "jpg"
        try:
            t0 = time.perf_counter()
            # pad the batch axis to a small ladder so each (shape, batch)
            # pair compiles exactly once; zero weights make pad entries free
            from imagekit_tpu.ops.color import resample_rgb_yuv_batch
            from imagekit_tpu.ops.dct import (
                quality_tables,
                resample_rgb_jpeg_batch,
            )
            from imagekit_tpu.ops.resize import resample_bucketed_flat
            from imagekit_tpu.utils.bucketing import batch_bucket

            nb = batch_bucket(len(items), self.max_batch)
            shard = self._use_mesh(nb)
            head = {"yuv": "rgbyuv", "jpg": "rgbjpg"}.get(okind, "rgb")
            sig = (head, shard, nb, bh, bw, obh, obw, ch)
            if sig not in self._compiled:
                self._kick_compile_rgb(sig)
                await self._host_fallback_rgb(items)
                return
            # flat (B, H, W*C) u8 layout: keeps the minor transfer dim wide
            # (avoids the 128-lane padding blowup of NHWC u8 transfers)
            batch = np.zeros((nb, bh, bw * ch), dtype=np.uint8)
            # canonical (sorted) unique-geometry indexing so equal geometry
            # SETS share one device-resident weight stack (see jpeg path)
            v_keys: Dict[Tuple[int, int], int] = {
                k: i
                for i, k in enumerate(
                    sorted({(it.img.shape[0], it.out_h) for it in items})
                )
            }
            h_keys: Dict[Tuple[int, int], int] = {
                k: i
                for i, k in enumerate(
                    sorted({(it.img.shape[1], it.out_w) for it in items})
                )
            }
            vidx = np.zeros(nb, np.int32)
            hidx = np.zeros(nb, np.int32)
            qto = np.zeros((nb, 128), np.float32) if jq else None
            for i, it in enumerate(items):
                h_i, w_i = it.img.shape[:2]
                batch[i, :h_i, : w_i * ch] = it.img.reshape(h_i, w_i * ch)
                vidx[i] = v_keys[(h_i, it.out_h)]
                hidx[i] = h_keys[(w_i, it.out_w)]
                if jq:
                    qy_o, qc_o = quality_tables(it.quality)
                    qto[i, :64] = qy_o
                    qto[i, 64:] = qc_o
            wkey = (
                key, shard, tuple(sorted(v_keys)), tuple(sorted(h_keys)),
            )
            cached = self._dweights.get(wkey)
            if cached is None:
                nu_v = self.MAX_UNIQUE
                nu_h = self.MAX_UNIQUE
                wv = np.zeros((nu_v, obh, bh), dtype=np.float32)
                wh = np.zeros((nu_h, obw, bw), dtype=np.float32)
                # fused-output edge semantics: rows/cols beyond the true
                # output replicate the last true one (matching the staged
                # host paths' np.pad mode='edge') — one row for the webp
                # kernel's 2x2 chroma box, the full MCU grid for the jpeg
                # encode tail
                rep_to = (
                    (lambda to: to + (to & 1)) if wy
                    else (lambda to: (to + 15) // 16 * 16) if jq
                    else (lambda to: to)
                )
                for (ti, to), u in v_keys.items():
                    wv[u] = _cached_weights(ti, to, bh, obh)
                    wv[u, to : min(rep_to(to), obh)] = wv[u, to - 1]
                for (ti, to), u in h_keys.items():
                    wh[u] = _cached_weights(ti, to, bw, obw)
                    wh[u, to : min(rep_to(to), obw)] = wh[u, to - 1]
                import jax as _jax

                place = self._put_replicated if shard else _jax.device_put
                cached = (place(wv), place(wh))
                self._dweights.put(wkey, cached)
            wv, wh = cached
            t1 = time.perf_counter()

            def device_step():
                b_, v_, h_ = batch, vidx, hidx
                if shard:  # DP over the mesh's data axis (weights cached
                    # with a replicated placement already)
                    b_, v_, h_ = (
                        self._put_sharded(a) for a in (batch, vidx, hidx)
                    )
                if wy:
                    return resample_rgb_yuv_batch(
                        b_, (wv, wh), v_, h_, (obh, obw)
                    )
                if jq:
                    qto_ = self._put_sharded(qto) if shard else qto
                    return resample_rgb_jpeg_batch(
                        b_, (wv, wh), v_, h_, qto_, (obh, obw)
                    )
                flat = np.asarray(
                    resample_bucketed_flat(b_, wv, wh, v_, h_, ch)
                )
                return flat.reshape(nb, obh, obw, ch)

            self._inflight += 1
            try:
                out = await loop.run_in_executor(self._device_pool, device_step)
            finally:
                self._inflight -= 1
            self._compiled.add(sig)
            t2 = time.perf_counter()
            self.metrics.add_stage_time("batch_build", t1 - t0)
            self.metrics.add_stage_time("device_resize", t2 - t1)
            self.metrics.record_batch(len(items))

            if wy:
                yb_p, cb_p, cr_p = out

                async def finish(i: int, it: _Item) -> None:
                    ch2 = (it.out_h + 1) // 2
                    cw2 = (it.out_w + 1) // 2
                    try:
                        encoded = await self._encode_yuv(
                            loop,
                            yb_p[i, : it.out_h, : it.out_w],
                            cb_p[i, :ch2, :cw2],
                            cr_p[i, :ch2, :cw2],
                            it.quality,
                            fmt=it.fmt,
                        )
                    except Exception as e:  # noqa: BLE001
                        if not it.future.done():
                            it.future.set_exception(e)
                        return
                    if not it.future.done():
                        it.future.set_result(encoded)

                await asyncio.gather(
                    *(finish(i, it) for i, it in enumerate(items))
                )
                return

            if jq:
                ylv, cblv, crlv = out
                from imagekit_tpu.codecs.native import loader as _nloader

                async def finish(i: int, it: _Item) -> None:
                    mby = (it.out_h + 15) // 16 * 2
                    mbx = (it.out_w + 15) // 16 * 2

                    def run():
                        planes = [
                            ylv[i, :mby, :mbx],
                            cblv[i, : mby // 2, : mbx // 2],
                            crlv[i, : mby // 2, : mbx // 2],
                        ]
                        return _nloader.encode_jpeg(
                            planes,
                            quality_tables(it.quality),
                            it.out_w,
                            it.out_h,
                        )

                    try:
                        encoded = await self._pool_run("encode", run)
                    except Exception as e:  # noqa: BLE001
                        if not it.future.done():
                            it.future.set_exception(e)
                        return
                    if not it.future.done():
                        it.future.set_result(encoded)

                await asyncio.gather(
                    *(finish(i, it) for i, it in enumerate(items))
                )
                return

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
            self.metrics.queue_depth = self._total_queued()

    # -- compile-miss host fallback ------------------------------------

    def _kick_compile_rgb(self, sig) -> None:
        """Compile a cold rgb-path shape in the background (zero inputs)."""
        if sig in self._compiling or not self._may_compile(sig):
            return
        self._compiling.add(sig)
        from imagekit_tpu.ops.color import resample_rgb_yuv_batch
        from imagekit_tpu.ops.dct import resample_rgb_jpeg_batch
        from imagekit_tpu.ops.resize import resample_bucketed_flat

        head, shard, nb, bh, bw, obh, obw, ch = sig

        def compile_step():
            try:
                batch = np.zeros((nb, bh, bw * ch), np.uint8)
                wv = np.zeros((self.MAX_UNIQUE, obh, bh), np.float32)
                wh = np.zeros((self.MAX_UNIQUE, obw, bw), np.float32)
                idx = np.zeros(nb, np.int32)
                qto = np.zeros((nb, 128), np.float32)
                if shard:
                    batch, idx, qto = (
                        self._put_sharded(batch),
                        self._put_sharded(idx),
                        self._put_sharded(qto),
                    )
                    wv, wh = self._put_replicated(wv), self._put_replicated(wh)
                if head == "rgbyuv":
                    resample_rgb_yuv_batch(
                        batch, (wv, wh), idx, idx, (obh, obw)
                    )
                elif head == "rgbjpg":
                    resample_rgb_jpeg_batch(
                        batch, (wv, wh), idx, idx, qto, (obh, obw)
                    )
                else:
                    np.asarray(
                        resample_bucketed_flat(batch, wv, wh, idx, idx, ch)
                    )
                self._compiled.add(sig)
            except Exception:
                pass
            finally:
                self._compiling.discard(sig)

        self._device_pool.submit(compile_step)

    def _compile_jpeg_sig(self, sig) -> None:
        """Blocking compile of one jpeg-path signature with zero inputs
        (shared by warmup and the background cold-shape kicker)."""
        from imagekit_tpu.ops.dct import (
            LOWFREQ_ESC_C,
            LOWFREQ_ESC_Y,
            decode_resize_rgb_batch,
            decode_resize_rgb_i8_batch,
            decode_resize_yuv_batch,
            decode_resize_yuv_i8_batch,
            decode_resize_yuv_lowfreq_batch,
            decode_resize_yuv_lowfreq_i8_batch,
            pad128,
            transcode_i8_batch,
        )

        head, kind, k, shard, nb, yb_h, yb_w, obh, obw = sig
        t8 = head == "jpeg8"
        if kind == "jxc" and not t8:
            # the transcode kind is split-transport only; an int16 jxc sig
            # must never compile (it would bind the wrong kernel)
            raise ValueError(f"int16 transcode signature is invalid: {sig}")
        by_b, bx_b = yb_h // 8, yb_w // 8
        cy_b, cx_b = yb_h // 16, yb_w // 16
        lowfreq = k < 8
        nk = k * k if lowfreq else 64
        ym = pad128(bx_b * nk) if lowfreq else bx_b * 64
        cm = pad128(cx_b * nk) if lowfreq else cx_b * 64
        if lowfreq:
            # folded (U, k, O, nblk) stacks — fold_lowfreq_weights layout
            wdims = (
                (k, obh, by_b),
                (k, obw, bx_b),
                (k, obh // 2, cy_b),
                (k, obw // 2, cx_b),
            )
        else:
            c_obh = obh if kind == "rgb" else obh // 2
            c_obw = obw if kind == "rgb" else obw // 2
            wdims = (
                (obh, yb_h),
                (obw, yb_w),
                (c_obh, yb_h // 2),
                (c_obw, yb_w // 2),
            )
        qt = np.zeros((nb, 128), np.float32)
        weights = tuple(
            np.zeros((self.MAX_UNIQUE,) + d, np.float32) for d in wdims
        )
        idx = np.zeros(nb, np.int32)
        if t8:
            na = nk - 1
            y_dc = np.zeros((nb, by_b, pad128(bx_b)), np.int16)
            c_dc = np.zeros((nb, cy_b, pad128(cx_b)), np.int16)
            if lowfreq:  # planar AC layout (ops.dct.lowfreq_ac_width)
                y_ac = np.zeros((nb, by_b, na * pad128(bx_b)), np.int8)
                c_ac = np.zeros((nb, cy_b, na * pad128(cx_b)), np.int8)
            else:
                y_ac = np.zeros((nb, by_b, pad128(bx_b * na)), np.int8)
                c_ac = np.zeros((nb, cy_b, pad128(cx_b * na)), np.int8)
            ey = (
                np.zeros((LOWFREQ_ESC_Y, 3), np.int32),
                np.zeros((LOWFREQ_ESC_Y,), np.int32),
            )
            ec = (
                np.zeros((LOWFREQ_ESC_C, 3), np.int32),
                np.zeros((LOWFREQ_ESC_C,), np.int32),
            )
            escs = (ey, ec, ec)
            if shard:
                y_dc, y_ac, c_dc, c_ac, qt, idx = (
                    self._put_sharded(a)
                    for a in (y_dc, y_ac, c_dc, c_ac, qt, idx)
                )
                weights = tuple(self._put_replicated(w) for w in weights)
                escs = tuple(
                    (self._put_replicated(i_), self._put_replicated(v_))
                    for i_, v_ in escs
                )
            if kind == "jxc":
                qto = np.zeros((nb, 128), np.float32)
                if shard:
                    qto = self._put_sharded(qto)
                transcode_i8_batch(
                    (y_dc, c_dc, c_dc), (y_ac, c_ac, c_ac), escs, qt, qto,
                    weights, idx, (by_b, bx_b, cy_b, cx_b), (obh, obw), k,
                )
            elif lowfreq:
                decode_resize_yuv_lowfreq_i8_batch(
                    (y_dc, c_dc, c_dc), (y_ac, c_ac, c_ac), escs, qt,
                    weights, idx, (by_b, bx_b, cy_b, cx_b), (obh, obw), k,
                )
            else:
                fn8 = (
                    decode_resize_rgb_i8_batch
                    if kind == "rgb"
                    else decode_resize_yuv_i8_batch
                )
                fn8(
                    (y_dc, c_dc, c_dc), (y_ac, c_ac, c_ac), escs, qt,
                    weights, idx, (by_b, bx_b, cy_b, cx_b), (obh, obw),
                )
            self._compiled.add(sig)
            return
        y = np.zeros((nb, by_b, ym), np.int16)
        c = np.zeros((nb, cy_b, cm), np.int16)
        if shard:
            y, c, qt, idx = (self._put_sharded(a) for a in (y, c, qt, idx))
            weights = tuple(self._put_replicated(w) for w in weights)
        if lowfreq:
            decode_resize_yuv_lowfreq_batch(
                y, c, c, qt, weights, idx,
                (by_b, bx_b, cy_b, cx_b), (obh, obw), k,
            )
        else:
            fn = (
                decode_resize_rgb_batch
                if kind == "rgb"
                else decode_resize_yuv_batch
            )
            fn(
                y, c, c, qt, weights, idx,
                (by_b, bx_b, cy_b, cx_b), (obh, obw),
            )
        self._compiled.add(sig)

    def _kick_compile_jpeg(self, sig) -> None:
        if sig in self._compiling or not self._may_compile(sig):
            return
        self._compiling.add(sig)

        def compile_step():
            try:
                self._compile_jpeg_sig(sig)
            except Exception:
                pass
            finally:
                self._compiling.discard(sig)

        self._device_pool.submit(compile_step)

    async def _host_fallback_rgb(self, items: List[_Item]) -> None:
        """Serve a cold-shape batch on host: same resample math in numpy."""
        from imagekit_tpu.ops.resize import resample_reference

        loop = asyncio.get_running_loop()
        self.metrics.inc("host_fallbacks", len(items))

        async def one(it: _Item) -> None:
            try:
                resized = await loop.run_in_executor(
                    self._codec_pool,
                    resample_reference,
                    it.img,
                    it.out_h,
                    it.out_w,
                )
                encoded = await self._encode(loop, resized, it.fmt, it.quality)
            except Exception as e:  # noqa: BLE001
                if not it.future.done():
                    it.future.set_exception(e)
                return
            if not it.future.done():
                it.future.set_result(encoded)

        await asyncio.gather(*(one(it) for it in items))

    async def _host_fallback_jpeg(self, items) -> None:
        from imagekit_tpu.ops.dct import (
            host_decode_resize_single,
            host_decode_resize_yuv_lowfreq_single,
            host_transcode_single,
        )

        loop = asyncio.get_running_loop()
        self.metrics.inc("host_fallbacks", len(items))

        def _levels(it):
            """Truncated items on the split int8 transport rebuild their
            int16 level planes host-side (runs inside the codec pool)."""
            if it.coeffs is None:
                from imagekit_tpu.codecs.native import jpeg_abi

                it.coeffs = jpeg_abi.reconstruct_lowfreq_levels(
                    *it.split, it.k
                )
                it.split = None
            return it.coeffs

        async def one(it) -> None:
            try:
                if it.fmt == ImageFormat.jpeg and it.split is not None:
                    # fused-transcode item on a cold shape: numpy mirror of
                    # the transcode kernel -> host Huffman encode
                    from imagekit_tpu.codecs.native import loader as _nl

                    def run_transcode():
                        planes, qt2 = host_transcode_single(
                            _levels(it),
                            it.qtabs,
                            it.hdr.width,
                            it.hdr.height,
                            it.hdr.comp_width[1],
                            it.hdr.comp_height[1],
                            it.out_h,
                            it.out_w,
                            it.k,
                            it.quality,
                        )
                        return _nl.encode_jpeg(
                            planes, qt2, it.out_w, it.out_h
                        )

                    encoded = await loop.run_in_executor(
                        self._codec_pool, run_transcode
                    )
                elif it.k < 8:
                    # truncated items carry KxK blocks: numpy mirror of the
                    # lowfreq kernel -> YUV planes -> native VP8 encode
                    yuv = await loop.run_in_executor(
                        self._codec_pool,
                        lambda: host_decode_resize_yuv_lowfreq_single(
                            _levels(it),
                            it.qtabs,
                            it.hdr.width,
                            it.hdr.height,
                            it.hdr.comp_width[1],
                            it.hdr.comp_height[1],
                            it.out_h,
                            it.out_w,
                            it.k,
                        ),
                    )
                    encoded = await self._encode_yuv(
                        loop, yuv[0], yuv[1], yuv[2], it.quality,
                        fmt=it.fmt,
                    )
                else:
                    rgb = await loop.run_in_executor(
                        self._codec_pool,
                        lambda: host_decode_resize_single(
                            _levels(it),
                            it.qtabs,
                            it.hdr.width,
                            it.hdr.height,
                            it.hdr.comp_width[1],
                            it.hdr.comp_height[1],
                            it.out_h,
                            it.out_w,
                        ),
                    )
                    encoded = await self._encode(loop, rgb, it.fmt, it.quality)
            except Exception as e:  # noqa: BLE001
                if not it.future.done():
                    it.future.set_exception(e)
                return
            if not it.future.done():
                it.future.set_result(encoded)

        await asyncio.gather(*(one(it) for it in items))

    async def _encode(
        self, loop: asyncio.AbstractEventLoop, img: np.ndarray, fmt: ImageFormat, q: int
    ) -> bytes:
        return await self._pool_run(
            "encode", encode_image, np.ascontiguousarray(img), fmt, q
        )

    async def _encode_yuv(
        self,
        loop: asyncio.AbstractEventLoop,
        y: np.ndarray,
        cb: np.ndarray,
        cr: np.ndarray,
        q: int,
        fmt: ImageFormat = ImageFormat.webp,
        alpha: Optional[np.ndarray] = None,
    ) -> bytes:
        """WebP or AVIF encode from device-produced studio-range YUV
        planes (the fused no-RGB-round-trip tail shared by every YUV-
        domain path): only the VP8 / AV1 bitstream runs on host.
        ``alpha`` (full-range, luma geometry) feeds the AVIF encoder's
        alpha arm; webp output drops alpha upstream (reference parity:
        its lossy encode is from_rgb)."""
        if fmt == ImageFormat.avif:
            from imagekit_tpu.codecs import avif_encode

            return await self._pool_run(
                "encode",
                functools.partial(
                    avif_encode.encode_yuv420_studio, y, cb, cr, q,
                    alpha=np.ascontiguousarray(alpha)
                    if alpha is not None else None,
                ),
            )
        from imagekit_tpu.codecs import vp8 as vp8_native

        return await self._pool_run(
            "encode", vp8_native.encode_yuv420, y, cb, cr, q
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
