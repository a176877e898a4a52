"""YUV-domain head: native WebP/AVIF sources, resized entirely in YUV.

Split out of batcher.py in round 5 (VERDICT r4 next #7). Mixin methods
of :class:`imagekit_tpu.serving.batcher.BatchedEngine` — the engine owns
the queues/pools/metrics; this module owns the YUV-source path: native
decode hand-off, batch assembly (keyed by chroma geometry + mix/alpha
variants), the fused yuvsrc/yuvjpg dispatch, compile kicks, the host
mirror fallback, and the YUV-plane encode tail.
"""

from __future__ import annotations

import asyncio
import functools
import time
from typing import Dict, Optional, Tuple

import numpy as np

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.ops.resize import target_dimensions
from imagekit_tpu.serving.batch_types import (
    _avif_encode_available,
    _cached_weights,
    _NativeUnsupported,
    _YuvItem,
)
from imagekit_tpu.utils.bucketing import bucket_for


class YuvPathMixin:
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
                # only AVIF output keeps alpha (encoder alpha arm); for
                # webp/jpeg outputs skip the aux-plane decode outright
                return avif_native.decode_yuv_studio(
                    data, want_alpha=(fmt == ImageFormat.avif)
                )
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
