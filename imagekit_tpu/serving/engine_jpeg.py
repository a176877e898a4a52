"""JPEG-coefficient head: host entropy decode -> fused device kernels.

Split out of batcher.py in round 5 (VERDICT r4 next #7). Mixin methods
of :class:`imagekit_tpu.serving.batcher.BatchedEngine` — the north-star
JPEG path: C++ Huffman decode to quantised coefficients, truncated-k
selection, the split-int8 / int16 coefficient transports
(:mod:`imagekit_tpu.serving.jpeg_transport`), batch assembly, the fused
decode->resize and jpeg->jpeg transcode dispatches, compile kicks and
the host fallback. Budget/demotion helpers are called through the
transport MODULE so tests can monkeypatch them there.
"""

from __future__ import annotations

import asyncio
import time
from typing import Dict, Optional, Tuple

import numpy as np

from imagekit_tpu.config import ImageFormat
from imagekit_tpu.ops.resize import target_dimensions
from imagekit_tpu.serving import jpeg_transport as _jt
from imagekit_tpu.serving.batch_types import (
    _avif_encode_available,
    _cached_weights,
    _NativeUnsupported,
)
from imagekit_tpu.serving.jpeg_transport import (
    _esc_batch_rows,
    _GrayAs420,
    _JpegItem,
    _pad_esc,
)
from imagekit_tpu.utils.bucketing import bucket_for


class JpegPathMixin:
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
                    if not ovf and _jt._esc_within_image_budget(esc):
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
            if t8 and not _jt._esc_within_batch_budget(items):
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
                    self._codec_pool, _jt._widen_items, items, k
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
