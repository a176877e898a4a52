"""Pallas in-tile layout-fusion variant of the yuvsrc head (round 5,
VERDICT r4 next #5): interpret-mode equivalence against the einsum
kernel. On CPU both paths resolve HIGH precision to full f32, so the
contract here is EXACT equality; on TPU the acceptance contract is the
same ±1 u8 band as every kernel-vs-mirror pin (bf16x3 associativity)."""

import numpy as np
import pytest

from imagekit_tpu.ops import pallas_resize
from imagekit_tpu.ops.dct import (
    combined_chroma_half_weights,
    pad128,
    resize_yuv420_batch,
)
from imagekit_tpu.ops.resize import padded_weights


def _weights(bh, bw, obh, obw, csy, csx, geoms):
    U = 4
    wv_y = np.zeros((U, obh, bh), np.float32)
    wh_y = np.zeros((U, obw, bw), np.float32)
    wv_c = np.zeros((U, obh // 2, bh // csy), np.float32)
    wh_c = np.zeros((U, obw // 2, bw // csx), np.float32)
    for u, (iww, ihh, ow_, oh_) in enumerate(geoms):
        wv_y[u] = padded_weights(ihh, oh_, bh, obh)
        wh_y[u] = padded_weights(iww, ow_, bw, obw)
        ch_ = (ihh + csy - 1) // csy
        cw_ = (iww + csx - 1) // csx
        wv_c[u] = combined_chroma_half_weights(ch_, ihh, oh_, bh // csy, obh // 2)
        wh_c[u] = combined_chroma_half_weights(cw_, iww, ow_, bw // csx, obw // 2)
    return wv_y, wh_y, wv_c, wh_c


def _run_both(monkeypatch, flat, weights, vidx, ins, outs, **kw):
    monkeypatch.setenv("IMAGEKIT_PALLAS_YUV", "")
    ref = resize_yuv420_batch(flat, weights, vidx, ins, outs, **kw)
    monkeypatch.setenv("IMAGEKIT_PALLAS_YUV", "interpret")
    assert pallas_resize.enabled()
    got = resize_yuv420_batch(flat, weights, vidx, ins, outs, **kw)
    return ref, got


@pytest.mark.parametrize("csy,csx", [(2, 2), (1, 2), (1, 1)])
def test_pallas_matches_einsum_kernel(monkeypatch, csy, csx):
    rng = np.random.default_rng(1)
    bh, bw, obh, obw = 64, 256, 32, 128
    ny = bh * bw
    nc = (bh // csy) * (bw // csx)
    B = 3
    flat = rng.integers(0, 255, (B, pad128(ny + 2 * nc)), np.uint8)
    geoms = [(240, 60, 120, 30), (200, 56, 100, 28), (256, 64, 128, 32),
             (130, 34, 66, 18)]
    weights = _weights(bh, bw, obh, obw, csy, csx, geoms)
    vidx = np.array([0, 3, 1], np.int32)
    ref, got = _run_both(
        monkeypatch, flat, weights, vidx, (bh, bw), (obh, obw),
        chroma_sub=(csy, csx),
    )
    for name, a, b in zip(("y", "cb", "cr"), ref, got):
        assert a.shape == b.shape
        d = int(np.abs(a.astype(int) - b.astype(int)).max())
        assert d <= 1, (name, d)  # exact on CPU; ±1 allowed on TPU


def test_pallas_alpha_plane(monkeypatch):
    rng = np.random.default_rng(2)
    bh, bw, obh, obw = 64, 256, 32, 128
    ny, nc = bh * bw, (bh // 2) * (bw // 2)
    B = 2
    flat = rng.integers(0, 255, (B, pad128(2 * ny + 2 * nc)), np.uint8)
    geoms = [(240, 60, 120, 30)] * 4
    weights = _weights(bh, bw, obh, obw, 2, 2, geoms)
    vidx = np.zeros(B, np.int32)
    ref, got = _run_both(
        monkeypatch, flat, weights, vidx, (bh, bw), (obh, obw), alpha=True,
    )
    assert len(ref) == len(got) == 4
    for a, b in zip(ref, got):
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 1


def test_pallas_gating(monkeypatch):
    # default OFF; mix batches stay on the einsum head regardless
    monkeypatch.delenv("IMAGEKIT_PALLAS_YUV", raising=False)
    assert not pallas_resize.enabled()
    monkeypatch.setenv("IMAGEKIT_PALLAS_YUV", "1")
    import jax

    assert pallas_resize.enabled() == (jax.default_backend() == "tpu")
    monkeypatch.setenv("IMAGEKIT_PALLAS_YUV", "interpret")
    assert pallas_resize.enabled()


def test_pallas_strip_choice():
    # strips prefer 128-multiple divisors under the VMEM budget and
    # fall back to the full width when none divides
    assert pallas_resize._pick_strip(1920, 1088) in (128, 256, 384, 640)
    assert 1920 % pallas_resize._pick_strip(1920, 1088) == 0
    assert pallas_resize._pick_strip(960, 544) == 960  # no 128-divisor


def test_pallas_rgbyuv_matches_einsum(monkeypatch):
    """Third Pallas front (rgbyuv): de-interleave + per-channel Pallas
    resize to rounded u8 (the einsum head's exact hand-off point) +
    XLA mix/subsample tail — exact on CPU."""
    from imagekit_tpu.ops.color import resample_rgb_yuv_batch

    rng = np.random.default_rng(4)
    B, U = 3, 4
    bh, bw, obh, obw = 64, 256, 32, 128
    imgs = rng.integers(0, 255, (B, bh, bw * 3), np.uint8)
    wv = np.stack(
        [padded_weights(60 - 2 * i, 30 - i, bh, obh) for i in range(U)]
    ).astype(np.float32)
    wh = np.stack(
        [padded_weights(250 - 3 * i, 125 - 2 * i, bw, obw)
         for i in range(U)]
    ).astype(np.float32)
    vidx = np.array([0, 2, 1], np.int32)
    hidx = np.array([3, 1, 0], np.int32)  # axes keyed separately
    monkeypatch.setenv("IMAGEKIT_PALLAS_RGB", "")
    ref = resample_rgb_yuv_batch(imgs, (wv, wh), vidx, hidx, (obh, obw))
    monkeypatch.setenv("IMAGEKIT_PALLAS_RGB", "interpret")
    assert pallas_resize.rgb_enabled()
    got = resample_rgb_yuv_batch(imgs, (wv, wh), vidx, hidx, (obh, obw))
    for name, a, b in zip(("y", "u", "v"), ref, got):
        assert a.shape == b.shape
        d = int(np.abs(a.astype(int) - b.astype(int)).max())
        assert d <= 1, (name, d)  # exact on CPU; ±1 allowed on TPU


def test_pallas_yuvjpg_matches_einsum(monkeypatch):
    """Fifth Pallas front: the fused YUV->JPEG head — per-plane Pallas
    resize with the studio->JFIF remap + u8c epilogue fused in (exact
    einsum op order), einsum fDCT tail unchanged. int16 levels exact on
    CPU."""
    from imagekit_tpu.ops.dct import (
        combined_chroma_half_weights,
        pad128,
        resize_yuv_jpeg_batch,
    )

    rng = np.random.default_rng(2)
    B, U = 3, 4
    bh, bw, obh, obw = 64, 256, 32, 128
    ny, nc = bh * bw, (bh // 2) * (bw // 2)
    flat = rng.integers(0, 255, (B, pad128(ny + 2 * nc)), np.uint8)
    geoms = [(240, 60, 120, 30), (200, 56, 104, 28), (256, 64, 128, 32),
             (130, 34, 66, 18)]
    wv_y = np.zeros((U, obh, bh), np.float32)
    wh_y = np.zeros((U, obw, bw), np.float32)
    wv_c = np.zeros((U, obh // 2, bh // 2), np.float32)
    wh_c = np.zeros((U, obw // 2, bw // 2), np.float32)
    for u, (iww, ihh, ow_, oh_) in enumerate(geoms):
        wv_y[u] = padded_weights(ihh, oh_, bh, obh)
        wh_y[u] = padded_weights(iww, ow_, bw, obw)
        wv_c[u] = combined_chroma_half_weights(
            (ihh + 1) // 2, ihh, oh_, bh // 2, obh // 2)
        wh_c[u] = combined_chroma_half_weights(
            (iww + 1) // 2, iww, ow_, bw // 2, obw // 2)
    vidx = np.array([0, 3, 1], np.int32)
    qt_out = rng.random((B, 128)).astype(np.float32) * 20 + 1
    args = (flat, (wv_y, wh_y, wv_c, wh_c), qt_out, vidx,
            (bh, bw), (obh, obw))
    monkeypatch.setenv("IMAGEKIT_PALLAS_YUVJPG", "")
    ref = resize_yuv_jpeg_batch(*args)
    monkeypatch.setenv("IMAGEKIT_PALLAS_YUVJPG", "interpret")
    assert pallas_resize.yuvjpg_enabled()
    got = resize_yuv_jpeg_batch(*args)
    for name, a, b in zip(("y", "cb", "cr"), ref, got):
        assert a.shape == b.shape
        assert (a == b).all(), name  # int16 levels: exact on CPU


def test_engine_serves_with_pallas_enabled(monkeypatch):
    """The batched engine end-to-end with the Pallas yuvsrc front
    enabled (interpret): WebP source -> fused head -> WebP output, no
    host fallback once compiled, bytes decode correctly."""
    import asyncio
    import io

    import pytest
    from PIL import Image

    from imagekit_tpu.codecs import vp8 as vp8_native
    from imagekit_tpu.config import ImageFormat
    from imagekit_tpu.utils.bucketing import bucket_for
    from tests.conftest import make_test_image
    from tests.test_batcher import make_engine

    if not (vp8_native.available() and vp8_native.decode_available()):
        pytest.skip("native VP8 unavailable")

    monkeypatch.setenv("IMAGEKIT_PALLAS_YUV", "interpret")
    img = make_test_image(96, 64)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=92)
    data = buf.getvalue()

    engine = make_engine()

    async def run():
        from imagekit_tpu.ops.dct import pad128, resize_yuv420_batch

        bh, bw = bucket_for(64), bucket_for(96)
        obh, obw = bucket_for(32), bucket_for(48)
        ny, nc = bh * bw, (bh // 2) * (bw // 2)
        nu = engine.MAX_UNIQUE
        # warm the signature through the SAME dispatch the engine uses
        resize_yuv420_batch(
            np.zeros((1, pad128(ny + 2 * nc)), np.uint8),
            (
                np.zeros((nu, obh, bh), np.float32),
                np.zeros((nu, obw, bw), np.float32),
                np.zeros((nu, obh // 2, bh // 2), np.float32),
                np.zeros((nu, obw // 2, bw // 2), np.float32),
            ),
            np.zeros(1, np.int32), (bh, bw), (obh, obw),
        )
        engine._compiled.add(
            ("yuvsrc", False, 1, bh, bw, obh, obw, 2, 2, False, False)
        )
        out = await engine.transform(data, 48, None, ImageFormat.webp, 85)
        await engine.close()
        return out

    out = asyncio.run(run())
    assert engine.metrics.host_fallbacks == 0
    assert out[:4] == b"RIFF"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    golden = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (48, 32), Image.LANCZOS
        )
    )
    from tests.conftest import psnr

    assert psnr(dec, golden) >= 28.0


def test_pallas_rgbjpg_matches_einsum(monkeypatch):
    """Sixth Pallas front: RGB -> JPEG head — per-channel Pallas resize
    to the rounded u8 grid, JFIF mix + subsample + einsum fDCT tail.
    int16 levels exact on CPU."""
    from imagekit_tpu.ops.dct import resample_rgb_jpeg_batch

    rng = np.random.default_rng(3)
    B, U = 3, 4
    bh, bw, obh, obw = 64, 256, 32, 128
    imgs = rng.integers(0, 255, (B, bh, bw * 3), np.uint8)
    wv = np.stack(
        [padded_weights(60 - 2 * i, 30 - i, bh, obh) for i in range(U)]
    ).astype(np.float32)
    wh = np.stack(
        [padded_weights(250 - 3 * i, 125 - 2 * i, bw, obw)
         for i in range(U)]
    ).astype(np.float32)
    vidx = np.array([0, 2, 1], np.int32)
    hidx = np.array([3, 1, 0], np.int32)
    qt_out = rng.random((B, 128)).astype(np.float32) * 20 + 1
    args = (imgs, (wv, wh), vidx, hidx, qt_out, (obh, obw))
    monkeypatch.setenv("IMAGEKIT_PALLAS_RGBJPG", "")
    ref = resample_rgb_jpeg_batch(*args)
    monkeypatch.setenv("IMAGEKIT_PALLAS_RGBJPG", "interpret")
    assert pallas_resize.rgbjpg_enabled()
    got = resample_rgb_jpeg_batch(*args)
    for name, a, b in zip(("y", "cb", "cr"), ref, got):
        assert (a == b).all(), name  # int16 levels: exact on CPU
