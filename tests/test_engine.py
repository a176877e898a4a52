"""ThreadedEngine (per-request execution) parity with the batched engine."""

import asyncio

from imagekit_tpu.config import ImageFormat, ImageKitConfig
from imagekit_tpu.serving.engine import ThreadedEngine, default_engine
from imagekit_tpu.serving.metrics import Metrics
from imagekit_tpu.transform import decode_image
from tests.conftest import encode_jpeg_pil, make_test_image, psnr


def test_threaded_engine_full_transform():
    engine = ThreadedEngine(ImageKitConfig(secret="s"), metrics=Metrics())
    src = encode_jpeg_pil(make_test_image(640, 480), 90)

    async def run():
        out = await engine.transform(src, 200, None, ImageFormat.webp, 80)
        await engine.close()
        return out

    out = asyncio.run(run())
    dec, _ = decode_image(out)
    assert dec.shape[:2] == (150, 200)


def test_threaded_matches_batched():
    from imagekit_tpu.serving.batcher import BatchedEngine

    src = encode_jpeg_pil(make_test_image(320, 240), 92)
    cfg = ImageKitConfig(secret="s")

    async def run(engine):
        out = await engine.transform(src, 160, None, ImageFormat.jpeg, 90)
        await engine.close()
        return out

    a = asyncio.run(run(ThreadedEngine(cfg, metrics=Metrics())))
    b = asyncio.run(run(BatchedEngine(cfg, metrics=Metrics())))
    da, db = decode_image(a)[0], decode_image(b)[0]
    assert da.shape == db.shape
    assert psnr(da, db) >= 40.0


def test_default_engine_is_batched():
    from imagekit_tpu.serving.batcher import BatchedEngine

    eng = default_engine(ImageKitConfig(secret="s"))
    assert isinstance(eng, BatchedEngine)

    async def close():
        await eng.close()

    asyncio.run(close())
