#!/usr/bin/env python
"""Headline benchmark: 1080p JPEG -> 400px Lanczos3 resize -> WebP q80,
end-to-end through the batched engine (decode on host codec pool, batched
resample on TPU, libwebp encode on host), BASELINE.json config #1/#5.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``vs_baseline`` compares against the reference's published expectation for
the same shape — 20-50 RPS/core cache-miss WebP transform
(loadtest/README.md:142); we use the midpoint, 35/s.

Env knobs: IK_BENCH_N (total images), IK_BENCH_SOURCES, IK_BENCH_CONCURRENCY.
"""

import asyncio
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_BASELINE_RPS = 35.0  # midpoint of the reference's 20-50 RPS claim


def make_sources(n: int):
    """Distinct photo-like 1080p JPEGs, synthesized in memory."""
    from PIL import Image

    rng = np.random.default_rng(1234)
    out = []
    yy, xx = np.mgrid[0:1080, 0:1920].astype(np.float32)
    for i in range(n):
        f1, f2 = 37.0 + 3 * i, 61.0 + 5 * i
        img = np.stack(
            [
                128 + 90 * np.sin(xx / f1 + i),
                128 + 90 * np.cos(yy / f2),
                128 + 60 * np.sin((xx + yy) / (f1 + f2)),
            ],
            axis=-1,
        )
        img = np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        # q85 ~ representative CDN source size (the reference's load test
        # pulls real photos from picsum; heavy synthetic noise at q90 would
        # be an unrepresentative entropy-decode worst case)
        Image.fromarray(img).save(buf, "JPEG", quality=85)
        out.append(buf.getvalue())
    return out


async def run_bench():
    from imagekit_tpu.config import BatchConfig, ImageFormat, ImageKitConfig
    from imagekit_tpu.serving.batcher import BatchedEngine
    from imagekit_tpu.serving.metrics import Metrics

    n_total = int(os.environ.get("IK_BENCH_N", "256"))
    n_sources = int(os.environ.get("IK_BENCH_SOURCES", "24"))
    concurrency = int(os.environ.get("IK_BENCH_CONCURRENCY", "96"))
    max_batch = int(os.environ.get("IK_BENCH_MAX_BATCH", "32"))

    sources = make_sources(n_sources)
    cfg = ImageKitConfig(
        secret="bench",
        batch=BatchConfig(max_batch=max_batch, max_delay_ms=6.0),
    )
    metrics = Metrics()
    engine = BatchedEngine(cfg, metrics=metrics)

    t_warm0 = time.perf_counter()
    await engine.warmup(paths=("jpeg",))  # bench sources are all JPEG
    # one full warm pass through the pipeline (primes codec pool + weights)
    await asyncio.gather(
        *(
            engine.transform(sources[i % n_sources], 400, None, ImageFormat.webp, 80)
            for i in range(min(2 * max_batch, n_total))
        )
    )
    warmup_s = time.perf_counter() - t_warm0

    latencies = []
    sem = asyncio.Semaphore(concurrency)

    async def one(i: int):
        async with sem:
            t0 = time.perf_counter()
            out = await engine.transform(
                sources[i % n_sources], 400, None, ImageFormat.webp, 80
            )
            latencies.append(time.perf_counter() - t0)
            return len(out)

    t0 = time.perf_counter()
    sizes = await asyncio.gather(*(one(i) for i in range(n_total)))
    elapsed = time.perf_counter() - t0

    # low-load latency: sequential requests on an idle engine (the p50 a
    # lightly-loaded origin would see; the saturated run above measures
    # throughput, where p50 is mostly queueing)
    lowload = []
    for i in range(8):
        t0 = time.perf_counter()
        await engine.transform(
            sources[i % n_sources], 400, None, ImageFormat.webp, 80
        )
        lowload.append(time.perf_counter() - t0)
    lowload.sort()
    await engine.close()

    lat = np.array(sorted(latencies))
    stage = dict(metrics.stage_seconds)
    mean_batch = metrics.batched_images / max(metrics.batches, 1)
    return {
        "metric": "images/sec/chip (1080p JPEG -> 400px Lanczos3 -> WebP q80, e2e)",
        "value": round(n_total / elapsed, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(n_total / elapsed / REFERENCE_BASELINE_RPS, 2),
        "n": n_total,
        "p50_ms": round(float(lat[len(lat) // 2]) * 1000, 1),
        "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1000, 1),
        "p50_ms_lowload": round(lowload[len(lowload) // 2] * 1000, 1),
        "mean_output_bytes": int(np.mean(sizes)),
        "mean_batch_size": round(mean_batch, 1),
        "warmup_s": round(warmup_s, 1),
        "stage_s": {k: round(v, 2) for k, v in stage.items()},
        "device": _device_name(),
    }


def _device_name():
    try:
        import jax

        d = jax.devices()[0]
        return f"{d.platform}:{d.device_kind}"
    except Exception:
        return "unknown"


if __name__ == "__main__":
    result = asyncio.run(run_bench())
    print(json.dumps(result))
