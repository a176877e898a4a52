#!/usr/bin/env python
"""Synthetic codec-pool scaling evidence (VERDICT r4 next #9).

The dev box has ONE host core, so the codec pool's multi-core scaling
(the reference gets it from tokio running each request on its own core,
src/main.rs:20) cannot be measured for real. This harness measures the
part that CAN be measured anywhere: the pool's own serialization
overheads, by driving the REAL request path (``BatchedEngine._pool_run``
-> ThreadPoolExecutor -> stage-metrics accounting -> asyncio wakeup)
with fake-latency workers.

A ``time.sleep(t)`` worker releases the GIL exactly like the native C++
entropy stages do (vp8_encode/jpeg_entropy hold the GIL released for
their whole run), so N sleeping workers overlap the way N cores would —
any shortfall from ideal N/t throughput is pure pool/asyncio/GIL-wrapper
overhead, which is what the "one chip absorbs ~25-40 host cores"
arithmetic needs quantified.

Outputs one JSON line per configuration plus a markdown table on
stdout; paste the table into BASELINE.md.

Run: env -u PYTHONPATH PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \\
       python tools/pool_scaling.py
"""

import asyncio
import json
import time


def build_engine(workers: int):
    from imagekit_tpu.config import BatchConfig, ImageKitConfig
    from imagekit_tpu.serving.batcher import BatchedEngine
    from imagekit_tpu.serving.metrics import Metrics

    cfg = ImageKitConfig(
        secret="s", batch=BatchConfig(max_batch=8, max_delay_ms=5.0)
    )
    return BatchedEngine(cfg, metrics=Metrics(), codec_workers=workers)


async def drive(engine, n_ops: int, concurrency: int, work_s: float):
    """n_ops fake codec calls through the production _pool_run path at
    the given request concurrency."""
    sem = asyncio.Semaphore(concurrency)

    def fake_codec():
        if work_s > 0:
            time.sleep(work_s)  # GIL released, like the C++ stages
        return 1

    async def one():
        async with sem:
            return await engine._pool_run("synthetic", fake_codec)

    t0 = time.perf_counter()
    await asyncio.gather(*(one() for _ in range(n_ops)))
    return time.perf_counter() - t0


def measure(workers: int, work_ms: float, n_ops: int = 400):
    engine = build_engine(workers)
    # concurrency 2x workers keeps the pool queue non-empty (measures
    # the pool at saturation, not the arrival process)
    conc = max(8, workers * 2)
    try:
        elapsed = asyncio.run(drive(engine, n_ops, conc, work_ms / 1e3))
        ips = n_ops / elapsed
        ideal = workers / (work_ms / 1e3) if work_ms > 0 else float("inf")
        wait = engine.metrics.stage_wait_seconds.get("synthetic", 0.0)
        active = engine.metrics.stage_seconds.get("synthetic", 0.0)
        return {
            "workers": workers,
            "work_ms": work_ms,
            "ops_per_s": round(ips, 1),
            "ideal_ops_per_s": (
                round(ideal, 1) if ideal != float("inf") else None
            ),
            "efficiency_pct": (
                round(100.0 * ips / ideal, 1)
                if ideal != float("inf")
                else None
            ),
            "mean_wait_ms": round(1e3 * wait / n_ops, 3),
            "mean_active_ms": round(1e3 * active / n_ops, 3),
        }
    finally:
        asyncio.run(engine.close())


def main():
    rows = []
    # fixed per-op pool cost: zero-work ops/s ceiling (the pool's
    # serialization floor — submit + dispatch + metric + asyncio wakeup)
    base = measure(4, 0.0, n_ops=2000)
    print(json.dumps({"probe": "zero-work ceiling", **base}))
    overhead_ms = 1e3 / base["ops_per_s"]
    rows.append(base)

    # scaling curve at the production operating point: ~11 ms/img host
    # entropy budget (BASELINE.md flagship-class q80 encode), plus a
    # short-op stress point (2 ms: JPEG-entropy-class)
    for work_ms in (11.0, 2.0):
        for workers in (1, 2, 4, 8, 16, 32):
            n = max(200, min(1200, int(workers * 40)))
            r = measure(workers, work_ms, n_ops=n)
            rows.append(r)
            print(json.dumps(r))

    print()
    print("| workers | work/op (ms) | ops/s | ideal | efficiency |"
          " mean wait (ms) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        if r["ideal_ops_per_s"] is None:
            continue
        print(
            f"| {r['workers']} | {r['work_ms']} | {r['ops_per_s']} "
            f"| {r['ideal_ops_per_s']} | {r['efficiency_pct']}% "
            f"| {r['mean_wait_ms']} |"
        )
    print()
    print(json.dumps({
        "pool_fixed_overhead_ms_per_op": round(overhead_ms, 4),
        "note": (
            "sleep workers release the GIL like the native codecs; "
            "efficiency shortfall = pool+asyncio serialization"
        ),
    }))


if __name__ == "__main__":
    main()
