"""Engine-level admission control (VERDICT r2 weak #1): when the
estimated queue-drain latency exceeds the budget, arrivals shed with
429 + Retry-After instead of queueing unboundedly — the engine-layer
analogue of the reference's per-IP governor (``src/lib.rs:450-467``),
which bounds latency only per client, not per server.
"""

import asyncio
import io
import time

import numpy as np
import pytest
from PIL import Image

from imagekit_tpu.config import BatchConfig, ImageFormat, ImageKitConfig
from imagekit_tpu.errors import EngineOverloaded
from imagekit_tpu.serving.batcher import BatchedEngine
from imagekit_tpu.serving.metrics import Metrics
from tests.conftest import make_test_image


def make_engine(budget=2.0):
    cfg = ImageKitConfig(
        secret="s",
        batch=BatchConfig(max_batch=8, max_queue_latency_s=budget),
    )
    return BatchedEngine(cfg, metrics=Metrics())


def _prime_rate(engine, rate_per_s: float, n: int = 16) -> None:
    """Fabricate a completion history implying the given service rate."""
    now = time.monotonic()
    span = n / rate_per_s
    for i in range(n):
        engine._done_times.append(now - span + i * (span / n))


def test_sheds_when_estimated_wait_exceeds_budget():
    engine = make_engine(budget=2.0)
    _prime_rate(engine, rate_per_s=10.0)
    engine._insystem = 50  # 50 / 10 = 5s estimated wait > 2s budget
    with pytest.raises(EngineOverloaded) as ei:
        engine._admission_check()
    # Retry-After ~ (wait - budget), at least 1s
    assert 1.0 <= ei.value.retry_after <= 10.0
    assert engine.metrics.shed == 1


def test_admits_within_budget():
    engine = make_engine(budget=2.0)
    _prime_rate(engine, rate_per_s=10.0)
    engine._insystem = 10  # 1s wait < 2s budget
    engine._admission_check()
    assert engine.metrics.shed == 0


def test_no_history_always_admits():
    """Cold start must never shed (the estimator has nothing to stand
    on; misjudging capacity must degrade to queueing, not to 429s)."""
    engine = make_engine(budget=0.1)
    engine._insystem = 10_000
    engine._admission_check()
    assert engine.metrics.shed == 0


def test_stale_history_always_admits():
    """History older than the 30s window is discarded — a server that
    went idle must not shed its first burst on a stale rate estimate."""
    engine = make_engine(budget=0.1)
    now = time.monotonic()
    for i in range(32):
        engine._done_times.append(now - 300 + i)
    engine._insystem = 10_000
    engine._admission_check()
    assert engine.metrics.shed == 0


def test_burst_then_lull_does_not_shed(monkeypatch):
    """ADVICE r3 (medium): 8 completions in 1 s followed by a 20 s lull
    used to read as 8/21 ~= 0.4/s (idle time inside the 30 s window
    deflated the rate), so the first arrivals of the next burst were
    spuriously shed on an idle engine. The rate must be measured over
    the busy span — and a non-fresh newest completion must skip
    shedding entirely."""
    engine = make_engine(budget=2.0)
    now = time.monotonic()
    # 8 completions packed into 1 s, ending 20 s ago
    for i in range(8):
        engine._done_times.append(now - 21.0 + i / 7.0)
    engine._insystem = 50  # at true 7/s this is ~7s wait, but the
    # engine has been idle 20 s — it must admit, not shed
    engine._admission_check()
    assert engine.metrics.shed == 0


def test_busy_span_rate_not_deflated_by_recent_idle():
    """Even inside the 5 s freshness window, idle time after the burst
    must not count toward the span: 16 completions over 1 s ending 3 s
    ago is a 15/s engine, not a 4/s one."""
    engine = make_engine(budget=2.0)
    now = time.monotonic()
    for i in range(16):
        engine._done_times.append(now - 4.0 + i / 15.0)
    # true busy rate = 15/s; wait for 20 in-system = ~1.3s < 2s budget.
    # The old now-anchored estimator would read 16/4 = 4/s -> 5s wait
    # and shed.
    engine._insystem = 20
    engine._admission_check()
    assert engine.metrics.shed == 0


def test_disabled_budget_never_sheds():
    engine = make_engine(budget=0.0)
    _prime_rate(engine, rate_per_s=1.0)
    engine._insystem = 10_000
    engine._admission_check()
    assert engine.metrics.shed == 0


def test_transform_entry_is_gated_and_completions_recorded():
    engine = make_engine(budget=2.0)
    img = make_test_image(64, 48)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    data = buf.getvalue()

    async def run():
        before = len(engine._done_times)
        await engine.transform(data, 32, None, ImageFormat.webp, 80)
        assert len(engine._done_times) == before + 1
        assert engine._insystem == 0
        # now force an overload state: the next call must raise
        _prime_rate(engine, rate_per_s=2.0)
        engine._insystem = 100
        try:
            with pytest.raises(EngineOverloaded):
                await engine.transform(data, 32, None, ImageFormat.webp, 80)
        finally:
            engine._insystem = 0
        await engine.close()

    asyncio.run(run())


def test_failed_requests_do_not_count_as_completions():
    engine = make_engine(budget=2.0)

    async def run():
        before = len(engine._done_times)
        with pytest.raises(Exception):
            await engine.transform(b"garbage", 32, None, ImageFormat.webp, 80)
        assert len(engine._done_times) == before
        assert engine._insystem == 0
        await engine.close()

    asyncio.run(run())


def test_http_429_with_retry_after(tmp_path):
    """End-to-end: an overloaded engine yields 429 + Retry-After on
    /upload, and the shed counter is exposed in /metrics."""
    from tests.test_integration import make_client
    from aiohttp.test_utils import TestClient, TestServer
    import aiohttp

    async def run():
        app, fetcher, metrics = make_client(tmp_path)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            engine = app["state"].engine
            _prime_rate(engine, rate_per_s=2.0)
            engine._insystem = 100

            img = make_test_image(64, 48)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG", quality=85)
            form = aiohttp.FormData()
            form.add_field("w", "32")
            form.add_field("f", "webp")
            form.add_field("file", buf.getvalue(), filename="t.jpg")
            resp = await client.post("/upload", data=form)
            assert resp.status == 429
            assert "retry-after" in resp.headers
            assert int(resp.headers["retry-after"]) >= 1

            engine._insystem = 0
            m = await (await client.get("/metrics")).text()
            assert "imagekit_shed_total 1" in m
        finally:
            await client.close()

    asyncio.run(run())
