#!/usr/bin/env python
"""Load-test harness for imagekit_tpu.

Equivalent of the reference's goose-based crate (``loadtest/src/main.rs``):
two scenarios with the same transactions and weights —

- ``ImageTransformation``: sign_url (w=3), fetch_image (w=10),
  health_check (w=1)                     (``loadtest/src/main.rs:26-33``)
- ``CachePerformance``: cached_image (w=15), uncached_image (w=5)
  (``loadtest/src/main.rs:36-44``)

Transactions (``loadtest/src/main.rs:53-149``):
- sign_url:       GET /sign with random w/h/f and t=now+3600
- fetch_image:    GET /sign then GET the *properly signed* /img URL
  (the reference's version swaps "/sign?"->"/img?" WITHOUT the sig and so
  always exercises the 400 path — SURVEY.md §3.5; we follow the signed_url
  the server returns, which is what the transaction clearly intends)
- cached_image:   fixed 500x500 webp q80 -> cache-hit probe
- uncached_image: timestamp-derived dims -> guaranteed miss
- health_check:   GET /health

Performance targets mirrored from ``loadtest/src/main.rs:19-22``:
cached p95 < 50ms, transform p95 < 500ms, error rate < 1%.

Usage:
  python loadtest/main.py --host http://localhost:8080 --users 16 \
      --duration 60 [--source-url URL]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import sys
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class TxStats:
    latencies: List[float] = field(default_factory=list)
    errors: int = 0
    shed: int = 0  # 429 admission-control sheds: designed overload
    #                behaviour (Retry-After), not failures
    by_status: Dict[int, int] = field(default_factory=lambda: defaultdict(int))

    def record(self, dt: float, status: int, ok: bool) -> None:
        self.latencies.append(dt)
        self.by_status[status] += 1
        if status == 429:
            self.shed += 1
        elif not ok:
            self.errors += 1

    def percentile(self, p: float) -> float:
        if not self.latencies:
            return 0.0
        xs = sorted(self.latencies)
        return xs[min(int(len(xs) * p), len(xs) - 1)]


class LoadTest:
    def __init__(self, host: str, source_url: str):
        self.host = host.rstrip("/")
        self.source_url = source_url
        self.stats: Dict[str, TxStats] = defaultdict(TxStats)
        self._session = None

    async def session(self):
        import aiohttp

        if self._session is None:
            self._session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=60)
            )
        return self._session

    async def _get(self, name: str, path: str, ok_statuses=(200,)):
        s = await self.session()
        t0 = time.perf_counter()
        try:
            async with s.get(self.host + path) as resp:
                await resp.read()
                dt = time.perf_counter() - t0
                self.stats[name].record(dt, resp.status, resp.status in ok_statuses)
                return resp.status
        except Exception:
            self.stats[name].record(time.perf_counter() - t0, 0, False)
            return 0

    # -- transactions (loadtest/src/main.rs:53-149) --

    async def sign_url(self):
        w = random.choice([200, 400, 800, 1200])
        h = random.choice([200, 400, 800])
        f = random.choice(["webp", "jpeg", "avif"])
        t = int(time.time()) + 3600
        await self._get(
            "sign_url",
            f"/sign?url={self.source_url}&w={w}&h={h}&f={f}&t={t}",
        )

    async def fetch_image(self):
        s = await self.session()
        w = random.choice([200, 400, 800])
        t0 = time.perf_counter()
        try:
            async with s.get(
                f"{self.host}/sign?url={self.source_url}&w={w}&f=webp&q=80"
            ) as resp:
                body = await resp.json()
            async with s.get(self.host + body["signed_url"]) as resp2:
                await resp2.read()
                dt = time.perf_counter() - t0
                self.stats["fetch_image"].record(
                    dt, resp2.status, resp2.status == 200
                )
        except Exception:
            self.stats["fetch_image"].record(
                time.perf_counter() - t0, 0, False
            )

    async def cached_image(self):
        s = await self.session()
        t0 = time.perf_counter()
        try:
            async with s.get(
                f"{self.host}/sign?url={self.source_url}&w=500&h=500&f=webp&q=80"
            ) as resp:
                body = await resp.json()
            async with s.get(self.host + body["signed_url"]) as resp2:
                await resp2.read()
                self.stats["cached_image"].record(
                    time.perf_counter() - t0, resp2.status, resp2.status == 200
                )
        except Exception:
            self.stats["cached_image"].record(
                time.perf_counter() - t0, 0, False
            )

    async def uncached_image(self):
        s = await self.session()
        # timestamp-derived dims -> guaranteed cache miss
        w = 300 + int(time.time() * 1000) % 500
        t0 = time.perf_counter()
        try:
            async with s.get(
                f"{self.host}/sign?url={self.source_url}&w={w}&f=webp&q=80"
            ) as resp:
                body = await resp.json()
            async with s.get(self.host + body["signed_url"]) as resp2:
                await resp2.read()
                self.stats["uncached_image"].record(
                    time.perf_counter() - t0, resp2.status, resp2.status == 200
                )
        except Exception:
            self.stats["uncached_image"].record(
                time.perf_counter() - t0, 0, False
            )

    async def health_check(self):
        await self._get("health_check", "/health")

    async def close(self):
        if self._session is not None:
            await self._session.close()


# scenario -> weighted transactions (loadtest/src/main.rs:26-44)
SCENARIOS = {
    "ImageTransformation": [("sign_url", 3), ("fetch_image", 10), ("health_check", 1)],
    "CachePerformance": [("cached_image", 15), ("uncached_image", 5)],
}


async def user_loop(lt: LoadTest, scenario: str, stop_at: float):
    txs = []
    for name, weight in SCENARIOS[scenario]:
        txs.extend([name] * weight)
    while time.monotonic() < stop_at:
        name = random.choice(txs)
        await getattr(lt, name)()


async def main() -> int:
    ap = argparse.ArgumentParser(description="imagekit_tpu load test")
    ap.add_argument("--host", default="http://localhost:8080")
    ap.add_argument("--users", type=int, default=8)
    ap.add_argument("--duration", type=int, default=30, help="seconds")
    ap.add_argument(
        "--scenario", choices=[*SCENARIOS, "all"], default="all"
    )
    ap.add_argument(
        "--source-url",
        default="https://picsum.photos/2000/2000",
        help="remote source image (reference uses picsum 2000x2000)",
    )
    ap.add_argument("--json", action="store_true", help="JSON report")
    args = ap.parse_args()

    lt = LoadTest(args.host, args.source_url)
    stop_at = time.monotonic() + args.duration
    scenarios = list(SCENARIOS) if args.scenario == "all" else [args.scenario]
    tasks = [
        asyncio.create_task(user_loop(lt, scenarios[i % len(scenarios)], stop_at))
        for i in range(args.users)
    ]
    await asyncio.gather(*tasks)
    await lt.close()

    # -- report with the reference's target thresholds --
    total = sum(len(s.latencies) for s in lt.stats.values())
    total_err = sum(s.errors for s in lt.stats.values())
    total_shed = sum(s.shed for s in lt.stats.values())
    err_rate = total_err / total * 100 if total else 0.0
    report = {
        "duration_s": args.duration,
        "users": args.users,
        "total_requests": total,
        "rps": round(total / args.duration, 1),
        "error_rate_percent": round(err_rate, 2),
        "error_rate_target_met": err_rate < 1.0,
        "shed_429": total_shed,
        "transactions": {},
    }
    for name, s in sorted(lt.stats.items()):
        report["transactions"][name] = {
            "count": len(s.latencies),
            "errors": s.errors,
            "shed": s.shed,
            "p50_ms": round(s.percentile(0.50) * 1000, 1),
            "p95_ms": round(s.percentile(0.95) * 1000, 1),
            "statuses": dict(s.by_status),
        }
    if args.json:
        print(json.dumps(report, indent=2))
    else:
        print(f"\n=== load test: {total} reqs, {report['rps']} rps, "
              f"{err_rate:.2f}% errors, {total_shed} shed (429) ===")
        for name, tx in report["transactions"].items():
            print(
                f"  {name:16s} n={tx['count']:<6d} p50={tx['p50_ms']:>7.1f}ms "
                f"p95={tx['p95_ms']:>7.1f}ms errors={tx['errors']} "
                f"shed={tx['shed']}"
            )
        cached = lt.stats.get("cached_image")
        if cached and cached.latencies:
            ok = cached.percentile(0.95) * 1000 < 50
            print(f"  cached p95 target (<50ms): {'MET' if ok else 'MISSED'}")
    return 0 if err_rate < 1.0 else 1


if __name__ == "__main__":
    sys.exit(asyncio.run(main()))
