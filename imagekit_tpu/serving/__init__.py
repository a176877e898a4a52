"""HTTP serving plane.

The reference's router/handlers/middleware (``src/lib.rs``) rebuilt on an
async Python server (aiohttp), feeding a TPU batching queue:

- :mod:`imagekit_tpu.serving.app`       — routes, handlers, middleware
- :mod:`imagekit_tpu.serving.metrics`   — global counters + Prometheus text
- :mod:`imagekit_tpu.serving.ratelimit` — per-IP token bucket (10 rps/30 burst)
- :mod:`imagekit_tpu.serving.engine`    — transform execution (batched TPU
  pipeline with host thread-pool codec stages)
- :mod:`imagekit_tpu.serving.batcher`   — dynamic bucketed batching
"""
