"""DP scaling evidence on the virtual CPU mesh: fixed batch, 1 vs N
devices, per-device shard accounting + timing for every fused head.

Run with the test environment's virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/mesh_scaling.py

CAVEAT (stated in the committed table too): the 8 "devices" are XLA
host-platform threads on this box's ONE physical core, so wall-clock
does NOT improve with mesh width here — the table's evidentiary value
is (a) every fused head compiles AND executes under NamedSharding with
the expected per-device shard shapes, and (b) the sharded program's
total work matches the unsharded one (no replication blow-up). On real
multi-chip hardware DP is embarrassingly parallel across the batch:
per-chip work is 1/N of the batch with zero inter-chip collectives in
these heads (the only collective in the codebase is the psum in the
spatial-tiling path, exercised separately by dryrun_multichip).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from imagekit_tpu.ops.color import resample_rgb_yuv_batch  # noqa: E402
from imagekit_tpu.ops.dct import (  # noqa: E402
    pad128,
    resample_rgb_jpeg_batch,
    resize_yuv420_batch,
    resize_yuv_jpeg_batch,
)
from imagekit_tpu.ops.resize import resample_bucketed_flat  # noqa: E402
from imagekit_tpu.parallel.mesh import make_mesh  # noqa: E402

NB, BH, BW, OBH, OBW, NU = 8, 256, 256, 128, 128, 4


def _time(fn, reps=6):
    jax.block_until_ready(fn())  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def run_heads(engine):
    """Yield (head, time_ms, shards, per_shard_shape) for each fused
    head on this engine's placement (sharded when it has a mesh)."""
    put_b = engine._put_sharded if engine._mesh else jax.device_put
    put_r = engine._put_replicated if engine._mesh else jax.device_put
    ndev = engine._mesh_ndev if engine._mesh else 1

    rgb = put_b(np.zeros((NB, BH, BW * 3), np.uint8))
    vidx = put_b(np.zeros(NB, np.int32))
    qto = put_b(np.zeros((NB, 128), np.float32))
    wv = put_r(np.zeros((NU, OBH, BH), np.float32))
    wh = put_r(np.zeros((NU, OBW, BW), np.float32))
    shards = len(rgb.addressable_shards)
    pshape = rgb.addressable_shards[0].data.shape

    yield (
        "rgb",
        _time(lambda: resample_bucketed_flat(rgb, wv, wh, vidx, vidx, 3)),
        shards, pshape,
    )
    yield (
        "rgbyuv",
        _time(
            lambda: resample_rgb_yuv_batch(
                rgb, (wv, wh), vidx, vidx, (OBH, OBW)
            )
        ),
        shards, pshape,
    )
    yield (
        "rgbjpg",
        _time(
            lambda: resample_rgb_jpeg_batch(
                rgb, (wv, wh), vidx, vidx, qto, (OBH, OBW)
            )
        ),
        shards, pshape,
    )

    ny, nc = BH * BW, (BH // 2) * (BW // 2)
    flat = put_b(np.zeros((NB, pad128(ny + 2 * nc)), np.uint8))
    yweights = (
        wv, wh,
        put_r(np.zeros((NU, OBH // 2, BH // 2), np.float32)),
        put_r(np.zeros((NU, OBW // 2, BW // 2), np.float32)),
    )
    yield (
        "yuvsrc",
        _time(
            lambda: resize_yuv420_batch(
                flat, yweights, vidx, (BH, BW), (OBH, OBW)
            )
        ),
        len(flat.addressable_shards), flat.addressable_shards[0].data.shape,
    )
    yield (
        "yuvjpg",
        _time(
            lambda: resize_yuv_jpeg_batch(
                flat, yweights, qto, vidx, (BH, BW), (OBH, OBW)
            )
        ),
        len(flat.addressable_shards), flat.addressable_shards[0].data.shape,
    )


def main():
    from imagekit_tpu.config import BatchConfig, ImageKitConfig
    from imagekit_tpu.serving.batcher import BatchedEngine
    from imagekit_tpu.serving.metrics import Metrics

    devs = jax.devices("cpu")
    print(f"virtual devices: {len(devs)} ({devs[0].platform})")
    cfg = ImageKitConfig(secret="s", batch=BatchConfig(max_batch=NB))

    rows = {}
    for ndev in (1, len(devs)):
        mesh = make_mesh(ndev, devices=devs[:ndev]) if ndev > 1 else None
        engine = BatchedEngine(cfg, metrics=Metrics(), mesh=mesh)
        for head, ms, shards, pshape in run_heads(engine):
            rows.setdefault(head, {})[ndev] = (ms, shards, pshape)

    n = len(devs)
    print(f"\n| head | 1-dev ms/batch | {n}-dev ms/batch | shards | per-device shard |")
    print("|---|---|---|---|---|")
    for head, r in rows.items():
        ms1, _, _ = r[1]
        msn, shards, pshape = r[n]
        print(
            f"| {head} | {ms1:.1f} | {msn:.1f} | {shards} |"
            f" {tuple(pshape)} |"
        )


if __name__ == "__main__":
    main()
