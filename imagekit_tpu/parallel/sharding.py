"""Sharded batched resampling.

Data parallelism: the batch axis of images *and* their per-image weight
matrices shard across the ``data`` mesh axis; the resample is then
embarrassingly parallel and XLA inserts no collectives.

Spatial parallelism: the image-height axis shards across the ``space``
mesh axis. The vertical pass is a contraction over H, so XLA lowers the
sharded einsum to partial matmuls + an all-reduce (psum) over ``space`` —
the collective rides ICI, and no hand-written halo exchange is needed
because resampling-as-matmul makes the halo implicit in the contraction
(SURVEY.md §5.7: "blockwise separable resampling").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagekit_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS
from imagekit_tpu.utils.precision import MATMUL_PRECISION


def shard_batch(arr, mesh: Mesh, *, spatial: bool = False):
    """Place an NHWC batch (or per-image weight stack) onto the mesh:
    batch axis over ``data``; optionally H over ``space``."""
    if arr.ndim == 4:  # images: (B, H, W, C)
        spec = P(DATA_AXIS, SPACE_AXIS if spatial else None, None, None)
    elif arr.ndim == 3:  # weights: (B, out, in)
        spec = P(DATA_AXIS, None, SPACE_AXIS if spatial else None)
    else:
        spec = P(DATA_AXIS)
    return jax.device_put(arr, NamedSharding(mesh, spec))


@functools.partial(jax.jit, static_argnames=("spatial",))
def _sharded_resample_impl(imgs, wv, wh, spatial: bool = False):
    x = imgs.astype(jnp.float32)
    # vertical pass: contraction over H. When H is sharded over `space`,
    # XLA emits partial matmuls + psum over that axis.
    x = jnp.einsum("boh,bhwc->bowc", wv, x, precision=MATMUL_PRECISION)
    x = jnp.einsum("bpw,bowc->bopc", wh, x, precision=MATMUL_PRECISION)
    x = jnp.clip(x, 0.0, 255.0)
    return jnp.floor(x + 0.5).astype(jnp.uint8)


def sharded_resample(
    imgs: np.ndarray,
    wv: np.ndarray,
    wh: np.ndarray,
    mesh: Optional[Mesh] = None,
    *,
    spatial: bool = False,
) -> jax.Array:
    """Resample a bucket-shaped batch across the mesh.

    ``spatial=True`` additionally shards image height over the ``space``
    axis (for batches of oversized images).
    """
    if mesh is None:
        from imagekit_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
    imgs_s = shard_batch(np.asarray(imgs), mesh, spatial=spatial)
    wv_s = jax.device_put(
        np.asarray(wv),
        NamedSharding(mesh, P(DATA_AXIS, None, SPACE_AXIS if spatial else None)),
    )
    wh_s = jax.device_put(np.asarray(wh), NamedSharding(mesh, P(DATA_AXIS)))
    return _sharded_resample_impl(imgs_s, wv_s, wh_s, spatial=spatial)
