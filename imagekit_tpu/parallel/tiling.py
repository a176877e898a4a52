"""Spatially-tiled resampling for oversized images.

The reference caps inputs at 8 MB and has no partitioning story
(SURVEY.md §5.7); here, images beyond the bucket ladder resize by sharding
the image-height axis across the mesh's ``space`` devices. Because the
resample is a matmul, the "halo exchange" of classic tiled convolution is
implicit: the vertical pass is a sharded contraction and XLA inserts the
psum over ICI (SURVEY.md §5.8). On a single device this degrades to the
plain jitted resample.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from imagekit_tpu.ops.resize import resample_weights, resize_batch
from imagekit_tpu.parallel.mesh import make_mesh
from imagekit_tpu.parallel.sharding import sharded_resample


def resize_oversized(
    img: np.ndarray,
    out_h: int,
    out_w: int,
    mesh: Optional[Mesh] = None,
    filter_name: str = "lanczos3",
) -> np.ndarray:
    """HWC u8 -> (out_h, out_w, C) u8 for images beyond the bucket ladder.

    With multiple devices, height shards over the ``space`` axis; with one
    device the plain single-device path runs.
    """
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None]
    n_dev = len(jax.devices()) if mesh is None else mesh.devices.size
    if n_dev <= 1:
        return np.asarray(resize_batch(img[None], out_h, out_w, filter_name))[0]

    if mesh is None:
        space = n_dev if n_dev <= 4 else 4
        mesh = make_mesh(space, space=space)
    space = mesh.devices.shape[1] if mesh.devices.ndim > 1 else 1

    # pad H so it splits evenly across the space axis; padded rows carry
    # zero weight columns, so they contribute nothing
    hp = (h + space - 1) // space * space
    padded = np.zeros((1, hp, w, img.shape[2]), img.dtype)
    padded[0, :h] = img
    wv = np.zeros((1, out_h, hp), np.float32)
    wv[0, :, :h] = resample_weights(h, out_h, filter_name)
    wh = resample_weights(w, out_w, filter_name)[None]
    out = np.asarray(
        sharded_resample(padded, wv, wh, mesh, spatial=True)
    )
    return out[0]
