"""Mesh/sharding tests on the virtual 8-device CPU platform
(SURVEY.md §4: distributed tests without a cluster)."""

import jax
import numpy as np
import pytest

from imagekit_tpu.ops.resize import padded_weights, resample_reference
from imagekit_tpu.parallel.mesh import make_mesh
from imagekit_tpu.parallel.sharding import sharded_resample
from tests.conftest import cpu_devices, make_test_image


def _batch_and_weights(batch, h, w, oh, ow, bh, bw, obh, obw):
    imgs = np.zeros((batch, bh, bw, 3), np.uint8)
    srcs = []
    for i in range(batch):
        img = make_test_image(w, h)
        srcs.append(img)
        imgs[i, :h, :w] = img
    wv = np.stack([padded_weights(h, oh, bh, obh)] * batch)
    wh = np.stack([padded_weights(w, ow, bw, obw)] * batch)
    return imgs, wv, wh, srcs


def test_eight_virtual_devices_present():
    assert len(cpu_devices()) == 8


def test_data_parallel_resample_matches_golden():
    mesh = make_mesh(8, devices=cpu_devices())
    imgs, wv, wh, srcs = _batch_and_weights(8, 96, 120, 48, 64, 128, 128, 64, 64)
    out = np.asarray(sharded_resample(imgs, wv, wh, mesh))
    for i, src in enumerate(srcs):
        want = resample_reference(src, 48, 64)
        got = out[i, :48, :64]
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_spatial_sharding_matches_golden():
    """H sharded over `space`: XLA inserts the psum; result identical."""
    mesh = make_mesh(8, space=4, devices=cpu_devices())  # 2 data x 4 space
    imgs, wv, wh, srcs = _batch_and_weights(2, 128, 120, 48, 64, 128, 128, 64, 64)
    out = np.asarray(sharded_resample(imgs, wv, wh, mesh, spatial=True))
    for i, src in enumerate(srcs):
        want = resample_reference(src, 48, 64)
        got = out[i, :48, :64]
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(8, space=3, devices=cpu_devices())
    with pytest.raises(ValueError):
        make_mesh(1000)


def test_oversized_spatial_tiling():
    """Images beyond the bucket ladder resize via height sharding over the
    space axis; result matches the golden sampler."""
    from imagekit_tpu.parallel.tiling import resize_oversized

    img = make_test_image(120, 900)
    mesh = make_mesh(4, space=4, devices=cpu_devices()[:4])
    out = resize_oversized(img, 90, 12, mesh=mesh)
    want = resample_reference(img, 90, 12)
    assert out.shape == want.shape
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1
