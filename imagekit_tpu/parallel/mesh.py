"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    space: int = 1,
    axis_names: Tuple[str, str] = (DATA_AXIS, SPACE_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, space) mesh over the first ``n_devices`` devices.

    ``space`` > 1 dedicates an axis to spatial tiling of oversized images;
    the default keeps all devices on the batch (data-parallel serving).
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % space != 0:
        raise ValueError(f"{n} devices not divisible by space={space}")
    grid = np.array(devices[:n]).reshape(n // space, space)
    return Mesh(grid, axis_names)


_default_mesh: Optional[Mesh] = None


def get_mesh() -> Mesh:
    """Process-default mesh (all local devices, data-parallel)."""
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = make_mesh()
    return _default_mesh
