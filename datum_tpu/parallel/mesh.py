"""Device mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_device_mesh(n_devices: int | None = None, axis_name: str = "tiles") -> Mesh:
    """1-D mesh over the first n devices; axis 'tiles' shards framebuffer
    tile-rows."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis_name,))
