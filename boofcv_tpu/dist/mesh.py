"""Device-mesh construction helpers.

The framework uses one canonical data-parallel axis name, ``"shard"``, for
fan-out over points (BA), image pairs (matching), and RANSAC hypothesis
banks.  Multi-host initialization goes through jax.distributed upstream of
these helpers.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

SHARD_AXIS = "shard"


def device_count() -> int:
    return jax.device_count()


def make_mesh(n_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    """1D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
