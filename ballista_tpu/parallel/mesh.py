"""Device mesh helpers.

Reference parity: Ballista's executor fleet + `ballista.shuffle.partitions`
(default 16, `core/src/config.rs:31`). On TPU a "partition" is a mesh shard:
one chip (or one shard of a multi-chip mesh) owns one table partition, and
the shuffle is an ICI collective instead of Flight-over-gRPC files.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

PARTITION_AXIS = "p"


def partition_axis() -> str:
    return PARTITION_AXIS


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (PARTITION_AXIS,))
