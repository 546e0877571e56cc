"""Device mesh construction for data-parallel counting.

The only communication surface of the pipeline (SURVEY.md section 5):
sequences shard over a 1-D 'data' axis, per-shard count tables / bg
counts / scalars all-reduce once, everything downstream is
table-replicated and communication-free.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_data_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))
