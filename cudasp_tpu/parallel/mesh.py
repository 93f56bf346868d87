"""Device mesh + sharding layout for data-parallel scanning.

The workload is row-parallel (SURVEY.md §2.4): the mesh has a single
'data' axis; batch-last limb planes shard on their lane axis, per-row
metadata shards on its leading axis, per-query operands replicate. This
replaces the reference's thread->GPU round-robin pinning
(/root/reference/src/cudasp_extension.cu:149-151,523-529) — XLA GSPMD
partitions one program over the mesh instead of N host threads driving N
devices independently.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


class BatchShardings:
    """Named shardings for each array role in a packed batch."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.limbs = NamedSharding(mesh, P(None, DATA_AXIS))   # (NLIMBS, B)
        self.rows = NamedSharding(mesh, P(DATA_AXIS))          # (B,)
        self.row_major = NamedSharding(mesh, P(DATA_AXIS, None))  # (B, M)
        self.replicated = NamedSharding(mesh, P())

    def put_batch(self, b):
        """PackedBatch -> device arrays laid out over the mesh."""
        return (
            jax.device_put(b.tweak_x, self.limbs),
            jax.device_put(b.tweak_y, self.limbs),
            jax.device_put(b.row_valid, self.rows),
            jax.device_put(b.outputs_hi, self.row_major),
            jax.device_put(b.outputs_lo, self.row_major),
            jax.device_put(b.outputs_valid, self.row_major),
        )

    def put_query(self, windows, spend_x, spend_y, label_x, label_y):
        r = self.replicated
        return tuple(jax.device_put(a, r)
                     for a in (windows, spend_x, spend_y, label_x, label_y))
