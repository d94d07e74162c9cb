"""Device-mesh helpers.

The reference's only parallelism is one GPU process per worker plus a
filesystem merge (reference: exp_mnist_resnet/run.bash:27-43).  Here the
equivalent unit is a ``jax.sharding.Mesh``: Gram tiles are swept by
``shard_map`` over a 1-D tile axis, and the solve shards Gram rows over the
same axis with GSPMD inserting the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "TILE_AXIS", "replicated", "row_sharded"]

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = TILE_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}; on CPU set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def row_sharded(mesh: Mesh, axis_name: str = TILE_AXIS) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis_name))
