"""Device-mesh helpers.

The reference has no parallelism of any kind (SURVEY.md C14); here scaling
is first-class. The primary axis is event-data parallelism ('ev'): events
of a micro-batch are sharded across devices while the surface state is
replicated and updated consistently through GSPMD-partitioned scatters.
Spatial tiling of the sensor plane (a 2-D 'tx','ty' mesh with halo
exchange) is the planned second axis for very large sensors.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_event_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over the event axis."""
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devs)}"
            )
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=("ev",))


def event_sharding(mesh: Mesh) -> NamedSharding:
    """Packed [steps, 4, m] micro-batches sharded over the event axis."""
    return NamedSharding(mesh, P(None, None, "ev"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
