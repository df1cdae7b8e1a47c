"""Device mesh construction.

One flat data axis "d" covers hosts x chips for the join workloads (the
partitioning shuffle is a single all-to-all over every device; ICI within a
host/slice, DCN across).  Helper keeps CPU test meshes
(xla_force_host_platform_device_count) and real TPU slices uniform.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "d"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def sharded(mesh: Mesh):
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
