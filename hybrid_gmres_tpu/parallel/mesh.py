"""Device-mesh construction for row/column-partitioned operators.

The reference has no parallelism of any kind (SURVEY.md §2.4); this layer is
the TPU-native scaling design: a named `jax.sharding.Mesh` over which the
projector pair (A, B) is partitioned so that every composed matvec needs a
single fused `psum` riding ICI, and the Krylov basis stays sharded.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "rows") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def make_mesh_2d(shape: tuple[int, int], axis_names=("rows", "cols")) -> Mesh:
    """2-D mesh (rows x cols) for SUMMA-style operator partitioning."""
    devs = jax.devices()
    need = shape[0] * shape[1]
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    arr = np.array(devs[:need]).reshape(shape)
    return Mesh(arr, axis_names)


def make_replica_meshes(n_replicas: int,
                        axis_name: str = "rows") -> list[Mesh]:
    """Split the available devices into ``n_replicas`` disjoint 1-D
    sub-meshes — a data-parallel serving fleet.

    Each replica runs an INDEPENDENT sharded solve (any solver in this
    package) on its own device subset; no collective crosses replicas, so
    fleet throughput scales linearly in replicas while each solve keeps
    the intra-replica panel sharding.  This is the replica-level
    composition of batching with sharding (FEATURES.md): R frames per
    replica via the sharded batched solvers x ``n_replicas`` replicas.
    Build the panels once per replica shape (``p = devices/replicas``)."""
    devs = jax.devices()
    if n_replicas <= 0 or len(devs) % n_replicas:
        raise ValueError(
            f"{len(devs)} devices cannot split into {n_replicas} replicas")
    per = len(devs) // n_replicas
    return [Mesh(np.array(devs[i * per:(i + 1) * per]), (axis_name,))
            for i in range(n_replicas)]
