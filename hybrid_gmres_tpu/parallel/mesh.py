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
