"""Multi-host initialization helpers.

On a pod slice, each host process calls ``initialize_multihost()`` before
any other JAX use; the mesh builders in ``mesh.py`` then see the global
device set and the row-partitioned layout spans hosts with collectives on
ICI (DCN only carries the jax.distributed control plane).  Single-host /
single-chip environments are a no-op so the same scripts run everywhere.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    initialization_timeout: int | None = None,
) -> bool:
    """Initialize jax.distributed if a multi-process env is configured.

    Returns True if distributed mode was initialized.  With no arguments,
    relies on cloud-TPU auto-detection (JAX reads the TPU metadata); if that
    reports a single process, nothing is done.

    The already-initialized check must NOT touch ``jax.process_count()`` /
    ``jax.devices()``: those initialize the XLA backend, after which
    ``jax.distributed.initialize`` refuses to run — probing the distributed
    client state directly keeps this callable first-thing in a worker.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already initialized
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and env_coord is None and num_processes is None:
        # no multi-host configuration present
        return False
    # A multi-host configuration WAS requested: initialization failures must
    # surface (proceeding single-host would silently compute partial results).
    kwargs = {}
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = initialization_timeout
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def local_shard_info(mesh, axis: str = "rows") -> dict:
    """Which rows of the partitioned operator this host owns (for loading
    operator shards host-locally instead of broadcasting the full matrix)."""
    p = mesh.devices.size
    idx = [d.id for d in jax.local_devices() if d in mesh.devices.flatten()]
    return {
        "mesh_size": p,
        "local_device_ids": idx,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
