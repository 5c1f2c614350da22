"""Multi-host (pod-slice) initialization and fleet orchestration.

The reference's only "distribution" is a ROS process graph on one machine
(SURVEY.md §2.3/§5.8). Here a scenario fleet spans a TPU pod slice:
every host runs this same program, `jax.distributed.initialize` stitches
the processes, and the `scenario` mesh axis spans all chips — shard_map
then places per-chip shards, ICI carries the telemetry collectives
(psum/pmax in parallel/mesh.py), and DCN is touched only by host-side
checkpoint/telemetry IO.

Single-process (CPU/1-chip) runs work unchanged: `ensure_initialized` is a
no-op when no coordinator is configured.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def ensure_initialized(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    Resolution order: explicit args → JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars → TPU metadata
    autodetection (args all None on Cloud TPU pods). Returns True if
    distributed mode is active."""
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or _env_int("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")
    if coord is None and nproc is None:
        return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=nproc,
        process_id=pid,
    )
    return True


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def fleet_info() -> dict:
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def local_batch_slice(global_batch: int) -> slice:
    """The contiguous slice of a global scenario batch owned by this
    process (leading-axis sharding convention of parallel/mesh.py)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def shard_global_batch(mesh, tree, axis: str = "scenario"):
    """Build globally-sharded arrays from each process's local slice of a
    batched pytree. Single-process: plain device_put (shard_batch
    semantics). Multi-process: every process passes ITS slice (see
    `local_batch_slice`) of the global batch and receives a global jax
    Array whose addressable shards are local — the standard multi-host
    data-loading idiom (each host feeds its own scenarios; no host ever
    materializes the full fleet)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
    import numpy as np

    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)
        ),
        tree,
    )
