"""Mesh construction and sharding rules.

The reference has no distributed training at all (SURVEY §2.11); scaling here
is first-class: a 1-D ``("data",)`` mesh shards the batch axis over all chips
(ICI), parameters/optimizer state are replicated, and XLA inserts the psum
for the gradient all-reduce from the sharded-jit data flow. The mesh API is
axis-generic so tensor/context axes can be added without changing call
sites (e.g. ``make_mesh(("data", "model"), (n, m))``).

Multi-host: ``initialize_distributed()`` wires ``jax.distributed``; data
loading stays per-host (each host feeds its local shard of the global batch
via ``shard_batch``).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Initialize multi-host JAX when launched across hosts; no-op when
    single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(axis_names=("data",), axis_sizes=None, devices=None) -> Mesh:
    """Build a mesh over the available devices.

    With the default 1-D spec, all devices land on the ``data`` axis.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = [1] * (len(axis_names) - 1) + [len(devices)]
        axis_sizes = tuple(axis_sizes[-len(axis_names):])
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a numpy batch dict onto the mesh with the batch axis sharded.

    Under multi-host, each process passes its local slice; single-host this
    is a plain sharded device_put.
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
