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


def make_mesh_from_config(mesh_cfg, devices=None) -> Mesh:
    """Mesh from a config mapping, e.g. ``{"data": 4, "model": 2}``.

    A value of -1 (or "auto") on exactly one axis absorbs the remaining
    devices. ``None``/empty -> 1-D all-``data`` mesh.
    """
    devices = devices if devices is not None else jax.devices()
    if not mesh_cfg:
        return make_mesh(devices=devices)
    names, sizes = [], []
    auto_idx = None
    for k, v in mesh_cfg.items():
        names.append(str(k))
        if v in (-1, "auto", None):
            if auto_idx is not None:
                raise ValueError("only one mesh axis may be auto")
            auto_idx = len(sizes)
            sizes.append(-1)
        else:
            sizes.append(int(v))
    fixed = int(np.prod([s for s in sizes if s > 0]))
    if auto_idx is not None:
        sizes[auto_idx] = len(devices) // max(fixed, 1)
    total = int(np.prod(sizes))
    if total > len(devices) or total < 1:
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {total} devices, "
            f"have {len(devices)}"
        )
    return make_mesh(tuple(names), tuple(sizes), devices=devices[:total])


def default_partition_rule(mesh: Mesh):
    """Parameter partition rule for the DR-SPAAM family on a
    ``(data, model)`` mesh (Megatron-style, XLA inserts the collectives):

    * spatial-attention ``embed`` dense: column-parallel (output 128 split
      over ``model``); the banded-similarity contraction over the embedding
      dim becomes a psum,
    * head ``block3/ConvBlock_2`` (256->512, the widest conv): column-
      parallel, with its BN/bias vectors sharded to match,
    * head ``block4/ConvBlock_0`` (512->256): row-parallel — pairs with the
      previous rule so the 512-channel activation never gathers.

    Everything else (and every leaf on a mesh without a ``model`` axis) is
    replicated. Returns ``rule(path, leaf) -> NamedSharding``.
    """
    rep = NamedSharding(mesh, P())
    has_model = "model" in mesh.axis_names and mesh.shape["model"] > 1

    def rule(path, leaf):
        if not has_model or not hasattr(leaf, "ndim"):
            return rep
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        nset = set(names)
        if "embed" in nset:
            if leaf.ndim == 2:
                return NamedSharding(mesh, P(None, "model"))
            if leaf.ndim == 1:
                return NamedSharding(mesh, P("model"))
        if "block3" in nset and "ConvBlock_2" in nset:
            if leaf.ndim == 3:
                return NamedSharding(mesh, P(None, None, "model"))
            if leaf.ndim == 1:
                return NamedSharding(mesh, P("model"))
        if "block4" in nset and "ConvBlock_0" in nset and leaf.ndim == 3:
            return NamedSharding(mesh, P(None, "model", None))
        return rep

    return rule


def state_shardings(mesh: Mesh, state, rule=None):
    """Sharding pytree for a train state (params + optimizer mirrors follow
    the same path-based rule; optax state paths contain the param paths)."""
    rule = rule or default_partition_rule(mesh)
    return jax.tree_util.tree_map_with_path(rule, state)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a numpy batch dict onto the mesh with the batch axis sharded.

    Under multi-host, each process passes its LOCAL slice of the global
    batch (``BatchLoader(process_index=..., process_count=...)``) and the
    global array is assembled across processes; single-host this is a
    plain sharded device_put.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
