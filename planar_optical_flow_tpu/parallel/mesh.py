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


def make_hybrid_mesh(dcn_size: int, ici_axes: dict, devices=None) -> Mesh:
    """Hybrid ICI x DCN mesh (SURVEY §2.11 "mesh over ICI and DCN").

    The ``dcn`` axis is the OUTERMOST (slowest-varying) axis and spans
    slices — device groups connected only over the data-center network —
    while the ``ici_axes`` (e.g. ``{"data": 4}`` or ``{"data": 2,
    "model": 2}``) lay out WITHIN a slice, so collectives along any
    non-dcn axis ride ICI. Gradient all-reduce over ``("dcn", "data")``
    lowers to the hierarchical form (reduce within the slice first, the
    small residual across DCN) — the partitioner picks this up from the
    axis order; nothing else is needed.

    Devices are ordered slice-major (``slice_index`` where the backend
    reports one — real multi-slice TPU — else process, then id), and a
    dcn group must contain whole processes (checked when
    multi-process; on a single process the grouping is whatever the
    virtual device order gives, which is what the CPU-mesh tests use).
    """
    devices = list(devices) if devices is not None else jax.devices()
    devices.sort(key=lambda d: (getattr(d, "slice_index", 0) or 0,
                                d.process_index, d.id))
    names = ("dcn",) + tuple(str(k) for k in ici_axes)
    sizes = (int(dcn_size),) + tuple(int(v) for v in ici_axes.values())
    total = int(np.prod(sizes))
    if total > len(devices) or total < 1 or min(sizes) < 1:
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {total} devices, "
            f"have {len(devices)}"
        )
    per = total // int(dcn_size)
    if total < len(devices) and len(devices) % int(dcn_size) == 0:
        # partial mesh: take each dcn group's devices from its own
        # slice-major block (a flat prefix would pull every group from
        # the first slice and spuriously fail the split check below —
        # e.g. {dcn: 2, data: 2} on 2 processes x 4 devices must use 2
        # devices from EACH process, not 4 from process 0)
        span = len(devices) // int(dcn_size)
        devices = [d for i in range(int(dcn_size))
                   for d in devices[i * span:i * span + per]]
    else:
        devices = devices[:total]
    if jax.process_count() > 1:
        groups = [
            {d.process_index for d in devices[i * per:(i + 1) * per]}
            for i in range(int(dcn_size))
        ]
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                if groups[i] & groups[j]:
                    raise ValueError(
                        f"dcn axis of {dcn_size} splits a process "
                        f"across slices (groups {groups}) — dcn must "
                        "divide along process/slice boundaries"
                    )
    arr = np.asarray(devices, dtype=object).reshape(sizes)
    return Mesh(arr, names)


def make_mesh_from_config(mesh_cfg, devices=None) -> Mesh:
    """Mesh from a config mapping, e.g. ``{"data": 4, "model": 2}``.

    A value of -1 (or "auto") on exactly one axis absorbs the remaining
    devices. ``None``/empty -> 1-D all-``data`` mesh. A ``dcn`` axis
    (any position in the mapping) selects the hybrid ICI x DCN layout —
    ``dcn`` outermost over slice-major-ordered devices, the other axes
    within a slice (:func:`make_hybrid_mesh`).
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
    if "dcn" in names:
        dcn = sizes[names.index("dcn")]
        ici = {n: s for n, s in zip(names, sizes) if n != "dcn"}
        return make_hybrid_mesh(dcn, ici, devices=devices)
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
    """Shard the leading (batch) dimension over ``axis``.

    On a hybrid mesh the batch spans ``(dcn, axis)`` jointly (outer
    slices each take a contiguous block; rows within a block spread over
    the slice's ici axis) — the gradient psum over both axes then lowers
    hierarchically."""
    if "dcn" in mesh.axis_names:
        axes = ("dcn",) + ((axis,) if axis in mesh.axis_names else ())
        return NamedSharding(mesh, P(axes))
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_global(batch, sharding):
    """Place a host batch pytree under ``sharding``; multi-host safe.

    Under multi-host, plain ``device_put`` cannot build a global array
    from per-process data — ``jax.make_array_from_process_local_data``
    assembles it from what each process holds (its batch slice for a
    sharded placement; the identical full batch for a replicated one).
    """
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a numpy batch dict onto the mesh with the batch axis sharded.

    Under multi-host, each process passes its LOCAL slice of the global
    batch (``BatchLoader(process_index=..., process_count=...)``) and the
    global array is assembled across processes; single-host this is a
    plain sharded device_put.
    """
    return _put_global(batch, batch_sharding(mesh, axis))


def replicate_batch(batch, mesh: Mesh):
    """Place a numpy batch dict replicated over the mesh (pure-pipe
    meshes: the batch stays whole and ``pipeline_apply``'s internal
    shard_map distributes microbatches). Uses the same multi-host-safe
    mechanism as :func:`shard_batch` — under multi-host every process
    passes the identical full batch."""
    return _put_global(batch, replicated_sharding(mesh))
