"""Context-parallel (sequence-parallel) banded spatial attention.

The DR-SPAAM gate is the only cross-cutout op in the serving cell: every
other stage (cutout encode, conv backbone, head) is per-cutout and shards
trivially on the batch. The gate's banded attention couples each cutout
to its ±window/2 neighbors only, so sharding the CUTOUT axis across
devices needs exactly a halo exchange of ``hw`` edge rows per neighbor —
the CP pattern SURVEY §2.11/§5 plans for the reference's sequence
mechanisms (banded attention over cutouts, ``dr_spaam.py:145-201``).

This module implements that: :func:`gate_step_context_parallel` runs one
gate update with ``(B, ct, D)`` tensors sharded on the cutout axis over a
mesh axis, exchanging the ±hw halo of the carried embedding and template
rows via ``jax.lax.ppermute`` (neighbor hops ride ICI; no all-gather, no
resharding). Per-shard math mirrors ``infer.fast_gate``'s band form
bit-for-bit:

* halo rows that wrap around the ring carry garbage but are masked by the
  global-validity band mask (their attention weight is exactly zero),
* the reference's edge-clamped ``sim_band`` duplicates only involve the
  global first/last cutout — which live ON the shards that need them, so
  no broadcast is required.

At the reference's 450 cutouts a single chip is faster; this exists as
the scaling mechanism for larger merged scans (multi-lidar, 10k+ beams)
and is parity-tested against the dense gate on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from planar_optical_flow_tpu.infer.fast_gate import (
    GateParams,
    _LEAKY_SLOPE,
    embed,
)


def gate_step_context_parallel(params: GateParams, x, template, z_t, mesh,
                               axis: str = "data"):
    """One gate update with the cutout axis sharded over ``mesh[axis]``.

    Args:
      params: folded gate params (``fast_gate.fold_gate_params``).
      x, template: (B, ct, D) current features / carried template,
        sharded on axis 1.
      z_t: (B, ct, Z) carried pre-activation embedding, sharded on axis 1.

    Returns (new_template, new_z, sim_band), all sharded like the inputs.
    Requires ``ct % mesh.shape[axis] == 0`` and a shard size >= hw.
    """
    n = mesh.shape[axis]
    ct = x.shape[1]
    hw = params.window_size // 2
    if ct % n:
        raise ValueError(f"ct={ct} not divisible by mesh axis size {n}")
    m = ct // n
    if m < hw:
        raise ValueError(
            f"shard size {m} smaller than half-window {hw}: halo exchange "
            "needs each neighbor to hold the full ±hw band")

    spec = P(None, axis, None)
    fn = shard_map(
        functools.partial(_gate_local, params=params, n=n, ct=ct,
                          axis=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec),
    )
    return fn(x, template, z_t)


def _halo_extend(a, hw: int, n: int, axis: str):
    """(B, m, D) -> (B, m + 2*hw, D): ring halo exchange of the edge rows.

    Row j of the result is global row ``base - hw + j``. The wrap-around
    rows on the first/last shard are globally out of range and must be
    masked by the caller (the band validity mask guarantees their
    attention weight is zero)."""
    if n == 1:
        pad = jnp.zeros_like(a[:, :hw])
        return jnp.concatenate([pad, a, pad], axis=1)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left = jax.lax.ppermute(a[:, -hw:], axis, fwd)   # left nbr's last rows
    right = jax.lax.ppermute(a[:, :hw], axis, bwd)   # right nbr's first rows
    return jnp.concatenate([left, a, right], axis=1)


def _gate_local(x_l, t_l, zt_l, *, params: GateParams, n: int, ct: int,
                axis: str):
    """Per-shard gate update on (B, m, .) blocks (see module docstring)."""
    hw = params.window_size // 2
    win = 2 * hw + 1
    m = x_l.shape[1]
    base = jax.lax.axis_index(axis) * m if n > 1 else 0

    zx = embed(params, x_l)                          # (B, m, Z) local
    ex = jnp.where(zx > 0, zx, _LEAKY_SLOPE * zx)
    zt_ext = _halo_extend(zt_l, hw, n, axis)         # (B, m+2hw, Z)
    et_ext = jnp.where(zt_ext > 0, zt_ext, _LEAKY_SLOPE * zt_ext)
    t_ext = _halo_extend(t_l, hw, n, axis)           # (B, m+2hw, D)

    # banded similarity: slot k holds offset o = k - hw
    s = jnp.stack(
        [jnp.sum(ex * et_ext[:, k:k + m], axis=-1) for k in range(win)],
        axis=-1,
    )  # (B, m, win)

    gi = base + jnp.arange(m)[:, None]               # global row index
    off = jnp.arange(-hw, hw + 1)[None, :]
    valid = ((gi + off >= 0) & (gi + off < ct))      # (m, win)
    dt = s.dtype
    masked = jnp.where(valid[None], s, jnp.asarray(-1e10, dt))
    attn = jax.nn.softmax(masked, axis=-1)
    attn = jnp.where(valid[None], attn, jnp.asarray(0, dt))
    attn = attn / jnp.maximum(attn.sum(axis=-1, keepdims=True),
                              jnp.asarray(1e-20, dt))

    # reference-clamped sim_band: out-of-range slots duplicate the
    # similarity with the global first/last cutout — those rows are local
    # to the shards where clamping can occur (interior shards never clamp)
    c0 = jnp.sum(ex * et_ext[:, hw:hw + 1], axis=-1, keepdims=True)
    c1 = jnp.sum(ex * et_ext[:, hw + m - 1:hw + m], axis=-1, keepdims=True)
    sim_band = jnp.where(valid[None], s,
                         jnp.where((gi + off)[None] < 0, c0, c1))

    def banded_mix(ext):
        out = None
        for k in range(win):
            term = attn[..., k:k + 1] * ext[:, k:k + m]
            out = term if out is None else out + term
        return out

    a = jnp.asarray(params.alpha, x_l.dtype)
    new_template = a * x_l + (1 - a) * banded_mix(t_ext)
    new_z = a * zx + (1 - a) * banded_mix(zt_ext)
    return new_template, new_z, sim_band
