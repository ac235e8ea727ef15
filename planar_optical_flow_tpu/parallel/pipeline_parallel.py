"""Pipeline parallelism (GPipe wavefront) over a mesh axis.

Completes the parallelism axes from SURVEY §2.11 alongside data
(``mesh.py``), tensor (``default_partition_rule``) and context
(``context_parallel.py``) parallelism: :func:`pipeline_apply` runs a
chain of heterogeneous stage functions as a GPipe schedule over the
devices of one mesh axis — microbatches enter stage 0, flow device to
device via ``jax.lax.ppermute`` (one neighbor hop per tick, riding ICI),
and every device computes a different stage of the model each tick.

Design notes (TPU/XLA-first, no reference counterpart — the reference
has no distributed execution at all):

* The schedule is a single ``lax.scan`` over ``M + n_stages - 1`` ticks
  — traced once, no Python-level step loop, fully jittable and
  differentiable (``jax.grad`` through the scan + ppermute yields the
  reverse-order backward wavefront automatically; the transpose of the
  forward ppermute is the activation-grad ppermute backwards).
* Stages are HETEROGENEOUS: inter-stage activations are packed into one
  fixed ``(microbatch, max_flat)`` buffer (per-stage pytrees are
  flattened, concatenated and zero-padded), because a single SPMD
  ``ppermute`` needs a uniform shape on every device. Shapes are
  resolved once with ``jax.eval_shape``; the padding is dead lanes, not
  dead compute.
* Stage dispatch is ``lax.switch`` on ``lax.axis_index`` — every device
  traces all stages once but executes only its own; gradients for the
  untaken branches are structural zeros, so after the closing ``psum``
  each stage's parameter gradients are exactly the sequential ones.
* What this buys at this repo's model sizes: the detector train step is
  activation-bound (``experiments/probe_train_batch_scaling.py``: OOM at
  batch 64) — pipelining shards the live activations over stages while
  parameters (sub-MB here) stay replicated. At transformer scale the
  same schedule would shard parameters per stage; the mechanism is
  identical.

The bubble fraction is the textbook ``(n_stages - 1) / (M + n_stages
- 1)``; callers pick ``n_microbatches`` >= ``n_stages`` to amortize it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P


def _leaf_shapes(tree):
    """(treedef, per-leaf trailing shapes, dtype) for a (mb, ...) pytree."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = tuple(tuple(l.shape[1:]) for l in leaves)
    dtypes = {jnp.dtype(l.dtype) for l in leaves}
    if len(dtypes) != 1:
        raise ValueError(
            f"pipeline stages must exchange a single dtype, got {dtypes}"
        )
    return treedef, shapes, dtypes.pop()


def _flat_size(shapes) -> int:
    return sum(int(math.prod(s)) for s in shapes)


def _pack(tree, mb: int, max_flat: int):
    """Flatten a (mb, ...) pytree into one zero-padded (mb, max_flat) row."""
    leaves = jax.tree_util.tree_leaves(tree)
    flat = jnp.concatenate([l.reshape(mb, -1) for l in leaves], axis=1)
    return jnp.pad(flat, ((0, 0), (0, max_flat - flat.shape[1])))


def _unpack(buf, mb: int, treedef, shapes):
    parts, off = [], 0
    for s in shapes:
        n = int(math.prod(s))
        parts.append(buf[:, off:off + n].reshape((mb,) + s))
        off += n
    return jax.tree_util.tree_unflatten(treedef, parts)


def pipeline_apply(stage_fns, stage_params, x, mesh, axis: str = "pipe",
                   n_microbatches: int | None = None, stage_state=None,
                   data_axis: str = "data"):
    """Apply ``stage_fns[n-1](p[n-1], ... stage_fns[0](p[0], x))`` as a
    GPipe wavefront over ``mesh.shape[axis]`` devices.

    Args:
      stage_fns: one callable per device on the axis; stage ``i`` maps
        ``(stage_params[i], activations_i) -> activations_{i+1}``. Inputs
        and outputs are pytrees of arrays with a leading microbatch dim;
        shapes may differ per stage (packed into a uniform transfer
        buffer internally).
      stage_params: sequence of per-stage parameter pytrees (replicated
        to every device; only stage ``i``'s device reads entry ``i``).
      x: input pytree with leading batch dim ``B``; split into
        ``n_microbatches`` equal microbatches along axis 0.
      mesh: a ``jax.sharding.Mesh`` containing ``axis``.
      n_microbatches: defaults to ``mesh.shape[axis]``; must divide ``B``.
      stage_state: optional sequence of per-stage STATE pytrees (e.g.
        BatchNorm running statistics). When given, stage ``i`` maps
        ``(stage_params[i], state_i, activations_i) -> (activations_{i+1},
        new_state_i)`` and the state threads through that stage's
        microbatches IN ORDER — each device carries its own stage's state
        through the tick scan, exactly reproducing a sequential
        microbatched loop's update chain (EMA updates included). The
        state never enters the inter-stage transfer buffer (any dtype,
        any pytree).
      data_axis: when the mesh ALSO has this axis (size > 1), the
        pipeline composes with data parallelism: every microbatch's rows
        are sharded over ``data_axis`` (each data shard runs its own
        wavefront over its row slice; ppermute hops stay within a data
        shard's pipe ring), outputs come back batch-sharded, and the
        per-stage states are ``pmean``-ed over the data shards — the dp
        analogue of GSPMD's global batch stats, stated: under dp x pp
        the ghost "batch" is a microbatch's PER-SHARD row slice, and
        running stats average the shards' chains.

    Returns the last stage's output pytree with leading dim ``B``, or
    ``(output, new_stage_states)`` when ``stage_state`` is given (each
    final state replicated to all devices). Each microbatch runs the
    exact sequential stage chain — the schedule adds no re-association;
    the only numeric delta vs the unstaged forward is XLA lowering
    smaller per-microbatch matmuls differently (1-ulp).
    """
    n = int(mesh.shape[axis])
    stage_fns = tuple(stage_fns)
    stage_params = tuple(stage_params)
    if len(stage_fns) != n:
        raise ValueError(
            f"{len(stage_fns)} stages but mesh axis {axis!r} has {n} devices"
        )
    if len(stage_params) != n:
        raise ValueError(
            f"{len(stage_params)} param trees for {n} stages"
        )
    with_state = stage_state is not None
    if with_state:
        stage_state = tuple(stage_state)
        if len(stage_state) != n:
            raise ValueError(
                f"{len(stage_state)} state trees for {n} stages"
            )
        fns = stage_fns
    else:
        # uniform internal form: every stage threads an (empty) state
        stage_state = ({},) * n
        fns = tuple(
            (lambda f: lambda p, s, xx: (f(p, xx), s))(f) for f in stage_fns
        )
    batch = jax.tree_util.tree_leaves(x)[0].shape[0]
    m = n if n_microbatches is None else int(n_microbatches)
    if batch % m:
        raise ValueError(f"batch {batch} not divisible by {m} microbatches")
    mb = batch // m
    n_data = (int(mesh.shape[data_axis])
              if data_axis in mesh.axis_names else 1)
    if mb % n_data:
        raise ValueError(
            f"microbatch rows {mb} (batch {batch} / {m} microbatches) not "
            f"divisible by the {data_axis} axis size {n_data}")
    mb_local = mb // n_data

    # microbatch the input: every leaf (B, ...) -> (M, mb, ...)
    x_mb = jax.tree_util.tree_map(
        lambda l: l.reshape((m, mb) + l.shape[1:]), x
    )

    # resolve the per-stage IO structure once, abstractly
    io = []  # per stage: (in_treedef, in_shapes, out_treedef, out_shapes)
    cur = jax.eval_shape(
        lambda t: jax.tree_util.tree_map(lambda l: l[0], t), x_mb
    )
    dtype = None
    for fn, p, s in zip(fns, stage_params, stage_state):
        in_td, in_sh, in_dt = _leaf_shapes(cur)
        cur, s_shape = jax.eval_shape(fn, p, s, cur)
        out_td, out_sh, out_dt = _leaf_shapes(cur)
        s_td = jax.tree_util.tree_structure(s)
        if jax.tree_util.tree_structure(s_shape) != s_td:
            raise ValueError(
                "pipeline stage must return its state with an unchanged "
                f"tree structure (got {jax.tree_util.tree_structure(s_shape)}"
                f" vs {s_td})"
            )
        if dtype is None:
            dtype = in_dt
        if in_dt != dtype or out_dt != dtype:
            raise ValueError(
                f"pipeline stages must exchange a single dtype, got "
                f"{in_dt}/{out_dt} vs {dtype}"
            )
        io.append((in_td, in_sh, out_td, out_sh))
    max_flat = max(
        max(_flat_size(s[1]), _flat_size(s[3])) for s in io
    )
    out_treedef, out_shapes = io[-1][2], io[-1][3]

    def stage_branch(i, params_tuple, states_tuple, buf):
        in_td, in_sh, _, _ = io[i]
        rows = buf.shape[0]  # mb_local under dp, mb otherwise
        xin = _unpack(buf[:, :_flat_size(in_sh)], rows, in_td, in_sh)
        y, new_si = fns[i](params_tuple[i], states_tuple[i], xin)
        new_states = (states_tuple[:i] + (new_si,)
                      + states_tuple[i + 1:])
        return _pack(y, rows, max_flat), new_states

    branches = tuple(
        functools.partial(stage_branch, i) for i in range(n)
    )
    fwd_perm = [(i, i + 1) for i in range(n - 1)]

    def spmd(params_tuple, states_tuple, x_mb):
        d = lax.axis_index(axis)
        # pack the input feed ONCE, outside the tick scan (per-tick
        # packing would re-run the concat+pad n*(M+n-1) times fleet-wide)
        x_leaves = jax.tree_util.tree_leaves(x_mb)
        rows = x_leaves[0].shape[1]  # mb_local under dp
        x_flat = jnp.concatenate(
            [l.reshape(m, rows, -1) for l in x_leaves], axis=2)
        x_packed = jnp.pad(
            x_flat, ((0, 0), (0, 0), (0, max_flat - x_flat.shape[2])))

        def tick(carry, t):
            buf, states = carry
            mb_idx = t - d
            active = (mb_idx >= 0) & (mb_idx < m)
            # stage 0 injects its microbatch from the input feed; every
            # other stage consumes the buffer ppermuted in last tick
            x0 = x_packed[jnp.clip(mb_idx, 0, m - 1)]
            inbuf = jnp.where(d == 0, x0, buf)
            out, new_states = lax.switch(
                d, branches, params_tuple, states, inbuf
            )
            out = jnp.where(active, out, jnp.zeros_like(out))
            # bubble ticks must not advance the state chain
            new_states = jax.tree_util.tree_map(
                lambda nl, ol: jnp.where(active, nl, ol),
                new_states, states,
            )
            nxt = (
                lax.ppermute(out, axis, fwd_perm) if n > 1
                else jnp.zeros_like(out)
            )
            return (nxt, new_states), out

        buf0 = jnp.zeros((rows, max_flat), dtype)
        (_, states_fin), outs = lax.scan(
            tick, (buf0, states_tuple), jnp.arange(m + n - 1)
        )
        # on the LAST device, tick t emitted microbatch t - (n - 1);
        # zero every other device and psum so the result is replicated
        # over the pipe axis (still sharded over data, if present)
        ys = outs[n - 1:]
        ys = jnp.where(d == n - 1, ys, jnp.zeros_like(ys))
        ys = lax.psum(ys, axis)
        # slot i of the final state is authoritative only on device i
        # (other devices never ran stage i); select-and-psum replicates
        # over pipe, then pmean over data averages the shards' chains.
        # Non-floating leaves (counters, flags) cannot be meaningfully
        # averaged — and pmean would silently promote them to float —
        # so they replicate data-shard 0's value instead (every shard
        # runs the same schedule, so deterministic leaves agree anyway)
        def finalize(l, i):
            l = lax.psum(jnp.where(d == i, l, jnp.zeros_like(l)), axis)
            if n_data > 1:
                if jnp.issubdtype(l.dtype, jnp.floating):
                    l = lax.pmean(l, data_axis)
                else:
                    dd = lax.axis_index(data_axis)
                    l = lax.psum(
                        jnp.where(dd == 0, l, jnp.zeros_like(l)),
                        data_axis)
            return l

        states_out = tuple(
            jax.tree_util.tree_map(
                lambda l, i=i: finalize(l, i), states_fin[i],
            )
            for i in range(n)
        )
        return ys, states_out

    rep = P()
    # under dp the microbatch ROWS (dim 1 of every (M, mb, ...) leaf)
    # shard over the data axis; pipe stays fully replicated in the specs
    # (the wavefront's device-placement is via axis_index, not sharding)
    x_spec = P(None, data_axis) if n_data > 1 else rep
    ys, new_states = shard_map(
        spmd, mesh=mesh,
        in_specs=(rep, rep, x_spec), out_specs=(x_spec, rep),
        check_vma=False,
    )(stage_params, stage_state, x_mb)

    flat = ys.reshape(batch, max_flat)
    out = _unpack(flat[:, :_flat_size(out_shapes)], batch,
                  out_treedef, out_shapes)
    if with_state:
        return out, new_states
    return out


def drow_pipeline_stages(model, variables, train: bool = False,
                         dropout_rng=None):
    """Split the DROW/DR-SPAAM detector forward into its two natural
    pipeline stages (per-cutout backbone+temporal fusion | post-fusion
    head), each as a ``(params, x) -> y`` stage function for
    :func:`pipeline_apply`.

    The detector's only cross-cutout op (the spatial gate) sits between
    these stages in SpatialDROW; the plain DROW forward is a pure chain
    (reference ``dr_spaam.py:41-121``) and stages exactly. Both stages
    close over the full variable tree (parameters here are sub-MB;
    activations are what pipelining shards — see module docstring).

    ``train=True`` on a dropout-enabled model needs ``dropout_rng`` (each
    stage folds in its index so the two stages draw independent masks);
    without it flax would raise a missing-PRNG error mid-pipeline. In
    train mode BatchNorm normalizes by per-MICROBATCH statistics and the
    running-stat updates are discarded — the standard GPipe BN caveat
    (global batch stats would need a cross-microbatch reduction that
    defeats the wavefront). Keep ``train=False`` where exact batch-stat
    semantics matter, e.g. FlowDROW's frozen detector.
    """
    if train and getattr(model, "dropout", 0) > 0 and dropout_rng is None:
        raise ValueError(
            "drow_pipeline_stages(train=True) on a dropout-enabled model "
            "requires dropout_rng"
        )

    def _rngs(i):
        if dropout_rng is None:
            return None
        return {"dropout": jax.random.fold_in(dropout_rng, i)}

    def _apply(v, x, method, i):
        if not train:
            return model.apply(v, x, train, method=method)
        out, _ = model.apply(v, x, train, method=method, rngs=_rngs(i),
                             mutable=["batch_stats"])
        return out

    def stage_backbone(v, x):
        return _apply(
            v, x,
            lambda mdl, xx, tr: jnp.sum(
                mdl.encode_cutouts(xx, train=tr), axis=2
            ),
            0,
        )

    def stage_head(v, fused):
        return _apply(
            v, fused,
            lambda mdl, ff, tr: mdl.fused_head(ff, train=tr),
            1,
        )

    return (stage_backbone, stage_head), (variables, variables)


def drow_pipeline_train_stages(model, dropout_rng=None):
    """TRAINING stages for the DROW detector: per-cutout backbone +
    temporal fusion | post-fusion head, with BatchNorm state THREADED
    through :func:`pipeline_apply`'s ``stage_state`` so running-stat
    updates survive the wavefront.

    BN policy (stated, not accidental): under pipeline parallelism each
    microbatch normalizes by its OWN statistics — ghost-batch BN with
    ghost size = microbatch size ([Hoffer et al. 2017], standard
    practice; often a mild regularizer) — and the running-stat EMA
    advances once per microbatch in microbatch order. This is exactly
    the semantics of a sequential loop over microbatches, which is what
    the parity test pins (``tests/test_pipeline_parallel.py``). It is
    NOT bitwise the global-batch BN of the unstaged step (reference BN
    semantics at ``dr_spaam.py:49-57``); a convergence test shows the
    two train to equivalent losses. Cross-microbatch stat reductions
    would serialize the wavefront, defeating the schedule.

    Returns ``(stage_fns, split_params, split_stats, combine)`` where
    ``split_params(params) -> tuple`` / ``split_stats(stats) -> tuple``
    map a full variable collection to per-stage entries and
    ``combine(states_tuple) -> batch_stats`` reassembles the updated
    running stats. Stage fns close over nothing trainable — parameters
    flow through ``stage_params`` so ``jax.grad`` sees them.
    """
    if getattr(model, "dropout", 0) > 0 and dropout_rng is None:
        raise ValueError(
            "drow_pipeline_train_stages on a dropout-enabled model "
            "requires dropout_rng"
        )

    def _shard_index():
        # distinct dropout noise per data shard under dp x pp; on a
        # pure-pipe mesh the data axis is simply not bound
        try:
            return lax.axis_index("data")
        except Exception:  # noqa: BLE001 — unbound axis name at trace
            return jnp.int32(0)

    def _rngs(i, t):
        if dropout_rng is None:
            return {}
        # fold in stage, MICROBATCH TICK and data shard: a stage-only
        # fold would hand every microbatch (and every shard) the same
        # bernoulli mask — flax Dropout derives the mask purely from
        # the key, so the noise must be keyed per (stage, tick, shard)
        key = jax.random.fold_in(dropout_rng, i)
        key = jax.random.fold_in(key, t)
        return {"rngs": {"dropout": jax.random.fold_in(
            key, _shard_index())}}

    # stage state = (BN stats subtree, microbatch tick counter): the
    # counter rides the same threaded state that makes the EMA chain
    # sequential, giving each microbatch its own dropout key
    def stage_backbone(p, state, x):
        stats, t = state
        out, upd = model.apply(
            {"params": p, "batch_stats": {"backbone": stats}},
            x, True,
            method=lambda mdl, xx, tr: jnp.sum(
                mdl.encode_cutouts(xx, train=tr), axis=2
            ),
            mutable=["batch_stats"], **_rngs(0, t),
        )
        return out, (upd["batch_stats"]["backbone"], t + 1)

    def stage_head(p, state, fused):
        stats, t = state
        out, upd = model.apply(
            {"params": p, "batch_stats": {"head": stats}},
            fused, True,
            method=lambda mdl, ff, tr: mdl.fused_head(ff, train=tr),
            mutable=["batch_stats"], **_rngs(1, t),
        )
        return out, (upd["batch_stats"]["head"], t + 1)

    def split_params(params):
        return (params, params)  # each stage reads only its submodule

    def split_stats(batch_stats):
        t0 = jnp.int32(0)
        return ((batch_stats["backbone"], t0), (batch_stats["head"], t0))

    def combine(states):
        return {"backbone": states[0][0], "head": states[1][0]}

    return (stage_backbone, stage_head), split_params, split_stats, combine


def flow_unet_pipeline_stages(model, variables, train: bool = False):
    """Stage the flow U-Net encoder+correlation | decoder+head for
    :func:`pipeline_apply`. The skip connections (f1_1, f1_0, raw scan)
    cross the stage boundary as a pytree activation — exactly what the
    uniform transfer buffer packs. Input is the ``(scan1, scan2)`` pair.
    """

    def stage_encode(v, scans):
        s1, s2 = scans
        return model.apply(
            v, s1, s2, train,
            method=lambda mdl, a, b, tr: mdl.encode(a, b, train=tr),
        )

    def stage_decode(v, enc):
        return model.apply(
            v, *enc, train,
            method=lambda mdl, c, f1, f0, s1, tr: mdl.decode(
                c, f1, f0, s1, train=tr
            ),
        )

    return (stage_encode, stage_decode), (variables, variables)
