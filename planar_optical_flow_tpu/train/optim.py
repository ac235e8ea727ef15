"""Optimizers and learning-rate schedules.

The reference uses two identical geometric-decay schedules —
``LucasScheduler`` (``src/utils/train_utils.py:42-68``) and
``_ExpDecayScheduler`` (``src/pipeline/optim.py:28-49``): hold ``lr0`` until
``epoch0``, decay geometrically to ``lr1`` at ``epoch1``, hold thereafter —
stepped per-iteration with a fractional epoch. Here that is an optax
step-based schedule; the optimizer is Adam with AMSGrad
(``src/pipeline/optim.py:5``), optionally wrapped in global-norm gradient
clipping (``src/pipeline/trainer.py:117-118``).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def exp_decay_schedule(epoch0: float, lr0: float, epoch1: float, lr1: float,
                       steps_per_epoch: int):
    """Per-step schedule implementing the reference's fractional-epoch
    geometric interpolation."""

    def schedule(step):
        epoch = step / steps_per_epoch
        frac = jnp.clip((epoch - epoch0) / max(epoch1 - epoch0, 1e-9), 0.0, 1.0)
        return lr0 * (lr1 / lr0) ** frac

    return schedule


def make_optimizer(cfg: dict, steps_per_epoch: int,
                   frozen_mask=None) -> optax.GradientTransformation:
    """Build the training optimizer.

    cfg keys (same surface as the reference YAMLs):
      scheduler_kwargs: {epoch0, lr0, epoch1, lr1}
      grad_norm_clip: float (<=0 disables)
      amsgrad: bool (default True, matching ``optim.Adam(amsgrad=True)``)

    ``frozen_mask``: optional pytree-of-bools (True = train, False = freeze)
    for frozen-backbone workloads (FlowDROW).
    """
    sk = cfg.get("scheduler_kwargs", {})
    schedule = exp_decay_schedule(
        sk.get("epoch0", 0),
        sk.get("lr0", 1e-3),
        sk.get("epoch1", max(sk.get("epoch0", 0) + 1, 100)),
        sk.get("lr1", 1e-6),
        steps_per_epoch,
    )
    adam = (
        optax.amsgrad(learning_rate=schedule)
        if cfg.get("amsgrad", True)
        else optax.adam(learning_rate=schedule)
    )
    chain = [adam]
    clip = cfg.get("grad_norm_clip", 0.0)
    if clip and clip > 0:
        chain = [optax.clip_by_global_norm(clip)] + chain
    tx = optax.chain(*chain)

    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=lambda params: _mask_to_labels(frozen_mask, params),
        )
    return tx


def _mask_to_labels(mask, params):
    import jax

    flat_mask = jax.tree_util.tree_leaves(mask)
    if len(flat_mask) == 1 and not isinstance(mask, dict):
        return jax.tree_util.tree_map(
            lambda _: "train" if flat_mask[0] else "freeze", params
        )
    return jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask
    )
