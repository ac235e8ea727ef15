"""Losses and flow metrics.

Ports of the reference's loss semantics:
* mean endpoint-error flow loss, optionally masked
  (``src/depracted/model/dr_spaam.py:22-27``, ``prototype.py:27-32``),
* EPE/AAE eval metrics (``src/utils/eval_utils.py:129-134``),
* multi-class and binary focal losses (``src/depracted/model/loss_utils.py``),
* box-regression L1 losses (``src/model/box_regression.py:52-67``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def epe_loss(pred, target, mask=None):
    """Mean endpoint error over ``(..., P, 2)`` flow fields.

    With a mask, averages only over mask==1 points (reference
    ``dr_spaam.py:22-27``); without, averages over everything.
    """
    # loss math always in f32: a bf16 model feeds bf16 preds here, but
    # norms/means accumulate poorly in bf16 (mixed-precision policy:
    # bf16 network, f32 loss)
    err = jnp.linalg.norm(pred.astype(jnp.float32)
                          - target.astype(jnp.float32), axis=-1)
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def epe_aae(pred, target, wrap_angles: bool = False):
    """Per-sample EPE [m] and AAE [deg] over ``(B, P, 2)`` flow fields
    (reference ``eval_utils.py:129-134``).

    ``wrap_angles=False`` is parity-faithful to the reference, which takes
    ``|atan2 - atan2|`` WITHOUT wrapping to [-pi, pi] — a near-zero angular
    error across the branch cut reports as ~360 deg
    (``eval_utils.py:131``). ``wrap_angles=True`` fixes that by wrapping the
    difference onto [-pi, pi] first.
    """
    epe = jnp.mean(jnp.linalg.norm(pred - target, axis=-1), axis=-1)
    ang_p = jnp.arctan2(pred[..., 0], pred[..., 1])
    ang_t = jnp.arctan2(target[..., 0], target[..., 1])
    diff = ang_p - ang_t
    if wrap_angles:
        diff = jnp.mod(diff + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    aae = jnp.mean(jnp.abs(diff), axis=-1) * (180.0 / jnp.pi)
    return epe, aae


def focal_loss(logits, labels, gamma: float = 0.0, alpha=None,
               reduction: str = "mean"):
    """Multi-class focal loss on raw logits ``(N, C)`` with int labels ``(N,)``.

    gamma=0 reduces exactly to cross-entropy (the reference switches to
    ``F.cross_entropy`` in that case, ``dr_spaam.py:61-68`` — same value).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    if alpha is not None:
        at = jnp.asarray(alpha)[labels]
        logpt = logpt * at
    loss = -((1.0 - pt) ** gamma) * logpt
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def binary_focal_loss(probs, targets, gamma: float = 2.0, alpha: float = -1.0,
                      reduction: str = "mean", eps: float = 1e-12):
    """Binary focal loss on probabilities (reference ``loss_utils.py:53-70``).

    gamma=0, alpha<0 reduces to binary cross-entropy.
    """
    probs = jnp.clip(probs, eps, 1.0 - eps)
    loss_pos = -targets * (1.0 - probs) ** gamma * jnp.log(probs)
    loss_neg = -(1.0 - targets) * probs ** gamma * jnp.log(1.0 - probs)
    if 0.0 <= alpha <= 1.0:
        loss_pos = loss_pos * alpha
        loss_neg = loss_neg * (1.0 - alpha)
    loss = loss_pos + loss_neg
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def box_regression_loss(pred, target, alpha: float = 0.5):
    """L1 box losses (reference ``regression_loss2``,
    ``box_regression.py:52-67``).

    5-dim targets: ``[cz, l, w, h, ori]`` -> |z| + sum|dims| + alpha*|ori|.
    3-dim targets: ``[l, w, ori]``        -> sum|dims| + alpha*|ori|.
    """
    d = pred.shape[-1]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if d == 5:
        loss_z = jnp.mean(jnp.abs(pred[..., 0] - target[..., 0]))
        loss_dim = jnp.mean(jnp.sum(jnp.abs(pred[..., 1:-1] - target[..., 1:-1]),
                                    axis=-1))
        loss_ori = jnp.mean(jnp.abs(pred[..., -1] - target[..., -1]))
        return loss_z + loss_dim + alpha * loss_ori
    if d == 3:
        loss_dim = jnp.mean(jnp.sum(jnp.abs(pred[..., :-1] - target[..., :-1]),
                                    axis=-1))
        loss_ori = jnp.mean(jnp.abs(pred[..., -1] - target[..., -1]))
        return loss_dim + alpha * loss_ori
    raise ValueError(f"unsupported target dim {d}")


def detection_loss(pred_cls, pred_reg, target_cls, target_reg,
                   focal_gamma: float = 0.0, pedestrian_only: bool = False):
    """Joint cls+reg detection loss of the DROW family.

    Reference semantics (``eval_utils.py:31-88`` / ``model_fn_obj_det``):
    cls loss over every point (focal or CE/BCE); reg loss = mean Euclidean
    distance over foreground points only.
    """
    n = target_cls.size
    # f32 loss math regardless of the network dtype: bf16 sigmoid saturates
    # to exactly 1.0 for logits >= ~7 (1 - 2^-9 is the last value below 1),
    # so a bf16 BCE-on-probabilities returns log(0) = -inf
    cls_flat = pred_cls.reshape(n, -1).astype(jnp.float32)
    pred_reg = pred_reg.astype(jnp.float32)
    tgt_flat = target_cls.reshape(n)
    if pedestrian_only or cls_flat.shape[-1] == 1:
        probs = jax.nn.sigmoid(cls_flat[:, 0])
        cls_loss = binary_focal_loss(probs, tgt_flat.astype(probs.dtype),
                                     gamma=focal_gamma)
    else:
        cls_loss = focal_loss(cls_flat, tgt_flat, gamma=focal_gamma)

    fg = (tgt_flat != 0).astype(pred_reg.dtype)
    reg_err = jnp.linalg.norm(
        pred_reg.reshape(n, -1) - target_reg.reshape(n, -1), axis=-1
    )
    reg_loss = jnp.sum(reg_err * fg) / jnp.maximum(jnp.sum(fg), 1.0)
    fg_ratio = jnp.mean(fg)
    return cls_loss, reg_loss, fg_ratio
