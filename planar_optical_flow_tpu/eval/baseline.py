"""Analytic baselines that floor the learned models.

``mean_box_baseline`` reimplements the reference's
``eval_BB_reg_baseline`` (``src/utils/eval_utils.py:561-639``): predict the
dataset-mean box dimensions at the detection center with a fixed pi/2
orientation, and report IoU / dimension / orientation errors — the number a
learned regressor must beat.
"""

from __future__ import annotations

import numpy as np

from planar_optical_flow_tpu import ops


def mean_box_baseline(dataset, is_3d: bool | None = None) -> dict:
    """Evaluate the mean-dimension box baseline over a
    ``JrdbBoxRegressionDataset``-like object exposing ``targets`` (list of
    ``(5|7,)`` boxes) and ``dets_center``."""
    targets = np.asarray(dataset.targets, dtype=np.float64)
    centers = np.asarray(dataset.dets_center, dtype=np.float64)
    if is_3d is None:
        is_3d = targets.shape[1] == 7

    if is_3d:
        dims_mean = targets[:, 3:6].mean(axis=0)
        preds = np.column_stack(
            [
                centers[:, 0], centers[:, 1],
                np.full(len(targets), targets[:, 2].mean()),
                np.tile(dims_mean, (len(targets), 1)),
                np.full(len(targets), 0.5 * np.pi),
            ]
        )
        iou = np.asarray(ops.rotated_iou_3d_paired(preds, targets))
        dim_err = np.abs(preds[:, 3:6] - targets[:, 3:6]).sum(axis=1)
        ori_err = np.abs(preds[:, 6] - targets[:, 6])
        z_err = np.abs(preds[:, 2] - targets[:, 2])
    else:
        dims_mean = targets[:, 2:4].mean(axis=0)
        preds = np.column_stack(
            [
                centers[:, 0], centers[:, 1],
                np.tile(dims_mean, (len(targets), 1)),
                np.full(len(targets), 0.5 * np.pi),
            ]
        )
        iou = np.asarray(ops.rotated_iou_paired(preds, targets))
        dim_err = np.abs(preds[:, 2:4] - targets[:, 2:4]).sum(axis=1)
        ori_err = np.abs(preds[:, 4] - targets[:, 4])

    out = {
        "iou": float(iou.mean()),
        "loss_dim": float(dim_err.mean()),
        "loss_ori": float(ori_err.mean()),
    }
    if is_3d:
        # mean-z predictor error, comparable to the model's loss_z
        out["loss_z"] = float(z_err.mean())
    return out
