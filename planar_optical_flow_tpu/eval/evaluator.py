"""Evaluation loops per workload.

The device side (forward, metrics, NMS) is jitted; the host only accumulates
scalars and variable-length detections. Counterparts of the reference's
``eval_dr_spaam`` / ``eval_person_flow`` / ``model_fn_eval_box_reg``
(``src/utils/eval_utils.py``).
"""

from __future__ import annotations

import numpy as np
import jax

from planar_optical_flow_tpu.eval import detection_ap


def _avg(sums: dict, n: int) -> dict:
    return {k: v / max(n, 1) for k, v in sums.items()}


def evaluate_flow(task, state, loader, collect_outputs: bool = False):
    """Mean EPE/AAE over a loader; optionally collect per-frame flow fields
    for visualization (reference ``eval_dr_spaam`` accumulation,
    ``eval_utils.py:235-274``)."""
    step = jax.jit(
        lambda st, b: task.metrics(
            st.apply_fn, st.variables, b
        )
    )
    sums, n, outs = {}, 0, []
    for batch in loader:
        metrics, rtn = step(state, batch)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
        if collect_outputs:
            outs.append(
                {k: np.asarray(v) for k, v in rtn.items()}
            )
    result = _avg(sums, n)
    return (result, outs) if collect_outputs else result


def evaluate_detection_ap(runner, dataset, radius: float = 0.5,
                          conf_thresh: float = 0.0,
                          reset_every: int | None = None):
    """Stream a detection dataset through a ``StreamingRunner`` and score
    PR/AP against the dataset's annotations.

    ``dataset`` must expose ``scans_flat``, ``cur_idx``, and per-sample GT
    person centers via ``gt_centers(i) -> (N, 2)`` (sensor frame).
    """
    frames = []
    for i in range(len(dataset)):
        if reset_every and i % reset_every == 0:
            runner.reset()
        scan = dataset.scans_flat[dataset.cur_idx[i]][None]
        out = runner(scan)
        keep = np.asarray(out["det_keep"][0])
        xys = np.asarray(out["det_xys"][0])[keep]
        conf = np.asarray(out["det_cls"][0])[keep, 0]
        sel = conf >= conf_thresh
        frames.append((xys[sel], conf[sel], dataset.gt_centers(i)))

    precision, recall, _ = detection_ap.precision_recall_curve(frames, radius)
    return {
        "ap": detection_ap.average_precision(precision, recall),
        "peak_f1": detection_ap.peak_f1(precision, recall),
        "eer": detection_ap.eer(precision, recall),
        "num_frames": len(frames),
    }


def evaluate_box_regression(task, state, loader):
    """Mean IoU / z / dim / ori errors (reference
    ``model_fn_eval_box_reg``, ``eval_utils.py:520-559``)."""
    step = jax.jit(
        lambda st, b: task.metrics(st.apply_fn, st.variables, b)[0]
    )
    sums, n = {}, 0
    for batch in loader:
        metrics = step(state, batch)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return _avg(sums, n)
