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


class DetectionEvalFrames:
    """Formal input protocol for detection-AP evaluation: an ordered frame
    sequence plus ground-truth person centers per frame.

    Attributes:
      scans: ``(T, P)`` float32 — consecutive frames (streaming order).
      gt: length-T list of ``(N_i, 2)`` GT centers in the sensor frame.
    """

    def __init__(self, scans: np.ndarray, gt: list):
        scans = np.asarray(scans, np.float32)
        if scans.ndim != 2 or len(gt) != len(scans):
            raise ValueError("scans must be (T, P) with len(gt) == T")
        self.scans = scans
        self.gt = list(gt)

    def __len__(self):
        return len(self.scans)

    @classmethod
    def from_dataset(cls, dataset):
        """Adapter for DrowDetectionDataset-style objects (``scans_flat``,
        ``cur_idx``, ``gt_centers``)."""
        scans = dataset.scans_flat[dataset.cur_idx]
        gt = [dataset.gt_centers(i) for i in range(len(dataset))]
        return cls(scans, gt)


def evaluate_detection_ap_batched(model, variables, cutout_kwargs, frames,
                                  batch_streams: int = 16,
                                  radius: float = 0.5,
                                  conf_thresh: float = 0.0,
                                  num_pts: int | None = None,
                                  compute_dtype=None,
                                  gate_mix: str | None = None,
                                  engine: str = "v3",
                                  interpret: bool | None = None):
    """Detection PR/AP over a frame sequence, ``batch_streams`` frames per
    device step.

    The sequence is split into ``batch_streams`` contiguous chunks; each
    chunk streams through its own template state (chunk boundaries act as
    stream resets), so every device step processes ``batch_streams``
    independent scans through the batched serving step — vs. the
    batch-1 host loop of :func:`evaluate_detection_ap` (reference eval
    shape: ``eval_utils.py:221-274``, one frame at a time on host).

    ``engine``: "v3" (default) runs the bf16 fused serve-v3 pipeline —
    10k frames in a few seconds on one chip; "module" runs the
    module-path :func:`make_serve_step` (f32-exact vs ``StreamingRunner``,
    used by the parity tests). ``frames``: a :class:`DetectionEvalFrames`
    (or dataset accepted by its ``from_dataset`` adapter).
    """
    import jax
    import jax.numpy as jnp

    from planar_optical_flow_tpu.infer.streaming import (
        make_serve_step, make_serve_step_v3,
    )

    if not isinstance(frames, DetectionEvalFrames):
        frames = DetectionEvalFrames.from_dataset(frames)
    t_total, p = frames.scans.shape
    num_pts = num_pts or p
    if interpret is None:
        # pallas kernels need interpret mode off-TPU (tests / CPU eval)
        interpret = engine == "v3" and jax.default_backend() == "cpu"
    if gate_mix is None:
        # the pallas banded gate needs sublane-aligned cutout blocks; at
        # e.g. 450 pts fall back to the XLA mix (same numerics)
        gate_mix = "pallas" if num_pts % 8 == 0 else "xla"
    b = max(1, min(batch_streams, t_total))
    t_chunk = (t_total + b - 1) // b
    pad = b * t_chunk - t_total
    scans = np.concatenate(
        [frames.scans, np.full((pad, p), 29.99, np.float32)], axis=0
    ).reshape(b, t_chunk, p)

    if engine == "v3":
        step = make_serve_step_v3(model, variables, cutout_kwargs,
                                  num_pts=num_pts, precision="bf16",
                                  interpret=interpret)
    else:
        step = make_serve_step(model, variables, cutout_kwargs,
                               num_pts=num_pts,
                               compute_dtype=compute_dtype,
                               gate_mix=gate_mix, interpret=interpret)
    outs = []
    carry = None
    for t in range(t_chunk):
        carry, out = step(carry, jnp.asarray(scans[:, t]))
        outs.append({k: out[k] for k in ("det_xys", "det_cls", "det_keep")})

    per_frame = []
    for t, out in enumerate(outs):  # host side: unpack fixed-shape results
        keep = np.asarray(out["det_keep"])
        xys = np.asarray(out["det_xys"])
        conf = np.asarray(out["det_cls"])[..., 0]
        for s in range(b):
            i = s * t_chunk + t
            if i >= t_total:
                continue
            k = keep[s]
            sel = conf[s][k] >= conf_thresh
            per_frame.append(
                (i, xys[s][k][sel], conf[s][k][sel], frames.gt[i])
            )
    per_frame.sort(key=lambda f: f[0])
    triples = [(x, c, g) for _, x, c, g in per_frame]

    precision, recall, _ = detection_ap.precision_recall_curve(triples,
                                                               radius)
    return {
        "ap": detection_ap.average_precision(precision, recall),
        "peak_f1": detection_ap.peak_f1(precision, recall),
        "eer": detection_ap.eer(precision, recall),
        "num_frames": len(triples),
    }


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
