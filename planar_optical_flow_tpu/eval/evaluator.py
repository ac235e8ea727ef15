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


def evaluate_flow_serving(model, variables, cutout_kwargs, frames,
                          engine: str = "module", calib=None,
                          calib_scans=None, num_pts: int = 450,
                          batch_streams: int = 8, runner=None):
    """Flow EPE/AAE through a SERVING engine (module / v3 / int8c).

    The module-path :func:`evaluate_flow` scores the training forward;
    this scores what a serving deployment actually emits: each frame's
    scan stack is stepped through a :class:`StreamingRunner` (bootstrap
    on scan 0, template carried into the rest) and the final global-frame
    ``pred_flow`` is compared to the dataset's canonical targets rotated
    into the same frame (EPE is rotation-invariant, so the number is
    directly comparable to the module metric). This is the CLI face of
    the trained-flow EPE gate (``tests/test_int8_serving_gate.py``).

    ``frames``: a dataset with ``len()`` and ``.batch(indices)`` emitting
    ``scans (B, S, P)``, ``target_flow (B, P, 2)`` (canonical), and
    ``exclude_mask (B, P)`` — e.g. ``DrowDetectionDataset``. The frame
    count is trimmed to a multiple of ``batch_streams``. Flip
    augmentation is suspended for the duration (eval must be
    deterministic and the calibration scans must match the scored
    frames).

    ``runner``: a prebuilt :class:`StreamingRunner` — e.g.
    ``StreamingRunner.from_artifact`` to score the exact programs of a
    shipped AOT artifact; ``engine``/``calib``/``calib_scans`` are then
    ignored (the runner's engine is baked in) and ``batch_streams`` must
    match a batch the runner accepts. The serving analogue of the AP
    evaluator's ``step=`` kwarg.
    """
    import jax.numpy as jnp

    from planar_optical_flow_tpu.infer.streaming import StreamingRunner
    from planar_optical_flow_tpu.ops.geometry import (
        canonical_to_global_flow, get_laser_phi,
    )

    n_eval = (len(frames) // batch_streams) * batch_streams
    if n_eval == 0:
        raise ValueError(
            f"{len(frames)} frames < batch_streams={batch_streams}")
    was_aug = getattr(frames, "use_augmentation", False)
    frames.use_augmentation = False
    try:
        if runner is not None:
            engine = getattr(runner, "_engine", "custom")
        else:
            if calib_scans is None and engine == "int8c" and calib is None:
                calib_scans = np.asarray(
                    frames.batch(np.arange(batch_streams))["scans"][:, -1])
            # NMS outputs are never read here — pred_flow comes from the
            # epilogue regardless, so skip the per-step vote NMS entirely
            runner = StreamingRunner(model, variables, cutout_kwargs,
                                     num_pts=num_pts, with_nms=False,
                                     engine=engine, calib=calib,
                                     calib_scans=calib_scans)
        phi = jnp.asarray(get_laser_phi(num_pts=num_pts))
        epe_sum, ang_sum, n_pts = 0.0, 0.0, 0
        for i in range(0, n_eval, batch_streams):
            batch = frames.batch(np.arange(i, i + batch_streams))
            runner.reset()
            scans = np.asarray(batch["scans"], np.float32)
            for t in range(scans.shape[1]):
                out = runner(scans[:, t])
            if "pred_flow" not in out:
                raise ValueError(
                    "serving engine emits no pred_flow — flow EPE needs a "
                    "flow-headed model (flow_drow); an AOT artifact must "
                    "have been exported from one")
            pred = np.asarray(out["pred_flow"], np.float32)
            target = np.asarray(canonical_to_global_flow(
                jnp.asarray(batch["target_flow"]), phi), np.float32)
            mask = np.asarray(batch["exclude_mask"]).astype(bool)
            err = np.linalg.norm(pred - target, axis=-1)
            # wrapped angular error (degrees), reference metric semantics
            # (eval_utils.py:129-134) with the branch-cut fix
            dang = (np.arctan2(pred[..., 0], pred[..., 1])
                    - np.arctan2(target[..., 0], target[..., 1]))
            dang = np.abs((dang + np.pi) % (2 * np.pi) - np.pi)
            epe_sum += float(err[mask].sum())
            ang_sum += float(np.degrees(dang[mask]).sum())
            n_pts += int(mask.sum())
    finally:
        frames.use_augmentation = was_aug
    return {"epe": epe_sum / max(n_pts, 1),
            "aae": ang_sum / max(n_pts, 1),
            "num_frames": n_eval,
            # trimming to whole stream batches is visible, not silent
            "frames_dropped": len(frames) - n_eval,
            "engine": engine}


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


def _make_batched_matcher(radius: float, conf_thresh: float):
    """Jitted per-frame greedy detection↔GT matcher, vmapped over frames.

    Same protocol as :func:`detection_ap.match_detections` (confidence-
    ordered greedy association within ``radius``; each GT used once) on
    fixed-shape inputs, so all F frames match in one device call instead
    of a 10k-iteration host loop.
    """
    import jax
    import jax.numpy as jnp

    def match_one(xy, conf, valid, gt, gt_valid):
        k = xy.shape[0]
        # sort detections by confidence DESC; invalid slots sink to -1
        key = jnp.where(valid, conf, -1.0)
        order = jnp.argsort(-key)
        xy_s = xy[order]
        valid_s = valid[order]

        def body(i, carry):
            tp, used = carry
            d = jnp.sum((gt - xy_s[i]) ** 2, axis=1)
            d = jnp.where(used | ~gt_valid, jnp.inf, d)
            j = jnp.argmin(d)
            ok = valid_s[i] & (d[j] <= radius * radius)
            tp = tp.at[i].set(ok)
            used = used.at[j].set(used[j] | ok)
            return tp, used

        tp, _ = jax.lax.fori_loop(
            0, k, body,
            (jnp.zeros((k,), bool), jnp.zeros(gt.shape[0], bool)),
        )
        return tp, jnp.where(valid_s, key[order], -1.0), valid_s

    match = jax.jit(jax.vmap(match_one))

    def run(xy, conf, keep, gt, gt_valid, frame_valid):
        valid = keep & (conf >= conf_thresh) & frame_valid[:, None]
        return match(jnp.asarray(xy), jnp.asarray(conf),
                     jnp.asarray(valid), jnp.asarray(gt),
                     jnp.asarray(gt_valid))

    return run


def evaluate_detection_ap_batched(model, variables, cutout_kwargs, frames,
                                  batch_streams: int = 16,
                                  radius: float = 0.5,
                                  conf_thresh: float = 0.0,
                                  num_pts: int | None = None,
                                  compute_dtype=None,
                                  gate_mix: str | None = None,
                                  engine: str = "v3",
                                  calib=None,
                                  step=None,
                                  interpret: bool | None = None):
    """Detection PR/AP over a frame sequence, ``batch_streams`` frames per
    device step.

    The sequence is split into ``batch_streams`` contiguous chunks; each
    chunk streams through its own template state (chunk boundaries act as
    stream resets), so every device step processes ``batch_streams``
    independent scans through the batched serving step — vs. the
    batch-1 host loop of :func:`evaluate_detection_ap` (reference eval
    shape: ``eval_utils.py:221-274``, one frame at a time on host).
    Detection↔GT matching also runs on device (one vmapped greedy-matcher
    call over all frames); the host only pads GT and integrates the PR
    curve.

    ``engine``: "v3" (default) runs the bf16 fused serve-v3 pipeline —
    10k frames in a few seconds on one chip; "int8c" runs the flagship
    int8 end-to-end pipeline (calibrated from ``calib`` — a
    ``ServeCalibration`` — or self-calibrated on the first scans);
    "module" runs the module-path :func:`make_serve_step` (f32-exact vs
    ``StreamingRunner``, used by the parity tests). ``frames``: a
    :class:`DetectionEvalFrames` (or dataset accepted by its
    ``from_dataset`` adapter).

    ``step``: a prebuilt serving step (``make_serve_step_v3`` /
    ``make_serve_step`` result) — reuse it across calls to skip the
    per-call step construction, re-trace, and (int8c) self-recalibration,
    which otherwise dominate repeated evals (~30-40 s/call at 10k frames
    on the remote chip vs ~4 s steady-state with a cached step).
    """
    import warnings

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
        interpret = engine != "module" and jax.default_backend() == "cpu"
    if engine != "module" and (compute_dtype is not None
                               or gate_mix is not None):
        # these knobs only affect the module engine; silently ignoring
        # them would shift reported AP without signal (ADVICE r2)
        warnings.warn(
            f"compute_dtype/gate_mix are ignored by engine={engine!r}; "
            "pass engine='module' to use them", stacklevel=2)
    b = max(1, min(batch_streams, t_total))
    t_chunk = (t_total + b - 1) // b
    pad = b * t_chunk - t_total
    scans = np.concatenate(
        [frames.scans, np.full((pad, p), 29.99, np.float32)], axis=0
    ).reshape(b, t_chunk, p)

    if step is not None:
        pass  # caller-provided (cached) serving step
    elif engine == "v3":
        # the matcher reads only the NMS detections: dropping the other
        # outputs DCEs the instance assignment + flow/prob epilogues
        step = make_serve_step_v3(
            model, variables, cutout_kwargs, num_pts=num_pts,
            precision="bf16",
            output_fields=("det_xys", "det_cls", "det_keep"),
            interpret=interpret)
    elif engine == "int8c":
        step = make_serve_step_v3(
            model, variables, cutout_kwargs, num_pts=num_pts,
            precision="int8c", calib=calib,
            calib_scans=None if calib is not None else frames.scans[:8],
            output_fields=("det_xys", "det_cls", "det_keep"),
            interpret=interpret)
    else:
        if gate_mix is None:
            # the pallas banded gate needs sublane-aligned cutout blocks;
            # at e.g. 450 pts fall back to the XLA mix (same numerics)
            gate_mix = "pallas" if num_pts % 8 == 0 else "xla"
        step = make_serve_step(model, variables, cutout_kwargs,
                               num_pts=num_pts,
                               compute_dtype=compute_dtype,
                               gate_mix=gate_mix, interpret=interpret)
    outs = []
    carry = None
    for t in range(t_chunk):
        carry, out = step(carry, jnp.asarray(scans[:, t]))
        outs.append((out["det_xys"], out["det_cls"], out["det_keep"]))

    # stack to (t_chunk, b, K, .) and flatten to frame rows n = t*b + s
    # ON DEVICE (frame index i = s*t_chunk + t): per-step np.asarray was
    # ~3 relay round-trips x t_chunk — the host tail that dominated the
    # 10k-frame eval; now the only D2H is the matcher's 3 outputs
    xys = jnp.stack([o[0] for o in outs])
    confs = jnp.stack([o[1] for o in outs])[..., 0]
    keeps = jnp.stack([o[2] for o in outs])
    kslots = xys.shape[2]
    xys = xys.reshape(-1, kslots, 2)
    confs = confs.reshape(-1, kslots)
    keeps = keeps.reshape(-1, kslots)

    tt, ss = np.meshgrid(np.arange(t_chunk), np.arange(b), indexing="ij")
    frame_idx = (ss * t_chunk + tt).reshape(-1)
    frame_valid = frame_idx < t_total

    g_max = max([1] + [len(g) for g in frames.gt])
    gt_pad = np.zeros((len(frame_idx), g_max, 2), np.float32)
    gt_valid = np.zeros((len(frame_idx), g_max), bool)
    num_gt = 0
    for n, (i, fv) in enumerate(zip(frame_idx, frame_valid)):
        if not fv:
            continue
        g = np.asarray(frames.gt[i], np.float32).reshape(-1, 2)
        gt_pad[n, : len(g)] = g
        gt_valid[n, : len(g)] = True
        num_gt += len(g)

    matcher = _make_batched_matcher(radius, conf_thresh)
    tp, conf_sorted, valid_sorted = matcher(xys, confs, keeps, gt_pad,
                                            gt_valid, frame_valid)
    sel = np.asarray(valid_sorted).reshape(-1)
    flags = np.asarray(tp).reshape(-1)[sel]
    pool_confs = np.asarray(conf_sorted).reshape(-1)[sel]

    precision, recall, _ = detection_ap.precision_recall_from_pool(
        flags, pool_confs, num_gt)
    return {
        "ap": detection_ap.average_precision(precision, recall),
        "peak_f1": detection_ap.peak_f1(precision, recall),
        "eer": detection_ap.eer(precision, recall),
        "num_frames": int(frame_valid.sum()),
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
