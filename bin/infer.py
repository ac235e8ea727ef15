#!/usr/bin/env python
"""Streaming joint detection+flow inference over a scan sequence
(reference ``depracted_scripts/infer_person_flow.py``):

    python bin/infer.py --cfg configs/dr_spaam.yaml --ckpt CKPT \
        --sequence data/DROWv2-data/test/seq.csv [--video out.mp4]

Feeds each scan through the jitted streaming step (cutout + backbone +
template memory + NMS on device) and optionally renders a video.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow `python bin/<tool>.py` without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None,
                        help="model config (required unless --artifact)")
    parser.add_argument("--artifact", default=None,
                        help="AOT serving-engine directory "
                             "(bin/export_serving.py); replaces "
                             "--cfg/--ckpt/--engine — the artifact is "
                             "self-contained")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--sequence", required=True,
                        help="path to a DROW .csv scan file (stem ok)")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--video", default=None)
    parser.add_argument("--conf", type=float, default=0.5)
    parser.add_argument("--world-frame", action="store_true",
                        help="match odometry by timestamp and report "
                             "detections/flow in the world frame "
                             "(reference infer_person_flow.py:112-147)")
    parser.add_argument("--engine", choices=("module", "v3", "int8c"),
                        default=None,
                        help="default 'module'; "
                             "'v3' = fused bf16 pallas serving pipeline "
                             "(~4x faster per scan; bf16 tolerance); "
                             "'int8c' = flagship int8 end-to-end pipeline "
                             "(scales from calibration.json next to the "
                             "checkpoint if present, else self-calibrated "
                             "on the sequence's first scans)")
    parser.add_argument("--calib", default=None,
                        help="path to a calibration.json (or a directory "
                             "containing one) for --engine int8c")
    parser.add_argument("--save-calib", default=None,
                        help="persist the int8c calibration in use to this "
                             "path (e.g. next to the checkpoint)")
    parser.add_argument("--replay", action="store_true",
                        help="offline replay: keep a window of steps in "
                             "flight and read results back in chunks "
                             "(device-side stack, one transfer per chunk) "
                             "instead of syncing 5 arrays per frame — "
                             "bit-identical outputs, ~26x on a remote-"
                             "attached chip; works with every engine "
                             "including --artifact")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.artifact:
        # the artifact is self-contained; these flags would silently do
        # nothing (or contradict what is baked into the engine)
        for flag, name in ((args.cfg, "--cfg"), (args.ckpt, "--ckpt"),
                           (args.engine, "--engine"),
                           (args.calib, "--calib"),
                           (args.save_calib, "--save-calib")):
            if flag:
                parser.error(f"{name} is incompatible with --artifact")
    elif not args.cfg:
        parser.error("--cfg is required (unless --artifact is given)")
    if args.engine is None:
        args.engine = "module"
    if args.engine != "int8c":
        # fail loudly instead of silently ignoring calibration flags (the
        # run would otherwise complete with no calibration written/used)
        if args.save_calib:
            parser.error("--save-calib requires --engine int8c")
        if args.calib:
            parser.error("--calib requires --engine int8c")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from planar_optical_flow_tpu.utils.config import load_config
    from planar_optical_flow_tpu.pipeline import normalize_config
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.infer import StreamingRunner
    from planar_optical_flow_tpu.data import drow_io
    from planar_optical_flow_tpu.train import checkpoint as ckpt_lib
    from planar_optical_flow_tpu.train.state import create_train_state
    import jax.numpy as jnp
    import optax

    stem = args.sequence[:-4] if args.sequence.endswith(".csv") \
        else args.sequence
    _, scan_t, scans = drow_io.load_scan_file(stem)
    if args.max_frames:
        scans = scans[: args.max_frames]
        scan_t = scan_t[: args.max_frames]

    poses = None
    if args.world_frame:
        _, odom_t, odom = drow_io.load_odometry_file(stem)
        match = np.argmin(np.abs(scan_t[:, None] - odom_t[None, :]), axis=1)
        poses = odom[match]  # (T, 3) world pose per scan

    if args.artifact:
        runner = StreamingRunner.from_artifact(args.artifact)
        batches = (runner.meta.get("batches")
                   or [runner.meta.get("batch")])
        if 1 not in batches:
            parser.error(
                f"artifact was exported for batch(es) {batches}; per-frame "
                f"inference needs one that includes --batch 1")
        if runner.meta.get("num_pts") != scans.shape[1]:
            parser.error(
                f"artifact expects {runner.meta.get('num_pts')}-pt scans, "
                f"sequence has {scans.shape[1]}")
    else:
        cfg = normalize_config(load_config(args.cfg))
        model = get_model(cfg["model"])

        n_ct = cfg["dataset"].get("cutout_kwargs", {}).get(
            "num_cutout_pts", 48)
        x = jnp.zeros((1, 450, 2, n_ct))
        example = (x, jnp.zeros((1, 450))) \
            if cfg["model"]["type"] == "flow_drow" else (x,)
        state = create_train_state(model, example, optax.identity(),
                                   init_kwargs={"train": False})
        if args.ckpt:
            # variables-only: the trainer's opt_state tree is irrelevant
            # (and structurally incompatible with the identity-optimizer
            # template)
            state = ckpt_lib.restore_variables(args.ckpt, state)

        calib = calib_scans = None
        if args.engine == "int8c":
            from planar_optical_flow_tpu.infer import ServeCalibration

            if args.calib:
                calib = ServeCalibration.load(args.calib)
            elif args.ckpt:
                calib = ServeCalibration.find(args.ckpt)
            if calib is None:
                # self-calibrate on the sequence's first scans (the runtime
                # encode path observes the same data distribution it serves)
                calib_scans = np.asarray(scans[:8], np.float32)

        # request only what this CLI reads: detections + flow (when the
        # model has a flow head) + instance_mask only when rendering a
        # video (its only consumer is the viz instance coloring) — the
        # serving program drops the unrequested epilogues (measured
        # ~+300 scans/s at B=128; experiments/probe_output_fields.py)
        fields = ["det_xys", "det_cls", "det_keep"]
        if cfg["model"]["type"] == "flow_drow":
            fields.append("pred_flow")
        if args.video:
            fields.append("instance_mask")
        runner = StreamingRunner(model, state.variables,
                                 cfg["dataset"].get("cutout_kwargs", {}),
                                 num_pts=scans.shape[1],
                                 engine=args.engine, calib=calib,
                                 calib_scans=calib_scans,
                                 output_fields=tuple(fields))
    if args.save_calib:
        if runner.calibration is None:
            print("error: no calibration produced to save", file=sys.stderr)
            return 1
        print(f"calibration saved to {runner.calibration.save(args.save_calib)}")

    if args.replay:
        # Offline replay: the per-frame loop below syncs ~5 arrays per
        # frame, and on a remote-attached chip every sync is a relay
        # round trip (~130 ms/frame measured). Keep a bounded window of
        # steps in flight instead (the template carry chains them on
        # device), stack each window's outputs device-side, and read one
        # stacked transfer per window: 5.1 ms/frame measured, outputs
        # bit-identical. The window stays small — a few hundred live
        # remote buffers is where the backend errors out.
        import jax

        chunk = 16
        stack = jax.jit(lambda outs: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *outs))

        def frame_outputs():
            def drain(pending):
                got = jax.device_get(stack(pending))
                for t in range(len(pending)):
                    yield {k: v[t] for k, v in got.items()}

            pending = []
            for scan in scans:
                pending.append(runner(scan[None]))
                if len(pending) == chunk:
                    yield from drain(pending)
                    pending = []
            if pending:
                yield from drain(pending)
    else:
        def frame_outputs():
            for scan in scans:
                yield runner(scan[None])

    all_out = []
    for i, out in enumerate(frame_outputs()):
        keep = np.asarray(out["det_keep"][0])
        conf = np.asarray(out["det_cls"][0])[:, 0]
        sel = keep & (conf >= args.conf)
        dets = np.asarray(out["det_xys"][0])[sel]
        flow = (np.asarray(out["pred_flow"][0])
                if "pred_flow" in out else None)
        if poses is not None:
            # sensor -> world: rotate by heading, translate by pose
            x, y, h = poses[i]
            c, s = np.cos(h), np.sin(h)
            rot = np.array([[c, -s], [s, c]])
            dets = dets @ rot.T + [x, y]
            if flow is not None:
                flow = flow @ rot.T
        inst = (np.asarray(out["instance_mask"][0])
                if "instance_mask" in out else None)
        all_out.append({"dets": dets, "conf": conf[sel], "flow": flow,
                        "instance_mask": inst})
        if i % 50 == 0:
            print(f"frame {i}: {len(dets)} detections")

    if args.video:
        from planar_optical_flow_tpu.utils import viz

        viz.render_detection_video(scans, all_out, args.video)
        print(f"video written to {args.video}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
