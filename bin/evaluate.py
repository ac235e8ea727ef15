#!/usr/bin/env python
"""Evaluation entry point (reference ``bin/eval_dr_spaam.py`` /
``bin/eval_prototype.py``):

    python bin/evaluate.py --cfg configs/dr_spaam.yaml --ckpt CKPT
                           [--split val] [--synthetic DIR] [--ap]
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow `python bin/<tool>.py` without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def _artifact_eval_batch(meta, n_frames, num_pts, parser,
                         pick: str = "fit"):
    """Pick the serving batch for scoring an AOT artifact. Validates the
    scan width up front (the exported programs have static shapes, so a
    mismatch would otherwise surface as an opaque shape error inside the
    deserialized StableHLO call).

    ``pick="fit"``: largest exported batch <= n_frames — right for the AP
    evaluator, which PADS the sequence to whole chunks so every frame is
    scored regardless of batch. ``pick="coverage"``: the batch that
    maximizes scored frames — right for ``evaluate_flow_serving``, which
    TRIMS to whole batches (a large batch could silently drop up to
    batch-1 frames from the reported EPE/AAE)."""
    if int(meta["num_pts"]) != int(num_pts):
        parser.error(
            f"artifact was exported for num_pts={meta['num_pts']} but the "
            f"dataset has {num_pts}-beam scans")
    batches = meta.get("batches") or [meta["batch"]]
    fit = [int(b) for b in batches if int(b) <= n_frames]
    if not fit:
        parser.error(
            f"artifact batches {sorted(batches)} all exceed the "
            f"{n_frames} eval frames; re-export with a smaller --batch")
    if pick == "coverage":
        # scored frames = (n_frames // b) * b; tie-break on larger batch
        # (fewer, bigger device steps)
        return max(fit, key=lambda b: ((n_frames // b) * b, b))
    return max(fit)


def _resolve_ap_engine(engine, ckpt):
    """Resolve --engine for --ap. "auto" picks the flagship "int8c" when a
    persisted calibration.json sits next to ``ckpt`` (zero extra inputs),
    else the fused bf16 "v3" — never silently self-calibrating on eval
    scans. Returns (engine, calib)."""
    calib = None
    if engine in ("auto", "int8c") and ckpt:
        from planar_optical_flow_tpu.infer import ServeCalibration

        calib = ServeCalibration.find(ckpt)
    if engine == "auto":
        engine = "int8c" if calib is not None else "v3"
    return engine, calib


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--tag", default="")
    parser.add_argument("--synthetic", default=None)
    parser.add_argument("--ap", action="store_true",
                        help="also run streaming detection AP")
    parser.add_argument("--engine", choices=("auto", "module", "v3", "int8c"),
                        default="auto",
                        help="serving engine for --ap: 'auto' (default) "
                             "picks the flagship 'int8c' when a persisted "
                             "calibration.json sits next to --ckpt, else "
                             "the fused bf16 'v3'; 'int8c' flagship int8 "
                             "(calibrated from the checkpoint dir or the "
                             "eval scans), 'module' f32-exact")
    parser.add_argument("--serve-flow", action="store_true",
                        help="also score flow EPE/AAE through the serving "
                             "engine selected by --engine (flow_drow "
                             "models; the module-path EPE above scores "
                             "the training forward)")
    parser.add_argument("--artifact", default=None,
                        help="AOT serving-artifact directory "
                             "(bin/export_serving.py): score the exact "
                             "exported programs with --ap/--serve-flow — "
                             "deployment QA on the unit you ship. "
                             "Conflicts with --engine (the artifact's "
                             "engine is baked in)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.artifact:
        if args.engine != "auto":
            parser.error("--engine conflicts with --artifact (the "
                         "artifact's engine is baked in)")
        if not (args.ap or args.serve_flow):
            parser.error("--artifact only affects the serving-path "
                         "evaluations; pass --ap and/or --serve-flow")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from planar_optical_flow_tpu.utils.config import load_config
    from planar_optical_flow_tpu.pipeline import Pipeline, normalize_config

    cfg = load_config(args.cfg, tag=args.tag)
    cfg = normalize_config(cfg)

    if args.serve_flow and cfg["model"]["type"] != "flow_drow":
        parser.error("--serve-flow needs a flow-headed model "
                     f"(flow_drow), not {cfg['model']['type']!r}")

    # load the artifact BEFORE the pipeline build (model init is slow on
    # a remote chip) so a missing/corrupt/wrong-platform artifact fails
    # in milliseconds; the one loaded engine serves both --ap and
    # --serve-flow
    artifact_engine = None
    if args.artifact:
        from planar_optical_flow_tpu.infer import load_serving_engine

        artifact_engine = load_serving_engine(args.artifact)

    synthetic_dir = None
    if args.synthetic:
        from bin.train import _make_synthetic

        synthetic_dir = _make_synthetic(cfg, args.synthetic)

    if args.artifact and not args.ckpt:
        # artifact-only QA: the artifact carries the serving programs and
        # module-path metrics on an un-restored init would be meaningless
        # noise — so skip the WHOLE pipeline build (model init is ~90 s
        # on a remote chip and its state would never be read); only the
        # datasets are needed
        from planar_optical_flow_tpu.pipeline import _build_datasets

        train_set, val_set = _build_datasets(cfg, synthetic_dir)
        eval_set = val_set or train_set
        print({"note": "module-path metrics skipped (no --ckpt; the "
                       "artifact carries the serving programs)"})
    else:
        pipeline = Pipeline(cfg, synthetic_dir=synthetic_dir,
                            install_signal_handlers=False)
        if args.ckpt:
            pipeline.load_ckpt(args.ckpt)
        eval_set = pipeline.val_set or pipeline.train_set
        metrics = pipeline.evaluate(tb_prefix=args.split.upper())
        print({k: round(v, 6) for k, v in metrics.items()})

    if cfg["model"]["type"] == "box_reg" and eval_set is not None:
        # floor the regressor the way the reference does
        # (eval_utils.py:561-639): the dataset-mean box at the detection
        # center — the model's iou/loss_* above must beat these
        from planar_optical_flow_tpu.eval.baseline import mean_box_baseline

        base = mean_box_baseline(eval_set)
        print({("baseline_" + k): round(v, 6) for k, v in base.items()})

    # one resolution shared by --ap and --serve-flow (avoids resolving —
    # and printing — the engine choice twice)
    engine = calib = None
    if args.artifact:
        engine = "artifact"
        print({"ap_engine": "artifact", "artifact": args.artifact})
    elif args.ap or args.serve_flow:
        engine, calib = _resolve_ap_engine(args.engine, args.ckpt)
        if args.engine == "auto":
            print({"ap_engine": engine})

    if args.ap and cfg["model"]["type"] in ("dr-spaam", "spatial_drow",
                                            "flow_drow", "drow"):
        from planar_optical_flow_tpu.eval import evaluate_detection_ap_batched
        ds = eval_set
        if artifact_engine is not None:
            from planar_optical_flow_tpu.eval.evaluator import (
                DetectionEvalFrames,
            )

            frames = DetectionEvalFrames.from_dataset(ds)
            b = _artifact_eval_batch(artifact_engine.meta, len(frames),
                                     frames.scans.shape[1], parser)
            ap = evaluate_detection_ap_batched(
                None, None, None, frames, step=artifact_engine,
                batch_streams=b)
        else:
            ap = evaluate_detection_ap_batched(
                pipeline.model, pipeline.state.variables,
                cfg["dataset"].get("cutout_kwargs", {}), ds,
                engine=engine, calib=calib,
            )
        print({k: round(v, 6) if isinstance(v, float) else v
               for k, v in ap.items()})

    if args.serve_flow:
        from planar_optical_flow_tpu.eval import evaluate_flow_serving

        ds = eval_set
        if artifact_engine is not None:
            from planar_optical_flow_tpu.infer.streaming import (
                StreamingRunner,
            )

            runner = StreamingRunner.from_artifact(artifact_engine)
            # dataset scan width from the data itself (falling back to
            # meta would make the width check vacuous)
            if hasattr(ds, "scans_flat"):
                num_pts = int(np.shape(ds.scans_flat)[-1])
            else:
                num_pts = int(
                    np.shape(ds.batch(np.arange(1))["scans"])[-1])
            b = _artifact_eval_batch(runner.meta, len(ds), num_pts, parser,
                                     pick="coverage")
            flow = evaluate_flow_serving(
                None, None, None, ds, runner=runner,
                num_pts=num_pts, batch_streams=b,
            )
        else:
            flow = evaluate_flow_serving(
                pipeline.model, pipeline.state.variables,
                cfg["dataset"].get("cutout_kwargs", {}), ds,
                engine=engine, calib=calib,
            )
        print({("serve_" + k): round(v, 6) if isinstance(v, float) else v
               for k, v in flow.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
