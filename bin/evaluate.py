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
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

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

    synthetic_dir = None
    if args.synthetic:
        from bin.train import _make_synthetic

        synthetic_dir = _make_synthetic(cfg, args.synthetic)

    pipeline = Pipeline(cfg, synthetic_dir=synthetic_dir,
                        install_signal_handlers=False)
    if args.ckpt:
        pipeline.load_ckpt(args.ckpt)

    metrics = pipeline.evaluate(tb_prefix=args.split.upper())
    print({k: round(v, 6) for k, v in metrics.items()})

    # one resolution shared by --ap and --serve-flow (avoids resolving —
    # and printing — the engine choice twice)
    engine = calib = None
    if args.ap or args.serve_flow:
        engine, calib = _resolve_ap_engine(args.engine, args.ckpt)
        if args.engine == "auto":
            print({"ap_engine": engine})

    if args.ap and cfg["model"]["type"] in ("dr-spaam", "spatial_drow",
                                            "flow_drow", "drow"):
        from planar_optical_flow_tpu.eval import evaluate_detection_ap_batched
        ds = pipeline.val_set or pipeline.train_set
        ap = evaluate_detection_ap_batched(
            pipeline.model, pipeline.state.variables,
            cfg["dataset"].get("cutout_kwargs", {}), ds,
            engine=engine, calib=calib,
        )
        print({k: round(v, 6) if isinstance(v, float) else v
               for k, v in ap.items()})

    if args.serve_flow:
        from planar_optical_flow_tpu.eval import evaluate_flow_serving

        flow = evaluate_flow_serving(
            pipeline.model, pipeline.state.variables,
            cfg["dataset"].get("cutout_kwargs", {}),
            pipeline.val_set or pipeline.train_set,
            engine=engine, calib=calib,
        )
        print({("serve_" + k): round(v, 6) if isinstance(v, float) else v
               for k, v in flow.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
