#!/usr/bin/env python
"""Export the fused serving pipeline as an AOT artifact (StableHLO +
Mosaic custom calls, via ``jax.export``).

    python bin/export_serving.py --cfg configs/dr_spaam.yaml \
        --ckpt ./ckpts/dr_spaam_e40 --out ./engines/drspaam_b128 \
        --batch 128 --engine int8c

The artifact directory (``boot.bin`` / ``step.bin`` / ``engine.json``)
is loaded with ``infer.load_serving_engine(path)`` and called like the
live step — ``engine(carry, scan)``, ``carry=None`` boots a stream — on
a host that needs neither the model code, the checkpoint, nor the int8
calibration. Shapes are static; ``--batch 1,64,128`` exports one program
pair per batch size (``boot_b{B}.bin``/``step_b{B}.bin``) into the same
artifact, and the loaded engine routes on the incoming scan's batch.

``--engine int8c`` (flagship) needs the int8 scales: a ``calibration.json``
next to the checkpoint (``bin/infer.py --save-calib``), or ``--calib``.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--ckpt", default=None,
                        help="orbax checkpoint directory (omit for a "
                             "fresh-init engine, e.g. smoke tests)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", default="128",
                        help="number of concurrent streams baked into the "
                             "artifact; a comma list (e.g. 1,64,128) "
                             "exports one program pair per batch into the "
                             "same artifact and the loaded engine routes "
                             "on the incoming scan's batch")
    parser.add_argument("--engine", choices=("int8c", "bf16"),
                        default="int8c")
    parser.add_argument("--calib", default=None,
                        help="calibration.json (or its directory) for "
                             "--engine int8c; defaults to one next to "
                             "--ckpt")
    parser.add_argument("--num-pts", type=int, default=450)
    parser.add_argument("--tile", type=int, default=128)
    parser.add_argument("--fields", default=None,
                        help="comma list of output fields to bake into "
                             "the artifact (e.g. "
                             "pred_flow,det_xys,det_cls,det_keep); XLA "
                             "dead-code-eliminates the dropped epilogues "
                             "at export, so a lean artifact is a leaner "
                             "program, not a filtered dict (~+300 "
                             "scans/s at B=128 without instance_mask). "
                             "Default: the full contract")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    from planar_optical_flow_tpu.utils.cli import (force_cpu_backend,
                                                   parse_batches)

    batches = parse_batches(parser, args.batch)
    if args.cpu:
        force_cpu_backend()

    import jax
    import numpy as np
    import optax

    from planar_optical_flow_tpu.infer import ServeCalibration
    from planar_optical_flow_tpu.infer.export import export_serving_engine
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.models.registry import STREAMING_MODEL_TYPES
    from planar_optical_flow_tpu.pipeline import (_example_inputs,
                                                  normalize_config)
    from planar_optical_flow_tpu.train import checkpoint as ckpt_lib
    from planar_optical_flow_tpu.train.state import create_train_state
    from planar_optical_flow_tpu.utils.config import load_config

    cfg = normalize_config(load_config(args.cfg))
    # the serve-v3 pipeline is built around the attention-gate cell, so
    # only the gated detector families export (a plain "drow" would crash
    # inside make_serve_step_v3 on the missing gate subtree)
    if cfg["model"]["type"] not in STREAMING_MODEL_TYPES:
        parser.error(f"serving export supports the gated streaming "
                     f"detectors ({'/'.join(STREAMING_MODEL_TYPES)}), "
                     f"not {cfg['model']['type']!r}")
    model = get_model(cfg["model"])

    state = create_train_state(model, _example_inputs(cfg, 1),
                               optax.identity(),
                               init_kwargs={"train": False})
    if args.ckpt:
        state = ckpt_lib.restore_variables(args.ckpt, state)

    calib = None
    if args.engine == "int8c":
        if args.calib:
            calib = ServeCalibration.load(args.calib)
        elif args.ckpt:
            calib = ServeCalibration.find(args.ckpt)
        if calib is None:
            parser.error(
                "--engine int8c needs int8 scales: persist one with "
                "`bin/infer.py --engine int8c --save-calib <ckpt_dir>` or "
                "pass --calib")
    elif args.calib:
        # same contract as bin/infer.py: fail loudly instead of silently
        # exporting an uncalibrated engine
        parser.error("--calib requires --engine int8c")

    # pallas kernels need interpret mode off-TPU; either way the export
    # is stamped with its lowering platform (engine.json "platforms") and
    # only runs on that platform family — TPU exports for deployment,
    # CPU (interpret) exports for CPU hosts and the test suite
    interpret = jax.default_backend() == "cpu"
    fields = tuple(args.fields.split(",")) if args.fields else None
    step = make_serve_step_v3(
        model, state.variables,
        cfg["dataset"].get("cutout_kwargs", {}),
        calib=calib, num_pts=args.num_pts,
        precision=args.engine, tile=args.tile, output_fields=fields,
        interpret=interpret)

    scan_spec = [jax.ShapeDtypeStruct((b, args.num_pts), np.float32)
                 for b in batches]
    if len(scan_spec) == 1:
        scan_spec = scan_spec[0]
    export_serving_engine(args.out, step, scan_spec, meta={
        "engine": args.engine,
        "model_type": cfg["model"]["type"],
        "cfg": os.path.abspath(args.cfg),
        "ckpt": os.path.abspath(args.ckpt) if args.ckpt else None,
        "interpret": interpret,
        "output_fields": list(fields) if fields else None,
    })
    sizes = {f: os.path.getsize(os.path.join(args.out, f))
             for f in os.listdir(args.out)}
    total = sum(sizes.values()) / 1e6
    print(f"exported {args.engine} serving engine (batch "
          f"{','.join(map(str, batches))}, {args.num_pts} pts) -> "
          f"{args.out} ({total:.2f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
