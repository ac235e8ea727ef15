#!/usr/bin/env python
"""Export a stateless (non-streaming) model's batch inference as an AOT
artifact (StableHLO via ``jax.export``) — the deployment counterpart of
``bin/export_serving.py`` for the flow U-Net, box-regression, and
fc/polar-grid workloads, whose forward carries no template state.

    python bin/export_model.py --cfg configs/prototype_flow.yaml \
        --ckpt ./ckpts/flow_e40 --out ./engines/flow_b1024 --batch 64,1024

The artifact directory (``model_b{B}.bin`` / ``model.json``) loads with
``infer.load_model(path)`` and is called like the model's forward —
``engine(scan_xy, scan_xy_next)`` for the flow U-Net,
``engine(segments)`` for the box regressor — with NO model code or
checkpoint on the serving host. Shapes are static; ``--batch`` takes a
comma list and the loaded engine routes on the input's batch.
``BoxRegressor.from_artifact(dir, cfg)`` runs the full box-regression
API (radius crop, resample, de-canonicalization) on an exported network.

Streaming detectors (flow_drow / dr-spaam / spatial_drow) carry template
state — export those with ``bin/export_serving.py`` instead.
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
                             "fresh-init artifact, e.g. smoke tests)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", default="256",
                        help="batch size(s) baked into the artifact; a "
                             "comma list exports one program per batch "
                             "and the loaded engine routes on the "
                             "input's batch")
    parser.add_argument("--num-pts", type=int, default=450,
                        help="points per scan baked into flow / fc "
                             "exports (box_reg uses the dataset's "
                             "input_size instead)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    from planar_optical_flow_tpu.utils.cli import (force_cpu_backend,
                                                   parse_batches)

    batches = parse_batches(parser, args.batch)
    if args.cpu:
        force_cpu_backend()

    import optax

    from planar_optical_flow_tpu.infer.export import export_model
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.models.registry import STREAMING_MODEL_TYPES
    from planar_optical_flow_tpu.pipeline import (_example_inputs,
                                                  normalize_config)
    from planar_optical_flow_tpu.train import checkpoint as ckpt_lib
    from planar_optical_flow_tpu.train.state import create_train_state
    from planar_optical_flow_tpu.utils.config import load_config

    cfg = normalize_config(load_config(args.cfg))
    mtype = cfg["model"]["type"]
    if mtype in STREAMING_MODEL_TYPES:
        parser.error(
            f"{mtype!r} is a streaming detector (template-state carry); "
            f"export it with bin/export_serving.py")
    model = get_model(cfg["model"])

    state = create_train_state(model, _example_inputs(cfg, 1,
                                                      num_pts=args.num_pts),
                               optax.identity(),
                               init_kwargs={"train": False})
    if args.ckpt:
        state = ckpt_lib.restore_variables(args.ckpt, state)
    variables = state.variables

    def fn(*inputs):
        return model.apply(variables, *inputs, train=False)

    sigs = [_example_inputs(cfg, b, num_pts=args.num_pts) for b in batches]
    export_model(args.out, fn, sigs, meta={
        "model_type": mtype,
        "cfg": os.path.abspath(args.cfg),
        "ckpt": os.path.abspath(args.ckpt) if args.ckpt else None,
    })
    sizes = sum(os.path.getsize(os.path.join(args.out, f))
                for f in os.listdir(args.out)) / 1e6
    print(f"exported {mtype} batch-inference artifact (batch "
          f"{','.join(map(str, batches))}) -> {args.out} "
          f"({sizes:.2f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
