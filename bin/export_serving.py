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
calibration. One artifact per batch size (static shapes).

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
    parser.add_argument("--batch", type=int, default=128,
                        help="number of concurrent streams baked into the "
                             "artifact")
    parser.add_argument("--engine", choices=("int8c", "bf16"),
                        default="int8c")
    parser.add_argument("--calib", default=None,
                        help="calibration.json (or its directory) for "
                             "--engine int8c; defaults to one next to "
                             "--ckpt")
    parser.add_argument("--num-pts", type=int, default=450)
    parser.add_argument("--tile", type=int, default=128)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from planar_optical_flow_tpu.infer import ServeCalibration
    from planar_optical_flow_tpu.infer.export import export_serving_engine
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.pipeline import normalize_config
    from planar_optical_flow_tpu.train import checkpoint as ckpt_lib
    from planar_optical_flow_tpu.train.state import create_train_state
    from planar_optical_flow_tpu.utils.config import load_config

    cfg = normalize_config(load_config(args.cfg))
    if cfg["model"]["type"] not in ("flow_drow", "dr-spaam", "drow",
                                    "spatial_drow"):
        parser.error(f"serving export supports the streaming detector "
                     f"models, not {cfg['model']['type']!r}")
    model = get_model(cfg["model"])

    n_ct = cfg["dataset"].get("cutout_kwargs", {}).get("num_cutout_pts", 48)
    x = jnp.zeros((1, args.num_pts, 2, n_ct))
    example = ((x, jnp.zeros((1, args.num_pts)))
               if cfg["model"]["type"] == "flow_drow" else (x,))
    state = create_train_state(model, example, optax.identity(),
                               init_kwargs={"train": False})
    if args.ckpt:
        state = ckpt_lib.restore_variables(args.ckpt, state)

    calib = calib_scans = None
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

    # pallas kernels need interpret mode off-TPU; the interpret-mode
    # export is pure StableHLO (runs anywhere), the TPU export embeds
    # Mosaic custom calls (runs on compatible TPUs)
    interpret = jax.default_backend() == "cpu"
    step = make_serve_step_v3(
        model, state.variables,
        cfg["dataset"].get("cutout_kwargs", {}),
        calib_scans=calib_scans, calib=calib, num_pts=args.num_pts,
        precision=args.engine, tile=args.tile, interpret=interpret)

    scan_spec = jax.ShapeDtypeStruct((args.batch, args.num_pts), np.float32)
    export_serving_engine(args.out, step, scan_spec, meta={
        "engine": args.engine,
        "model_type": cfg["model"]["type"],
        "cfg": os.path.abspath(args.cfg),
        "ckpt": os.path.abspath(args.ckpt) if args.ckpt else None,
        "interpret": interpret,
    })
    sizes = {f: os.path.getsize(os.path.join(args.out, f))
             for f in os.listdir(args.out)}
    total = sum(sizes.values()) / 1e6
    print(f"exported {args.engine} serving engine (batch {args.batch}, "
          f"{args.num_pts} pts) -> {args.out} ({total:.2f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
