#!/usr/bin/env python
"""Unified training entry point.

Same CLI surface as the reference entry points
(``train_box_regression.py:71-79``, ``bin/train_dr_spaam.py:22-25``):

    python bin/train.py --cfg configs/dr_spaam.yaml [--ckpt PATH] [--cont]
                        [--tag TAG] [--evaluation] [--synthetic DIR]

``--cont`` resumes from the process-agnostic sigterm checkpoint (preemption
contract); ``--synthetic DIR`` generates data on the fly for smoke runs.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# allow `python bin/<tool>.py` without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--cont", action="store_true",
                        help="resume from sigterm checkpoint")
    parser.add_argument("--tag", default="")
    parser.add_argument("--evaluation", action="store_true")
    parser.add_argument("--synthetic", default=None,
                        help="generate synthetic data under DIR and train on it")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from planar_optical_flow_tpu.utils.config import load_config
    from planar_optical_flow_tpu.pipeline import Pipeline, normalize_config

    cfg = load_config(args.cfg, tag=args.tag)
    cfg = normalize_config(cfg)

    synthetic_dir = None
    if args.synthetic:
        synthetic_dir = _make_synthetic(cfg, args.synthetic)

    pipeline = Pipeline(cfg, synthetic_dir=synthetic_dir)

    if args.ckpt:
        pipeline.load_ckpt(args.ckpt)
    elif args.cont and pipeline.sigterm_ckpt_exists():
        pipeline.load_sigterm_ckpt()

    if args.evaluation:
        metrics = pipeline.evaluate()
        print({k: round(v, 6) for k, v in metrics.items()})
        return 0

    rc = pipeline.train()
    if rc == 0:
        pipeline.save_ckpt()
        metrics = pipeline.evaluate()
        pipeline.logger.save_dict("final_metrics", metrics)
    return rc


def _make_synthetic(cfg, out_dir):
    from planar_optical_flow_tpu.data import write_synthetic_drow_split
    from planar_optical_flow_tpu.data.prepare import prepare_split
    from planar_optical_flow_tpu.data.jrdb import write_synthetic_jrdb

    if cfg["model"]["type"] == "box_reg":
        write_synthetic_jrdb(out_dir)
        return out_dir
    write_synthetic_drow_split(out_dir, "train", num_sequences=2,
                               num_frames=40)
    write_synthetic_drow_split(out_dir, "val", num_sequences=1,
                               num_frames=15, seed=9)
    prepare_split(out_dir, "train", verbose=False)
    prepare_split(out_dir, "val", verbose=False)
    return out_dir


if __name__ == "__main__":
    sys.exit(main())
