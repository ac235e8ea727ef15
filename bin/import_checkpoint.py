#!/usr/bin/env python
"""Import a reference (PyTorch) ``.pth`` checkpoint into this framework.

    python bin/import_checkpoint.py --pth dr_spaam_e40.pth \
        --cfg configs/dr_spaam.yaml --out ./ckpt_imported

Reads the reference checkpoint envelope (``{"epoch", "it"|"step",
"model_state", ...}`` — reference ``src/utils/train_utils.py:8-22`` /
``src/pipeline/logger.py:158-177``) or a bare ``state_dict``, re-layouts
the torch weights into this repo's flax variable tree for the model the
config describes, and writes an orbax checkpoint that ``bin/train.py
--ckpt``, ``bin/evaluate.py`` and ``bin/infer.py`` accept. The torch
optimizer state is not imported (optax state is re-initialized); the
epoch/step counters are carried.

For ``flow_drow`` configs the checkpoint may be either a full
FlowDROW_pretrained state_dict (detector imported, broken reference flow
head skipped) or a plain pre-trained SpatialDROW detector checkpoint
(grafted into the ``dr_spaam`` subtree) — see
``planar_optical_flow_tpu/interop/torch_ckpt.py``.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pth", required=True,
                        help="reference .pth checkpoint (envelope or bare "
                             "state_dict)")
    parser.add_argument("--cfg", required=True,
                        help="config describing the target model (the "
                             "model kwargs must match the checkpoint's "
                             "architecture)")
    parser.add_argument("--out", required=True,
                        help="output orbax checkpoint directory")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import optax

    from planar_optical_flow_tpu.interop import (import_state_dict,
                                                 load_reference_checkpoint)
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.pipeline import (_example_inputs,
                                                  normalize_config)
    from planar_optical_flow_tpu.train.checkpoint import save_checkpoint
    from planar_optical_flow_tpu.train.state import create_train_state
    from planar_optical_flow_tpu.utils.config import load_config

    cfg = normalize_config(load_config(args.cfg))
    model_type = cfg["model"]["type"]
    model = get_model(cfg["model"])

    sd, meta = load_reference_checkpoint(args.pth)
    state = create_train_state(model, _example_inputs(cfg, 1),
                               optax.identity(),
                               init_kwargs={"train": False})
    variables = import_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats},
        sd, model_type)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          epoch=meta["epoch"], step=meta["step"])
    path = save_checkpoint(args.out, state)
    n_params = sum(p.size for p in __import__("jax").tree_util.tree_leaves(
        variables["params"]))
    print(f"imported {args.pth} (model {model_type!r}, epoch {meta['epoch']}"
          f", step {meta['step']}, {n_params:,} params) -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
