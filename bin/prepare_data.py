#!/usr/bin/env python
"""Offline ETL: derive ``.difodom`` and ``.flow`` files for DROW splits
(reference ``bin/data_prepare.py``):

    python bin/prepare_data.py --data-dir data/DROWv2-data --split train val test
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
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--split", nargs="+", default=["train", "val", "test"])
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from planar_optical_flow_tpu.data.prepare import prepare_split

    for split in args.split:
        stems = prepare_split(args.data_dir, split)
        print(f"{split}: {len(stems)} sequences prepared")
    return 0


if __name__ == "__main__":
    sys.exit(main())
