"""``bin/validate_corpus.py``: the single-command real-corpus validator.

No real corpus is mounted in this environment (STATUS.md), so the CLI is
exercised exactly the way it will fire on the real thing: against
synthetic trees in both layouts, including deliberately corrupted files
(the manifest must localize the failure and the exit code must go
nonzero) and a checkpoint-scoring pass.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bin.validate_corpus as cli
from planar_optical_flow_tpu.data import write_synthetic_drow_split
from planar_optical_flow_tpu.data.jrdb import write_synthetic_jrdb


@pytest.fixture
def drow_root(tmp_path):
    root = str(tmp_path / "drow")
    write_synthetic_drow_split(root, "train", num_sequences=2,
                               num_frames=24, num_pts=48)
    write_synthetic_drow_split(root, "val", num_sequences=1,
                               num_frames=16, num_pts=48, seed=7)
    return root


def test_validate_drow_corpus_passes(drow_root, tmp_path):
    out = str(tmp_path / "manifest.json")
    rc = cli.main([drow_root, "--out", out])
    assert rc == 0
    doc = json.load(open(out))
    assert doc["layout"] == "drow" and doc["ok"]
    names = [s["stage"] for s in doc["stages"]]
    assert any("read train/" in n for n in names)
    assert any("prepare flow targets" in n for n in names)
    assert any("train step" in n for n in names)
    # corpus untouched: prepare ran on a temp copy
    assert not any(f.endswith((".flow", ".difodom"))
                   for f in os.listdir(os.path.join(drow_root, "train")))


def test_validate_drow_corpus_localizes_corruption(drow_root, tmp_path):
    # ragged CSV line in one sequence; truncated JSON in another's .wc
    seq0 = os.path.join(drow_root, "train", "synth_train_0")
    with open(seq0 + ".csv", "a") as f:
        f.write("7,0.5,1.0\n")  # 3 cols instead of 2+48 ranges
    seq1 = os.path.join(drow_root, "train", "synth_train_1")
    lines = open(seq1 + ".wc").read().splitlines()
    lines[0] = lines[0][: len(lines[0]) // 2]  # torn JSON tail
    open(seq1 + ".wc", "w").write("\n".join(lines))

    out = str(tmp_path / "manifest.json")
    rc = cli.main([drow_root, "--out", out])
    assert rc == 1
    doc = json.load(open(out))
    assert not doc["ok"]
    failed = {s["stage"]: s["detail"] for s in doc["stages"]
              if not s["ok"]}
    assert any("synth_train_0" in k for k in failed)
    assert any("synth_train_1" in k for k in failed)
    # failure details name the offending file
    assert any("synth_train_0.csv" in d for d in failed.values())
    assert any(".wc" in d for d in failed.values())
    # the clean val sequence still validated (no fail-fast)
    ok = [s["stage"] for s in doc["stages"] if s["ok"]]
    assert any("read val/" in n for n in ok)


def test_validate_jrdb_corpus_passes_and_flags_corrupt_pcd(tmp_path):
    root = str(tmp_path / "jrdb")
    write_synthetic_jrdb(root, num_frames=3, boxes_per_frame=4)
    rc = cli.main([root, "--out", str(tmp_path / "m.json")])
    assert rc == 0
    doc = json.load(open(tmp_path / "m.json"))
    assert doc["layout"] == "jrdb" and doc["ok"]

    # truncate one binary_compressed PCD: the LZF decoder must reject it
    from glob import glob

    pcd = sorted(glob(os.path.join(
        root, "train_dataset", "pointclouds", "*", "*", "*.pcd")))[0]
    blob = open(pcd, "rb").read()
    open(pcd, "wb").write(blob[: len(blob) - len(blob) // 3])
    rc = cli.main([root, "--out", str(tmp_path / "m2.json")])
    assert rc == 1
    doc = json.load(open(tmp_path / "m2.json"))
    failed = [s for s in doc["stages"] if not s["ok"]]
    assert failed and any("read frames" in s["stage"] or "PCD" in s["stage"]
                          for s in failed)


@pytest.mark.slow
def test_validate_drow_scores_checkpoint(drow_root, tmp_path):
    """--checkpoint <orbax dir> --score-ap imports the weights and reports
    an AP over the val split (the .pth import branch shares
    interop.import_torch_checkpoint, parity-tested elsewhere)."""
    from planar_optical_flow_tpu.models import SpatialDrow
    from planar_optical_flow_tpu.train import (create_train_state,
                                               make_optimizer)
    from planar_optical_flow_tpu.train import checkpoint as ckpt_lib

    model = SpatialDrow(window_size=11, alpha=0.5, pedestrian_only=True)
    x = jnp.zeros((1, 48, 1, 56))
    tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=1)
    state = create_train_state(model, (x,), tx,
                               init_kwargs={"train": False})
    ck = str(tmp_path / "ckpt")
    ckpt_lib.save_checkpoint(ck, state)

    out = str(tmp_path / "manifest.json")
    rc = cli.main([drow_root, "--checkpoint", ck, "--score-ap",
                   "--engine", "module", "--max-frames", "8",
                   "--out", out])
    assert rc == 0
    doc = json.load(open(out))
    score = [s for s in doc["stages"] if s["stage"].startswith("score")]
    assert len(score) == 1 and score[0]["ok"]
    assert "AP" in score[0]["detail"]
