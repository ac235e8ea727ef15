"""AOT serving-engine export (``infer/export.py`` + ``bin/export_serving``).

The CPU/interpret export is pure StableHLO, so the full artifact contract
— export, reload from disk, bit-identical execution against the live
jitted pipeline across boot + carried steps — is testable here; the
TPU-side (Mosaic custom call) roundtrip is ``experiments/probe_export.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml


def _tiny_engine(num_pts=64, batch=4, precision="int8c"):
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1, num_pts)),
                           train=False)
    rng = np.random.default_rng(0)
    calib = rng.uniform(0.5, 20.0, (batch, num_pts)).astype(np.float32)
    step = make_serve_step_v3(model, variables, cutout_kwargs,
                              calib_scans=calib, num_pts=num_pts,
                              precision=precision, tile=16, interpret=True)
    return step, rng


def test_export_roundtrip_bit_identical(tmp_path):
    from planar_optical_flow_tpu.infer import (export_serving_engine,
                                               load_serving_engine)

    num_pts, batch = 64, 4
    step, rng = _tiny_engine(num_pts, batch)
    scan_spec = jax.ShapeDtypeStruct((batch, num_pts), np.float32)
    out_dir = export_serving_engine(str(tmp_path / "engine"), step,
                                    scan_spec, meta={"engine": "int8c"})

    engine = load_serving_engine(out_dir)
    assert engine.meta["batch"] == batch
    assert engine.meta["engine"] == "int8c"

    live = jax.jit(step.raw_step)
    live_boot = jax.jit(lambda s: step.raw_step(None, s))

    carry_l = carry_e = None
    for i in range(3):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (batch, num_pts)),
                           jnp.float32)
        if i == 0:
            carry_l, want = live_boot(scan)
            carry_e, got = engine(None, scan)
        else:
            carry_l, want = live(carry_l, scan)
            carry_e, got = engine(carry_e, scan)
        for a, b in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"step {i}")


def test_export_cli_end_to_end(tmp_path):
    import bin.export_serving as cli
    from planar_optical_flow_tpu.infer import load_serving_engine

    cfg = {
        "network": "cutout_spatial", "num_scans": 2,
        "pedestrian_only": True,
        "similarity_kwargs": {"alpha": 0.5, "window_size": 5},
        "cutout_kwargs": {"fixed": True, "centered": True,
                          "window_width": 1.0, "window_depth": 0.5,
                          "num_cutout_pts": 16, "padding_val": 29.99,
                          "area_mode": True, "gather_mode": "matmul"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "engine"
    assert cli.main(["--cfg", str(cfg_path), "--out", str(out),
                     "--batch", "4", "--num-pts", "64", "--tile", "16",
                     "--engine", "bf16", "--cpu"]) == 0

    engine = load_serving_engine(str(out))
    assert engine.meta["model_type"] == "flow_drow"
    rng = np.random.default_rng(1)
    carry = None
    for _ in range(2):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (4, 64)), jnp.float32)
        carry, out_d = engine(carry, scan)
    assert out_d["pred_cls"].shape == (4, 64, 1)
    assert np.isfinite(np.asarray(out_d["pred_flow"])).all()


def test_export_cli_int8c_requires_calibration(tmp_path):
    import bin.export_serving as cli

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({"network": "cutout_spatial"}))
    with pytest.raises(SystemExit):
        cli.main(["--cfg", str(cfg_path), "--out", str(tmp_path / "e"),
                  "--engine", "int8c", "--cpu"])


def test_infer_cli_runs_artifact(tmp_path):
    """Deployment flow: export an engine (batch 1), then run
    ``bin/infer.py --artifact`` on a scan sequence — no cfg/ckpt on the
    serving side."""
    import bin.export_serving as export_cli
    import bin.infer as infer_cli

    num_pts = 64
    cfg = {
        "network": "cutout_spatial", "pedestrian_only": True,
        "similarity_kwargs": {"alpha": 0.5, "window_size": 5},
        "cutout_kwargs": {"fixed": True, "centered": True,
                          "window_width": 1.0, "window_depth": 0.5,
                          "num_cutout_pts": 16, "padding_val": 29.99,
                          "area_mode": True, "gather_mode": "matmul"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    engine_dir = tmp_path / "engine"
    assert export_cli.main(["--cfg", str(cfg_path), "--out",
                            str(engine_dir), "--batch", "1", "--num-pts",
                            str(num_pts), "--tile", "16", "--engine",
                            "bf16", "--cpu"]) == 0

    # a DROW-format scan csv ([seq, t, ranges...]) with num_pts beams
    rng = np.random.default_rng(2)
    t = np.arange(5, dtype=np.float64)[:, None]
    rows = np.hstack([np.arange(5)[:, None], t,
                      rng.uniform(0.5, 20.0, (5, num_pts))])
    seq = tmp_path / "seq.csv"
    np.savetxt(seq, rows, fmt="%.6f", delimiter=",")

    rc = infer_cli.main(["--artifact", str(engine_dir), "--sequence",
                         str(seq), "--cpu"])
    assert rc in (0, None)

    # self-containedness guards: conflicting flags error out
    with pytest.raises(SystemExit):
        infer_cli.main(["--artifact", str(engine_dir), "--cfg",
                        str(cfg_path), "--sequence", str(seq), "--cpu"])


def test_export_guards(tmp_path):
    """Review-pass guards: platform mismatch at load, --engine with
    --artifact, bf16 --calib, and non-gated model types all fail loudly."""
    import json

    import bin.export_serving as export_cli
    import bin.infer as infer_cli
    from planar_optical_flow_tpu.infer import (export_serving_engine,
                                               load_serving_engine)

    step, _ = _tiny_engine(64, 2)
    out = export_serving_engine(str(tmp_path / "e"), step,
                                jax.ShapeDtypeStruct((2, 64), np.float32))

    # artifact exported for another platform -> readable load-time error
    meta_path = tmp_path / "e" / "engine.json"
    meta = json.loads(meta_path.read_text())
    meta["platforms"] = ["tpu"]
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="exported for platform"):
        load_serving_engine(str(tmp_path / "e"))

    # computed metadata is authoritative over builder extras
    step2, _ = _tiny_engine(64, 2)
    out2 = export_serving_engine(str(tmp_path / "e2"), step2,
                                 jax.ShapeDtypeStruct((2, 64), np.float32),
                                 meta={"batch": 999})
    meta2 = json.loads((tmp_path / "e2" / "engine.json").read_text())
    assert meta2["batch"] == 2

    # --engine contradicts the artifact's baked-in engine
    with pytest.raises(SystemExit):
        infer_cli.main(["--artifact", str(tmp_path / "e2"), "--engine",
                        "int8c", "--sequence", "x.csv", "--cpu"])

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({"network": "cutout_spatial"}))
    # --calib is meaningless for bf16 exports
    with pytest.raises(SystemExit):
        export_cli.main(["--cfg", str(cfg_path), "--out",
                         str(tmp_path / "e3"), "--engine", "bf16",
                         "--calib", "nope.json", "--cpu"])
    # plain DROW (no gate) cannot serve on the v3 pipeline
    cfg_path.write_text(yaml.safe_dump({"network": "cutout"}))
    with pytest.raises(SystemExit):
        export_cli.main(["--cfg", str(cfg_path), "--out",
                         str(tmp_path / "e4"), "--engine", "bf16", "--cpu"])


def test_export_multi_batch_routing(tmp_path):
    """One artifact holding several batch sizes: the loaded engine routes
    on the incoming scan's batch, each program bit-identical to the live
    pipeline at its size; an un-exported batch raises with the list."""
    from planar_optical_flow_tpu.infer import (export_serving_engine,
                                               load_serving_engine)

    num_pts = 64
    step, rng = _tiny_engine(num_pts, 4)
    specs = [jax.ShapeDtypeStruct((b, num_pts), np.float32) for b in (1, 4)]
    out_dir = export_serving_engine(str(tmp_path / "engine"), step, specs,
                                    meta={"engine": "int8c"})
    engine = load_serving_engine(out_dir)
    assert engine.meta["batches"] == [1, 4]
    assert engine.meta["batch"] is None

    live_boot = jax.jit(lambda s: step.raw_step(None, s))
    for b in (1, 4):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (b, num_pts)), jnp.float32)
        _, want = live_boot(scan)
        _, got = engine(None, scan)
        for a, e in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(e),
                                          err_msg=f"batch {b}")

    with pytest.raises(ValueError, match=r"batches \[1, 4\]"):
        engine(None, jnp.zeros((2, num_pts), jnp.float32))

    # export-side validation
    with pytest.raises(ValueError, match="duplicate"):
        export_serving_engine(str(tmp_path / "dup"), step,
                              [specs[0], specs[0]])


def test_reexport_removes_stale_programs(tmp_path):
    """Re-exporting into an existing directory must not leave program
    files from a previous batch list on disk next to the new
    engine.json (stale programs may come from different weights)."""
    import os

    from planar_optical_flow_tpu.infer import (export_serving_engine,
                                               load_serving_engine)

    num_pts = 64
    step, rng = _tiny_engine(num_pts, 4)
    out = str(tmp_path / "engine")
    specs_a = [jax.ShapeDtypeStruct((b, num_pts), np.float32)
               for b in (1, 4)]
    export_serving_engine(out, step, specs_a)
    assert os.path.exists(os.path.join(out, "boot_b1.bin"))

    # re-export with a different batch list: b1 programs must be gone,
    # and the new programs live under generation-unique names the old
    # meta never referenced (crash-safe re-export)
    export_serving_engine(
        out, step, jax.ShapeDtypeStruct((4, num_pts), np.float32))
    names = set(os.listdir(out))
    assert "boot_b1.bin" not in names and "step_b1.bin" not in names
    engine = load_serving_engine(out)
    assert engine.meta["generation"] == 1
    referenced = {n for pair in engine.meta["files"].values() for n in pair}
    assert referenced <= names
    scan = jnp.asarray(rng.uniform(0.5, 20.0, (4, num_pts)), jnp.float32)
    engine(None, scan)

    # a further re-export prunes every unreferenced program file
    export_serving_engine(out, step, specs_a)
    meta = load_serving_engine(out).meta
    keep = {n for pair in meta["files"].values() for n in pair}
    bins = {n for n in os.listdir(out) if n.endswith(".bin")}
    assert bins == keep and meta["generation"] == 2


@pytest.mark.slow
def test_artifact_eval_surfaces(tmp_path):
    """Deployment QA: a shipped artifact is scoreable through the
    evaluation surfaces — ``evaluate_detection_ap_batched(step=engine)``
    and ``evaluate_flow_serving(runner=StreamingRunner.from_artifact)`` —
    with numbers identical to the live jitted step (the exported
    programs are bit-identical, so the scores must be too)."""
    from planar_optical_flow_tpu.eval import (
        evaluate_detection_ap_batched, evaluate_flow_serving,
    )
    from planar_optical_flow_tpu.eval.evaluator import DetectionEvalFrames
    from planar_optical_flow_tpu.infer import (export_serving_engine,
                                               load_serving_engine)
    from planar_optical_flow_tpu.infer.streaming import StreamingRunner

    num_pts, batch = 64, 4
    step, rng = _tiny_engine(num_pts, batch)
    out_dir = export_serving_engine(
        str(tmp_path / "engine"), step,
        jax.ShapeDtypeStruct((batch, num_pts), np.float32),
        meta={"engine": "int8c", "model_type": "flow_drow"})
    engine = load_serving_engine(out_dir)

    # --- detection AP: loaded artifact vs live step, identical numbers
    t_frames = 10
    scans = rng.uniform(0.5, 20.0, (t_frames, num_pts)).astype(np.float32)
    gt = [rng.uniform(-5, 5, (int(rng.integers(0, 3)), 2)).astype(np.float32)
          for _ in range(t_frames)]
    frames = DetectionEvalFrames(scans, gt)
    want = evaluate_detection_ap_batched(None, None, None, frames,
                                         step=step, batch_streams=batch)
    got = evaluate_detection_ap_batched(None, None, None, frames,
                                        step=engine, batch_streams=batch)
    assert got == want

    # --- flow EPE: artifact runner vs a shim around the live step
    class _LiveRunner:
        _engine = "live"
        _carry = None

        def reset(self, streams=None):
            self._carry = None

        def __call__(self, scan):
            self._carry, out = step(self._carry,
                                    jnp.asarray(scan, jnp.float32))
            return {k: np.asarray(v) for k, v in out.items()}

    class _Frames:
        use_augmentation = False

        def __init__(self):
            r = np.random.default_rng(7)
            self.scans = r.uniform(
                0.5, 20.0, (8, 2, num_pts)).astype(np.float32)
            self.target = r.normal(size=(8, num_pts, 2)).astype(np.float32)
            self.mask = np.ones((8, num_pts), np.float32)

        def __len__(self):
            return len(self.scans)

        def batch(self, idx):
            return {"scans": self.scans[idx],
                    "target_flow": self.target[idx],
                    "exclude_mask": self.mask[idx]}

    flow_live = evaluate_flow_serving(None, None, None, _Frames(),
                                      runner=_LiveRunner(),
                                      num_pts=num_pts, batch_streams=batch)
    flow_art = evaluate_flow_serving(None, None, None, _Frames(),
                                     runner=StreamingRunner.from_artifact(
                                         out_dir),
                                     num_pts=num_pts, batch_streams=batch)
    assert flow_art["epe"] == flow_live["epe"]
    assert flow_art["aae"] == flow_live["aae"]
    assert flow_art["engine"] == "artifact"
    assert flow_live["engine"] == "live"


def test_evaluate_cli_artifact_guards():
    """--artifact conflicts with --engine and needs a serving-path
    evaluation flag; the batch/num_pts selection helper validates the
    artifact metadata against the dataset."""
    import argparse

    import bin.evaluate as cli

    with pytest.raises(SystemExit):
        cli.main(["--cfg", "x.yaml", "--artifact", "d", "--engine",
                  "int8c", "--ap", "--cpu"])
    with pytest.raises(SystemExit):
        cli.main(["--cfg", "x.yaml", "--artifact", "d", "--cpu"])

    parser = argparse.ArgumentParser()
    meta = {"num_pts": 64, "batches": [1, 4, 128], "batch": None}
    assert cli._artifact_eval_batch(meta, 10, 64, parser) == 4
    assert cli._artifact_eval_batch(
        {"num_pts": 64, "batch": 2}, 10, 64, parser) == 2
    with pytest.raises(SystemExit):  # scan-width mismatch
        cli._artifact_eval_batch(meta, 10, 450, parser)
    with pytest.raises(SystemExit):  # every batch exceeds the frames
        cli._artifact_eval_batch(
            {"num_pts": 64, "batches": [64]}, 10, 64, parser)

    # pick="coverage" (the --serve-flow mode: the flow evaluator TRIMS to
    # whole batches): maximize scored frames, tie-break on larger batch
    meta2 = {"num_pts": 64, "batches": [2, 128], "batch": None}
    assert cli._artifact_eval_batch(  # 254 frames @ b=2 beats 128 @ b=128
        meta2, 255, 64, parser, pick="coverage") == 2
    assert cli._artifact_eval_batch(  # both score 256 -> larger batch
        meta2, 256, 64, parser, pick="coverage") == 128
    assert cli._artifact_eval_batch(  # "fit" would pick 128 and drop 127
        meta2, 255, 64, parser) == 128


def test_evaluate_cli_artifact_end_to_end(tmp_path):
    """The full deployment-QA flow: export an engine, then score the
    artifact itself with ``bin/evaluate.py --artifact --ap --serve-flow``
    — no checkpoint on the scoring side (the module-path metrics are
    skipped with a note; the artifact carries the serving programs)."""
    import bin.evaluate as eval_cli
    import bin.export_serving as export_cli

    cfg = {
        "network": "cutout_spatial", "num_scans": 2, "epochs": 1,
        "batch_size": 2, "pedestrian_only": True,
        "log_dir": str(tmp_path / "logs"),
        "similarity_kwargs": {"alpha": 0.5, "window_size": 5},
        "cutout_kwargs": {"fixed": True, "centered": True,
                          "window_width": 1.0, "window_depth": 0.5,
                          "num_cutout_pts": 16, "padding_val": 29.99,
                          "area_mode": True, "gather_mode": "matmul"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    engine_dir = tmp_path / "engine"
    assert export_cli.main(["--cfg", str(cfg_path), "--out",
                            str(engine_dir), "--batch", "2,4",
                            "--engine", "bf16", "--cpu"]) == 0
    rc = eval_cli.main(["--cfg", str(cfg_path), "--artifact",
                        str(engine_dir), "--ap", "--serve-flow",
                        "--synthetic", str(tmp_path / "data"), "--cpu"])
    assert rc == 0


def test_export_cli_multi_batch(tmp_path):
    """``--batch 1,2`` through the CLI; bad lists rejected."""
    import bin.export_serving as cli

    cfg = {
        "network": "cutout_spatial", "pedestrian_only": True,
        "similarity_kwargs": {"alpha": 0.5, "window_size": 5},
        "cutout_kwargs": {"fixed": True, "centered": True,
                          "window_width": 1.0, "window_depth": 0.5,
                          "num_cutout_pts": 16, "padding_val": 29.99,
                          "area_mode": True, "gather_mode": "matmul"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "engine"
    assert cli.main(["--cfg", str(cfg_path), "--out", str(out),
                     "--batch", "1,2", "--num-pts", "64", "--tile", "16",
                     "--engine", "bf16", "--cpu"]) == 0
    from planar_optical_flow_tpu.infer import load_serving_engine

    engine = load_serving_engine(str(out))
    assert engine.meta["batches"] == [1, 2]
    for b in (1, 2):
        carry, outp = engine(None, jnp.zeros((b, 64), jnp.float32))
        assert outp["pred_cls"].shape[0] == b

    with pytest.raises(SystemExit):
        cli.main(["--cfg", str(cfg_path), "--out", str(tmp_path / "x"),
                  "--batch", "1,zap", "--num-pts", "64", "--cpu"])


# ==========================================================================
# stateless-model artifacts (export_model / load_model / bin/export_model)
# ==========================================================================


def test_export_model_roundtrip_and_routing(tmp_path):
    """Flow U-Net batch inference exported/reloaded bit-identically, with
    per-batch program routing and stale-program cleanup on re-export."""
    from planar_optical_flow_tpu.infer import export_model, load_model
    from planar_optical_flow_tpu.models import FlowUNet

    model = FlowUNet()
    x = jnp.zeros((1, 64, 2))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)

    def fn(a, b):
        return model.apply(variables, a, b, train=False)

    sig = lambda b: (jax.ShapeDtypeStruct((b, 64, 2), np.float32),) * 2
    out = export_model(str(tmp_path / "m"), fn, [sig(2), sig(5)],
                       meta={"model_type": "flow_unet"})

    engine = load_model(out)
    assert engine.meta["batches"] == [2, 5]
    assert engine.meta["model_type"] == "flow_unet"
    rng = np.random.default_rng(0)
    for b in (2, 5):
        a = jnp.asarray(rng.normal(size=(b, 64, 2)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(b, 64, 2)), jnp.float32)
        # the deserialized module may fuse differently than the live jit
        # (unlike the serving pipeline's pallas-dominated program, which
        # reproduces bit-identically) — assert tight f32 agreement
        np.testing.assert_allclose(np.asarray(engine(a, c)),
                                   np.asarray(fn(a, c)),
                                   rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError, match="batch 3"):
        engine(jnp.zeros((3, 64, 2)), jnp.zeros((3, 64, 2)))
    # readable errors on non-batch shape / arity / dtype mismatch
    # (instead of jax.export internals)
    with pytest.raises(ValueError, match="exported for"):
        engine(jnp.zeros((2, 48, 2)), jnp.zeros((2, 48, 2)))
    with pytest.raises(ValueError, match="takes 2 input"):
        engine(jnp.zeros((2, 64, 2)))
    with pytest.raises(ValueError, match="dtype"):
        engine(jnp.zeros((2, 64, 2), jnp.int32), jnp.zeros((2, 64, 2)))

    # a failed re-export must NOT brick the existing artifact (programs
    # are serialized before the directory is touched)
    def bad_fn(a, b):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        export_model(out, bad_fn, [sig(7)])
    again = load_model(out)
    assert again.meta["batches"] == [2, 5]
    np.testing.assert_allclose(
        np.asarray(again(jnp.zeros((2, 64, 2)), jnp.zeros((2, 64, 2)))),
        np.asarray(fn(jnp.zeros((2, 64, 2)), jnp.zeros((2, 64, 2)))),
        rtol=1e-4, atol=1e-4)

    # re-export with a different batch list drops the stale programs
    # (new bins under generation-unique names, then pruned to the set
    # the new meta references)
    export_model(out, fn, [sig(4)])
    import os

    meta = load_model(out).meta
    bins = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    assert bins == sorted(meta["files"].values())
    assert meta["batches"] == [4]


def test_export_model_cli_box_regressor_artifact(tmp_path):
    """bin/export_model.py on a box-reg config; the BoxRegressor API runs
    identically on the artifact and on the live network."""
    import optax

    import bin.export_model as cli
    from planar_optical_flow_tpu.infer import BoxRegressor
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.train.state import create_train_state

    cfg = {
        "dataset": {"is_3d": True, "input_size": 32, "radius_segment": 0.5,
                    "min_segment_size": 1},
        "model": {"type": "box_reg", "input_dim": 4, "target_dim": 5},
        "pipeline": {},  # mark as nested-style for normalize_config
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "boxreg"
    assert cli.main(["--cfg", str(cfg_path), "--out", str(out),
                     "--batch", "3,5", "--cpu"]) == 0

    br_cfg = {"is_3d": True, "input_size": 32, "radius_segment": 0.5,
              "input_with_angle": True, "min_segment_size": 1}
    art = BoxRegressor.from_artifact(str(out), br_cfg)

    # the CLI exported a fresh-init network (PRNGKey(0)); rebuild the same
    # variables for the live reference
    model = get_model(cfg["model"])
    state = create_train_state(model, (jnp.zeros((1, 32, 4)),),
                               optax.identity(),
                               init_kwargs={"train": False})
    live = BoxRegressor(state.variables, br_cfg)

    rng = np.random.default_rng(2)
    points = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    # detection counts that hit every routing path of the artifact
    # forward: exact program (3), pad to the next exported batch (4 -> 5),
    # and chunk over the largest + pad the tail (12 -> 5+5+pad(2->3)) —
    # exact because the eval forward is per-sample independent
    for n_det in (3, 4, 12):
        centers = rng.uniform(-2, 2, (n_det, 3)).astype(np.float32)
        boxes_a, ok_a = art(points, centers)
        boxes_l, ok_l = live(points, centers)
        np.testing.assert_array_equal(ok_a, ok_l)
        np.testing.assert_allclose(boxes_a, boxes_l, rtol=1e-5, atol=2e-5)
        assert boxes_a.shape == (n_det, 7)

    # a config that disagrees with the artifact's input signature raises
    with pytest.raises(ValueError, match="expects segments"):
        BoxRegressor.from_artifact(str(out), dict(br_cfg, input_size=16))

    # a wrong-model artifact is rejected at load, not at call time
    from planar_optical_flow_tpu.models import FlowUNet

    fmodel = FlowUNet()
    x0 = jnp.zeros((1, 32, 2))
    fvars = fmodel.init(jax.random.PRNGKey(0), x0, x0, train=False)
    from planar_optical_flow_tpu.infer import export_model

    flow_art = export_model(
        str(tmp_path / "flow"),
        lambda a, b: fmodel.apply(fvars, a, b, train=False),
        [(jax.ShapeDtypeStruct((2, 32, 2), np.float32),) * 2],
        meta={"model_type": "flow_unet"})
    with pytest.raises(ValueError, match="not a box"):
        BoxRegressor.from_artifact(flow_art, br_cfg)

    # CLI rejects duplicate batch sizes instantly
    with pytest.raises(SystemExit):
        cli.main(["--cfg", str(cfg_path), "--out", str(tmp_path / "dup"),
                  "--batch", "3,3", "--cpu"])


def test_export_model_cli_rejects_streaming(tmp_path):
    import bin.export_model as cli

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({"network": "cutout_spatial"}))
    with pytest.raises(SystemExit):
        cli.main(["--cfg", str(cfg_path), "--out", str(tmp_path / "x"),
                  "--cpu"])


def test_export_model_interrupted_reexport_stays_loadable(tmp_path,
                                                          monkeypatch):
    """A re-export killed between the bin writes and the meta replace must
    leave the PREVIOUS artifact fully loadable: bins land via tmp+replace
    first, the meta flips atomically, and only then are stale bins pruned
    (fault-injected at the meta replace)."""
    import os

    from planar_optical_flow_tpu.infer import export_model, load_model

    def fn(a):
        return a * 2.0

    sig = lambda b: (jax.ShapeDtypeStruct((b, 8), np.float32),)
    out = export_model(str(tmp_path / "m"), fn, [sig(2), sig(5)])

    real_replace = os.replace

    def dying_replace(src, dst):
        if dst.endswith("model.json"):
            raise OSError("injected crash at meta replace")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", dying_replace)
    with pytest.raises(OSError, match="injected"):
        export_model(str(tmp_path / "m"), fn, [sig(4)])
    monkeypatch.undo()

    # old meta survives and every bin it references still exists
    engine = load_model(str(tmp_path / "m"))
    assert engine.meta["batches"] == [2, 5]
    np.testing.assert_allclose(
        np.asarray(engine(jnp.ones((2, 8), jnp.float32))), 2.0)
    # no partially-written bins (the meta tmp itself is the crash residue
    # and is ignored by load); a successful re-export leaves no tmp at all
    assert not [f for f in os.listdir(tmp_path / "m")
                if f.endswith(".bin.tmp")]
    export_model(str(tmp_path / "m"), fn, [sig(4)])
    assert not [f for f in os.listdir(tmp_path / "m") if ".tmp" in f]
    assert load_model(str(tmp_path / "m")).meta["batches"] == [4]

    # the sharpest case: a SAME-batch re-export with changed weights that
    # dies at the meta flip — the old meta must keep serving the OLD
    # function (same-name in-place bin replacement would silently serve
    # the new weights under the old meta)
    def fn_new(a):
        return a * 3.0

    monkeypatch.setattr(os, "replace", dying_replace)
    with pytest.raises(OSError, match="injected"):
        export_model(str(tmp_path / "m"), fn_new, [sig(4)])
    monkeypatch.undo()
    engine = load_model(str(tmp_path / "m"))
    np.testing.assert_allclose(
        np.asarray(engine(jnp.ones((4, 8), jnp.float32))), 2.0)
    # and completing the re-export flips to the new weights + prunes
    export_model(str(tmp_path / "m"), fn_new, [sig(4)])
    engine = load_model(str(tmp_path / "m"))
    np.testing.assert_allclose(
        np.asarray(engine(jnp.ones((4, 8), jnp.float32))), 3.0)
    bins = {f for f in os.listdir(tmp_path / "m") if f.endswith(".bin")}
    assert bins == set(engine.meta["files"].values())


def test_box_regressor_artifact_chunk_routing(monkeypatch):
    """The artifact forward consumes full chunks of the largest exported
    batch that fits and only pads the remainder — a mid-range detection
    count must not run the largest program with mostly pad rows."""
    from planar_optical_flow_tpu.infer import box_regressor as brmod
    from planar_optical_flow_tpu.infer import BoxRegressor

    cfg = {"is_3d": True, "input_size": 8, "radius_segment": 0.5,
           "input_with_angle": True, "min_segment_size": 1}
    calls = []

    class FakeEngine:
        meta = {
            "model_type": "box_reg",
            "batches": [2, 16],
            "input_shapes": {
                "2": [{"shape": [2, 8, 4], "dtype": "float32"}],
                "16": [{"shape": [16, 8, 4], "dtype": "float32"}],
            },
        }

        def __call__(self, x):
            b = int(x.shape[0])
            assert b in (2, 16), f"un-exported batch {b} dispatched"
            calls.append(b)
            return jnp.asarray(np.asarray(x)[:, 0, :2] * 0 + b,
                               jnp.float32)

    monkeypatch.setattr("planar_optical_flow_tpu.infer.export.load_model",
                        lambda path: FakeEngine())
    art = BoxRegressor.from_artifact("fake", cfg)

    # 3 rows: two 2-programs (4 rows) beat one 16-program (16 rows)
    calls.clear()
    out = art._forward(None, jnp.zeros((3, 8, 4), jnp.float32))
    assert calls == [2, 2] and out.shape[0] == 3
    # 15 rows: pad-to-16 (16 rows, 1 dispatch) ties 8x2 (16 rows) -> fewer
    # dispatches wins
    calls.clear()
    out = art._forward(None, jnp.zeros((15, 8, 4), jnp.float32))
    assert calls == [16] and out.shape[0] == 15
    # 17 rows: one full 16 chunk + the remainder on the 2-program
    calls.clear()
    out = art._forward(None, jnp.zeros((17, 8, 4), jnp.float32))
    assert calls == [16, 2] and out.shape[0] == 17
    # 0 rows: no crash, empty result (dummy dispatch allowed)
    calls.clear()
    out = art._forward(None, jnp.zeros((0, 8, 4), jnp.float32))
    assert out.shape[0] == 0


def test_box_regressor_empty_detections():
    """A frame with no detections returns the natural empty outputs on the
    product API (deployment-routine case) instead of crashing in
    np.stack/generate_segments."""
    import optax

    from planar_optical_flow_tpu.infer import BoxRegressor
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.train.state import create_train_state

    cfg = {"is_3d": True, "input_size": 8, "radius_segment": 0.5,
           "input_with_angle": True, "min_segment_size": 1}
    model = get_model({"type": "box_reg", "input_dim": 4, "target_dim": 5})
    state = create_train_state(model, (jnp.zeros((1, 8, 4)),),
                               optax.identity(),
                               init_kwargs={"train": False})
    br = BoxRegressor(state.variables, cfg)
    points = np.random.default_rng(0).uniform(-2, 2, (50, 3)).astype(
        np.float32)
    boxes, ok = br(points, np.zeros((0, 3), np.float32))
    assert boxes.shape == (0, 7) and ok.shape == (0,)
    segs, ok2 = br.generate_segments(points, np.zeros((0, 3), np.float32))
    assert segs.shape == (0, 8, 3) and ok2.shape == (0,)


def test_box_reg_artifact_output_width_mismatch(tmp_path):
    """A 2D+angle export (in_dim 3, width-3 boxes) loaded with a 3D
    no-angle config (ALSO in_dim 3) must fail at load on the predicted
    width, not with an IndexError at the first inference call."""
    from planar_optical_flow_tpu.infer import BoxRegressor, export_model
    from planar_optical_flow_tpu.models import BoundingBoxRegressor

    model = BoundingBoxRegressor(input_dim=3, target_dim=3)
    x = jnp.zeros((2, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    art = export_model(
        str(tmp_path / "br2d"),
        lambda a: model.apply(variables, a, train=False),
        [(jax.ShapeDtypeStruct((2, 8, 3), np.float32),)],
        meta={"model_type": "box_reg"})

    good_cfg = {"is_3d": False, "input_with_angle": True, "input_size": 8,
                "radius_segment": 0.5, "min_segment_size": 1}
    BoxRegressor.from_artifact(art, good_cfg)  # matching config loads

    bad_cfg = dict(good_cfg, is_3d=True, input_with_angle=False)
    with pytest.raises(ValueError, match="predicts shape"):
        BoxRegressor.from_artifact(art, bad_cfg)


def test_next_generation_corrupt_meta_scans_bins(tmp_path):
    """An unreadable meta must advance the generation PAST the highest
    ``.g{N}`` bin on disk (ADVICE r3): hardcoding 1 could atomically
    overwrite gen-1 bins a restored/backup meta still references."""
    from planar_optical_flow_tpu.infer.export import _next_generation

    d = str(tmp_path)
    # no meta at all -> generation 0 (fresh export)
    assert _next_generation(d, "engine.json") == 0
    # corrupt meta, no bins -> 1
    (tmp_path / "engine.json").write_text("{not json")
    assert _next_generation(d, "engine.json") == 1
    # corrupt meta with surviving gen-2 bins -> 3, never a collision
    (tmp_path / "step_b4.g2.bin").write_bytes(b"x")
    (tmp_path / "boot_b4.g1.bin").write_bytes(b"x")
    assert _next_generation(d, "engine.json") == 3
    # a crashed write residue also counts (it may be the newest gen)
    (tmp_path / "step_b4.g5.bin.tmp").write_bytes(b"x")
    assert _next_generation(d, "engine.json") == 6
    # readable meta wins regardless of bins
    (tmp_path / "engine.json").write_text('{"generation": 7}')
    assert _next_generation(d, "engine.json") == 8


@pytest.mark.slow
def test_export_cli_lean_fields(tmp_path):
    """--fields bakes an output-lean program into the artifact: the
    loaded engine returns exactly those keys, bit-identical to the full
    engine's values, and the meta records the contract."""
    import bin.export_serving as export_cli
    from planar_optical_flow_tpu.infer import load_serving_engine

    num_pts = 64
    cfg = {
        "network": "cutout_spatial", "pedestrian_only": True,
        "similarity_kwargs": {"alpha": 0.5, "window_size": 5},
        "cutout_kwargs": {"fixed": True, "centered": True,
                          "window_width": 1.0, "window_depth": 0.5,
                          "num_cutout_pts": 16, "padding_val": 29.99,
                          "area_mode": True, "gather_mode": "matmul"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    common = ["--cfg", str(cfg_path), "--batch", "2", "--num-pts",
              str(num_pts), "--tile", "16", "--engine", "bf16", "--cpu"]
    full_dir, lean_dir = str(tmp_path / "full"), str(tmp_path / "lean")
    assert export_cli.main(["--out", full_dir] + common) == 0
    assert export_cli.main(
        ["--out", lean_dir, "--fields", "pred_flow,det_xys,det_keep"]
        + common) == 0

    full = load_serving_engine(full_dir)
    lean = load_serving_engine(lean_dir)
    assert lean.meta["output_fields"] == ["pred_flow", "det_xys",
                                          "det_keep"]
    assert full.meta["output_fields"] is None

    rng = np.random.default_rng(3)
    scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)), jnp.float32)
    cf, of = full(None, scan)
    cl, ol = lean(None, scan)
    assert sorted(ol) == ["det_keep", "det_xys", "pred_flow"]
    cf, of = full(cf, scan)
    cl, ol = lean(cl, scan)
    for k in ol:
        np.testing.assert_array_equal(np.asarray(ol[k]),
                                      np.asarray(of[k]))


def test_schema_version_stamped_and_checked(tmp_path):
    """Artifacts stamp an explicit schema_version; loaders refuse a
    future or unparseable schema with a readable error instead of a
    downstream shape/deserialize failure (round-4 verdict item 7).
    Unstamped (pre-versioning) artifacts read as version 1."""
    import json
    import os

    from planar_optical_flow_tpu.infer import (export_serving_engine,
                                               load_serving_engine)
    from planar_optical_flow_tpu.infer.export import SCHEMA_VERSION

    num_pts, batch = 64, 4
    step, _ = _tiny_engine(num_pts, batch)
    scan_spec = jax.ShapeDtypeStruct((batch, num_pts), np.float32)
    out_dir = export_serving_engine(str(tmp_path / "engine"), step,
                                    scan_spec)
    meta_path = os.path.join(out_dir, "engine.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["schema_version"] == SCHEMA_VERSION

    # future schema -> readable refusal naming both versions
    doctored = dict(meta, schema_version=SCHEMA_VERSION + 1)
    with open(meta_path, "w") as f:
        json.dump(doctored, f)
    with pytest.raises(ValueError, match="schema version.*upgrade"):
        load_serving_engine(out_dir)

    # unparseable schema -> readable refusal
    doctored = dict(meta, schema_version="two")
    with open(meta_path, "w") as f:
        json.dump(doctored, f)
    with pytest.raises(ValueError, match="unreadable schema_version"):
        load_serving_engine(out_dir)

    # pre-versioning artifact (no stamp) still loads
    unstamped = {k: v for k, v in meta.items() if k != "schema_version"}
    with open(meta_path, "w") as f:
        json.dump(unstamped, f)
    assert load_serving_engine(out_dir) is not None

    # restored stamp loads and serves
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    engine = load_serving_engine(out_dir)
    scan = jnp.zeros((batch, num_pts), jnp.float32)
    carry, out = engine(None, scan)
    assert carry is not None and out
