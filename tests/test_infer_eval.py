"""Streaming inference, detection AP, baselines, pipeline facade."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.models import SpatialDrow, FlowDrow
from planar_optical_flow_tpu.infer import StreamingRunner, BoxRegressor
from planar_optical_flow_tpu.eval import (
    match_detections,
    precision_recall_curve,
    average_precision,
    peak_f1,
    evaluate_detection_ap,
    mean_box_baseline,
)

KEY = jax.random.PRNGKey(0)
CUTOUT_KW = dict(fixed=True, centered=True, window_width=1.0,
                 window_depth=0.5, num_cutout_pts=16, padding_val=29.99,
                 area_mode=False)


def test_streaming_runner_spatial_drow(rng):
    model = SpatialDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    variables = model.init(KEY, x, train=False)
    runner = StreamingRunner(model, variables, CUTOUT_KW)
    for i in range(3):
        scan = rng.uniform(0.5, 20.0, (2, 450)).astype(np.float32)
        out = runner(scan)
    assert np.asarray(out["pred_cls"]).shape == (2, 450, 1)
    assert np.asarray(out["det_xys"]).shape == (2, 450, 2)
    assert np.asarray(out["det_keep"]).dtype == bool
    # confidences are probabilities after sigmoid
    probs = np.asarray(out["pred_cls"])
    assert (probs >= 0).all() and (probs <= 1).all()
    runner.reset()
    out2 = runner(scan)
    assert np.asarray(out2["pred_cls"]).shape == (2, 450, 1)


def test_streaming_runner_flow_drow(rng):
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    variables = model.init(KEY, x, jnp.zeros((1, 450)), train=False)
    runner = StreamingRunner(model, variables, CUTOUT_KW)
    scan = rng.uniform(0.5, 20.0, (1, 450)).astype(np.float32)
    out = runner(scan)
    assert np.asarray(out["pred_flow"]).shape == (1, 450, 2)


# ------------------------------------------------------------------ AP


def test_match_detections_simple():
    gt = np.array([[0.0, 0.0], [5.0, 0.0]])
    det = np.array([[0.1, 0.0], [5.2, 0.1], [10.0, 0.0]])
    conf = np.array([0.9, 0.8, 0.7])
    tp, conf_sorted, n = match_detections(det, conf, gt, radius=0.5)
    assert n == 2
    np.testing.assert_array_equal(tp, [True, True, False])


def test_match_detections_one_per_gt():
    """Two detections near the same GT: only the higher-conf one matches."""
    gt = np.array([[0.0, 0.0]])
    det = np.array([[0.1, 0.0], [0.0, 0.1]])
    conf = np.array([0.5, 0.9])
    tp, conf_sorted, _ = match_detections(det, conf, gt, radius=0.5)
    np.testing.assert_array_equal(tp, [True, False])  # sorted by conf desc
    assert conf_sorted[0] == 0.9


def test_ap_perfect_and_worst():
    gt = np.array([[0.0, 0.0], [3.0, 0.0]])
    perfect = [(gt + 0.01, np.array([0.9, 0.8]), gt)]
    p, r, _ = precision_recall_curve(perfect)
    assert average_precision(p, r) == pytest.approx(1.0)
    assert peak_f1(p, r) == pytest.approx(1.0)

    wrong = [(np.array([[50.0, 50.0]]), np.array([0.9]), gt)]
    p, r, _ = precision_recall_curve(wrong)
    assert average_precision(p, r) == pytest.approx(0.0)


def test_ap_mixed():
    gt = np.array([[0.0, 0.0], [3.0, 0.0]])
    frames = [
        (np.array([[0.05, 0.0], [9.0, 9.0]]), np.array([0.9, 0.8]), gt),
    ]
    p, r, _ = precision_recall_curve(frames)
    ap = average_precision(p, r)
    assert 0.0 < ap < 1.0


# ------------------------------------------------------------ baseline


class _FakeBoxDataset:
    def __init__(self, rng, n=64):
        dims = rng.uniform(0.4, 1.2, size=(n, 3))
        centers = rng.uniform(-5, 5, size=(n, 3))
        rots = rng.uniform(-np.pi, np.pi, size=(n, 1))
        self.targets = np.hstack([centers, dims, rots])
        self.dets_center = centers + rng.normal(scale=0.05, size=(n, 3))


def test_mean_box_baseline(rng):
    ds = _FakeBoxDataset(rng)
    out = mean_box_baseline(ds)
    assert 0.0 < out["iou"] <= 1.0
    assert out["loss_dim"] > 0


# ---------------------------------------------------------- AP end-to-end


def test_evaluate_detection_ap_with_synthetic(tmp_path, rng):
    from planar_optical_flow_tpu.data import (
        write_synthetic_drow_split, DrowDetectionDataset,
    )

    d = str(tmp_path)
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=12)
    ds = DrowDetectionDataset(d, "train", num_scans=2, pedestrian_only=True)
    assert len(ds) > 0
    assert ds.gt_centers(0).shape[1] == 2

    model = SpatialDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    variables = model.init(KEY, x, train=False)
    runner = StreamingRunner(model, variables, CUTOUT_KW)
    out = evaluate_detection_ap(runner, ds, conf_thresh=0.5)
    assert 0.0 <= out["ap"] <= 1.0
    assert out["num_frames"] == len(ds)


def test_box_regressor_from_checkpoint_roundtrip(tmp_path, rng):
    """Train-free roundtrip: save a BoundingBoxRegressor state, reload via
    BoxRegressor.from_checkpoint, regress boxes on a synthetic frame."""
    import optax

    from planar_optical_flow_tpu.data.synthetic import make_synthetic_jrdb
    from planar_optical_flow_tpu.train import create_train_state
    from planar_optical_flow_tpu.train import checkpoint as ckpt_lib
    from planar_optical_flow_tpu.models import BoundingBoxRegressor

    cfg = {"is_3d": True, "input_size": 32, "radius_segment": 0.7,
           "input_with_angle": True, "dropout": 0.0, "min_segment_size": 3}
    model = BoundingBoxRegressor(input_dim=4, target_dim=5, dropout=0.0)
    state = create_train_state(
        model, (jnp.zeros((1, 32, 4)),), optax.identity(),
        init_kwargs={"train": False},
    )
    path = ckpt_lib.save_checkpoint(str(tmp_path / "boxreg"), state)

    reg = BoxRegressor.from_checkpoint(path, cfg)
    frame = make_synthetic_jrdb(num_frames=1, boxes_per_frame=3)[0]
    centers = frame["boxes"][:, :3]
    boxes, ok = reg(frame["points"], centers, frame["boxes"][:, 6])
    assert boxes.shape == (3, 7)
    assert ok.all()
    # centers pass through; cz/rot offsets applied
    np.testing.assert_allclose(boxes[:, :2], centers[:, :2], atol=1e-5)


@pytest.mark.slow
def test_evaluate_detection_ap_batched_matches_runner(tmp_path, rng):
    """Batched AP (B contiguous chunk streams per device step) must agree
    with the batch-1 StreamingRunner loop when chunking preserves the
    same template recursion (batch_streams=1) and stay consistent for B>1."""
    from planar_optical_flow_tpu.data import (
        write_synthetic_drow_split, DrowDetectionDataset,
    )
    from planar_optical_flow_tpu.eval import (
        evaluate_detection_ap_batched, DetectionEvalFrames,
    )

    d = str(tmp_path)
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=14)
    ds = DrowDetectionDataset(d, "train", num_scans=2, pedestrian_only=True)

    model = SpatialDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    variables = model.init(KEY, x, train=False)

    runner = StreamingRunner(model, variables, CUTOUT_KW)
    ref = evaluate_detection_ap(runner, ds, conf_thresh=0.5)

    frames = DetectionEvalFrames.from_dataset(ds)
    got1 = evaluate_detection_ap_batched(
        model, variables, CUTOUT_KW, frames, batch_streams=1,
        conf_thresh=0.5, gate_mix="xla", engine="module",
    )
    assert got1["num_frames"] == ref["num_frames"] == len(ds)
    np.testing.assert_allclose(got1["ap"], ref["ap"], atol=1e-6)

    got4 = evaluate_detection_ap_batched(
        model, variables, CUTOUT_KW, ds, batch_streams=4,
        conf_thresh=0.5, gate_mix="xla", engine="module",
    )
    assert got4["num_frames"] == len(ds)
    assert 0.0 <= got4["ap"] <= 1.0

    # default engine: bf16 fused serve-v3 (interpret auto-on off-TPU)
    got_v3 = evaluate_detection_ap_batched(
        model, variables, CUTOUT_KW, frames, batch_streams=4,
        conf_thresh=0.5,
    )
    assert got_v3["num_frames"] == len(ds)
    assert 0.0 <= got_v3["ap"] <= 1.0


def test_streaming_runner_v3_engine(rng):
    """StreamingRunner(engine="v3") tracks the module engine closely."""
    from planar_optical_flow_tpu.infer import StreamingRunner
    from planar_optical_flow_tpu.models import FlowDrow

    num_pts = 64
    kw = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
              num_cutout_pts=16, padding_val=29.99, area_mode=True,
              gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(KEY, x, cur, train=False)
    ref = StreamingRunner(model, variables, kw, num_pts=num_pts)
    fast = StreamingRunner(model, variables, kw, num_pts=num_pts,
                           engine="v3")
    for i in range(2):
        scan = rng.uniform(0.5, 20.0, (2, num_pts)).astype(np.float32)
        out_r, out_f = ref(scan), fast(scan)
        for k in ("pred_cls", "pred_flow"):
            corr = np.corrcoef(
                np.asarray(out_f[k], np.float32).ravel(),
                np.asarray(out_r[k], np.float32).ravel())[0, 1]
            assert corr > 0.99, (i, k, corr)


def test_evaluate_cli_auto_engine_resolution(tmp_path):
    """bin/evaluate.py --engine auto: int8c iff a persisted calibration
    sits next to the checkpoint; explicit engines pass through."""
    from bin.evaluate import _resolve_ap_engine
    from planar_optical_flow_tpu.infer import ServeCalibration

    ckpt = tmp_path / "ckpt_e1"
    ckpt.mkdir()
    engine, calib = _resolve_ap_engine("auto", str(ckpt))
    assert (engine, calib) == ("v3", None)
    engine, calib = _resolve_ap_engine("auto", None)
    assert (engine, calib) == ("v3", None)

    ServeCalibration(bb_in_scale=1.0, bb_act_scales=[1.0] * 5,
                     hd_in_scale=1.0, hd_act_scales=[1.0] * 5,
                     ).save(str(tmp_path))
    engine, calib = _resolve_ap_engine("auto", str(ckpt))
    assert engine == "int8c" and calib is not None
    # explicit engines are never overridden
    engine, calib = _resolve_ap_engine("v3", str(ckpt))
    assert (engine, calib) == ("v3", None)
    engine, calib = _resolve_ap_engine("module", str(ckpt))
    assert (engine, calib) == ("module", None)


def test_evaluate_cli_serve_flow_rejects_flowless_model(tmp_path):
    """--serve-flow on a non-flow model is an argparse error raised from
    the config alone — before any dataset or model is built."""
    import yaml

    import bin.evaluate as evaluate_cli

    cfg = {"model": {"type": "dr-spaam", "kwargs": {}},
           "dataset": {}, "pipeline": {}}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(SystemExit):
        evaluate_cli.main(["--cfg", str(cfg_path), "--serve-flow", "--cpu"])


def test_infer_cli_replay(tmp_path, rng):
    """``bin/infer.py --replay``: chunked deferred readback (a window of
    steps in flight, one stacked transfer per window); smoke both the
    module and fused engines on a synthetic DROW-format CSV."""
    import yaml

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
    # 20 frames: covers one full 16-frame window AND the tail drain
    t = np.arange(20, dtype=np.float64)[:, None]
    rows = np.hstack([np.arange(20)[:, None], t,
                      rng.uniform(0.5, 20.0, (20, num_pts))])
    seq = tmp_path / "seq.csv"
    np.savetxt(seq, rows, fmt="%.6f", delimiter=",")

    for engine in ("module", "v3"):
        rc = infer_cli.main(["--cfg", str(cfg_path), "--sequence",
                             str(seq), "--replay", "--engine", engine,
                             "--cpu"])
        assert rc in (0, None), engine


@pytest.mark.slow
def test_evaluate_flow_serving_with_synthetic(tmp_path, rng):
    """Serve-path flow eval (the bin/evaluate.py --serve-flow face):
    masked EPE/AAE through a StreamingRunner on dataset frames, with the
    frame count trimmed to whole stream batches."""
    from planar_optical_flow_tpu.data import (
        write_synthetic_drow_split, DrowDetectionDataset,
    )
    from planar_optical_flow_tpu.eval import evaluate_flow_serving
    from planar_optical_flow_tpu.models import FlowDrow

    d = str(tmp_path)
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=14)
    ds = DrowDetectionDataset(d, "train", num_scans=2, pedestrian_only=True)

    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    variables = model.init(KEY, x, jnp.zeros((1, 450)), train=False)
    # flip augmentation must be suspended during eval (deterministic
    # scoring; calibration scans match the scored frames) and restored
    ds.use_augmentation = True
    out = evaluate_flow_serving(model, variables, CUTOUT_KW, ds,
                                engine="module", batch_streams=4)
    assert ds.use_augmentation is True
    assert np.isfinite(out["epe"]) and out["epe"] >= 0.0
    assert 0.0 <= out["aae"] <= 180.0
    assert out["num_frames"] == (len(ds) // 4) * 4
    ds.use_augmentation = False
    out2 = evaluate_flow_serving(model, variables, CUTOUT_KW, ds,
                                 engine="module", batch_streams=4)
    assert out2["epe"] == out["epe"]  # aug was really off during scoring
    with pytest.raises(ValueError, match="frames"):
        evaluate_flow_serving(model, variables, CUTOUT_KW, ds,
                              engine="module", batch_streams=1024)


def test_evaluate_cli_box_reg_prints_baseline(tmp_path, capsys):
    """bin/evaluate.py on a box_reg config prints the mean-box baseline
    (eval/baseline.py) beside the model's IoU/z/dim/ori metrics — the
    reference floors its regressor the same way
    (src/utils/eval_utils.py:561-639)."""
    import ast

    import yaml

    import bin.evaluate as evaluate_cli

    cfg = {
        "dataset": {
            "data_dir": "unused-replaced-by-synthetic",
            "radius_segment": 0.7, "perturb": 0.0, "is_3d": True,
            "min_segment_size": 5, "input_size": 32,
            "augmentation_kwargs": {"use_data_augmentation": False},
        },
        "dataloader": {"batch_size": 2, "num_workers": 0},
        "model": {"type": "box_reg", "input_dim": 4, "target_dim": 5,
                  "dropout": 0.0},
        "pipeline": {
            "Trainer": {"epoch": 1, "ckpt_interval": 5,
                        "eval_interval": 5, "grad_norm_clip": 0.0},
            "Optim": {"scheduler_kwargs": {"epoch0": 0, "lr0": 1e-3,
                                           "epoch1": 1, "lr1": 1e-6}},
            "Logger": {"log_dir": str(tmp_path / "logs"),
                       "tag": "boxreg", "backup_list": []},
        },
    }
    cfg_path = tmp_path / "box_reg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    rc = evaluate_cli.main([
        "--cfg", str(cfg_path), "--synthetic", str(tmp_path / "jrdb"),
        "--cpu",
    ])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    printed = {}
    for ln in lines:
        printed.update(ast.literal_eval(ln))
    # model metrics and the baseline floor side by side
    for k in ("iou", "loss_z", "loss_dim", "loss_ori"):
        assert k in printed, f"model metric {k} missing"
        assert f"baseline_{k}" in printed, f"baseline_{k} missing"
    assert 0.0 <= printed["baseline_iou"] <= 1.0


def test_mean_box_baseline_2d(rng):
    """The 2D branch (5-col boxes: cx, cy, dx, dy, ori) — no z row in
    the output, IoU from the planar rotated-IoU kernel."""
    class Ds:
        pass

    n = 48
    ds = Ds()
    dims = rng.uniform(0.4, 1.2, size=(n, 2))
    centers = rng.uniform(-5, 5, size=(n, 2))
    rots = rng.uniform(-np.pi, np.pi, size=(n, 1))
    ds.targets = np.hstack([centers, dims, rots])
    ds.dets_center = centers + rng.normal(scale=0.05, size=(n, 2))
    out = mean_box_baseline(ds)
    assert 0.0 < out["iou"] <= 1.0
    assert out["loss_dim"] > 0 and out["loss_ori"] > 0
    assert "loss_z" not in out
