"""Loader semantics, detection-dataset targets, config loader, viz smoke."""

import os

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from planar_optical_flow_tpu.data import BatchLoader
from planar_optical_flow_tpu.utils.config import load_config
from planar_optical_flow_tpu.utils import viz


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def batch(self, idx):
        return {"x": np.asarray(idx, dtype=np.int64)}


def test_loader_drop_last():
    loader = BatchLoader(_ToyDataset(10), batch_size=4, shuffle=False,
                         prefetch=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    assert all(b["x"].shape == (4,) for b in batches)


def test_loader_wrap_padding():
    loader = BatchLoader(_ToyDataset(10), batch_size=4, shuffle=False,
                         drop_last=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == 3
    # tail batch padded to full size by wrapping
    assert batches[-1]["x"].shape == (4,)
    np.testing.assert_array_equal(batches[-1]["x"], [8, 9, 0, 1])


def test_loader_shuffle_deterministic():
    a = list(BatchLoader(_ToyDataset(16), 4, seed=3, prefetch=0))
    b = list(BatchLoader(_ToyDataset(16), 4, seed=3, prefetch=0))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["x"], y["x"])
    # covers every index exactly once
    all_idx = np.concatenate([x["x"] for x in a])
    assert sorted(all_idx.tolist()) == list(range(16))


def test_loader_prefetch_propagates_worker_error():
    """A dataset error inside the prefetch thread must raise in the
    consumer, not silently truncate the epoch."""

    class _Poisoned(_ToyDataset):
        def batch(self, idx):
            if np.min(idx) >= 8:  # third batch of 4
                raise RuntimeError("corrupt sample")
            return super().batch(idx)

    loader = BatchLoader(_Poisoned(16), batch_size=4, shuffle=False,
                         prefetch=2)
    seen = 0
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in loader:
            seen += 1
    assert seen == 2


def test_loader_prefetch_matches_sync():
    sync = list(BatchLoader(_ToyDataset(12), 4, seed=1, prefetch=0))
    pre = list(BatchLoader(_ToyDataset(12), 4, seed=1, prefetch=2))
    for x, y in zip(sync, pre):
        np.testing.assert_array_equal(x["x"], y["x"])


def test_load_config(tmp_path):
    p = tmp_path / "myexp.yaml"
    p.write_text("epochs: 3\ntag: abc\n")
    cfg = load_config(str(p))
    assert cfg["epochs"] == 3
    assert cfg["name"] == "myexp_abc"
    p2 = tmp_path / "noname.yaml"
    p2.write_text("epochs: 1\n")
    assert load_config(str(p2))["name"] == "noname"
    assert load_config(str(p2), tag="t")["name"] == "noname_t"


def test_detection_dataset_flow_target_semantics(tmp_path, rng):
    """target_flow equals displacement_from_odometry in canonical frame for
    the sample's own (odom0, odom1) pair."""
    from planar_optical_flow_tpu.data import (
        write_synthetic_drow_split, DrowDetectionDataset,
    )
    import planar_optical_flow_tpu.ops as ops
    from planar_optical_flow_tpu.ops.geometry import get_laser_phi

    d = str(tmp_path)
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=20)
    ds = DrowDetectionDataset(d, "train", num_scans=2, flow_distance=3)
    s = ds[0]
    assert s["scans"].shape == (3, 450)  # num_scans + current
    assert s["target_flow"].shape == (450, 2)
    assert s["exclude_mask"].shape == (450,)
    # flow magnitudes bounded by robot motion over the window
    assert np.abs(s["target_flow"]).max() < 3.0
    # masks: far returns excluded
    far = ds.scans_flat[ds.cur_idx[0]] >= 20.0
    assert (s["exclude_mask"][far] == 0).all()


def test_detection_dataset_augmentation_flip(tmp_path):
    from planar_optical_flow_tpu.data import (
        write_synthetic_drow_split, DrowDetectionDataset,
    )

    d = str(tmp_path)
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=20)
    ds = DrowDetectionDataset(d, "train", num_scans=2, use_augmentation=True,
                              seed=1)
    raw = ds._gather(np.arange(4))
    # force a flip by trying many batches: statistics make >=1 flip certain
    flipped_seen = False
    for _ in range(10):
        b = ds.batch(np.arange(4))
        for i in range(4):
            if not np.allclose(b["scans"][i], raw["scans"][i]):
                flipped_seen = True
                # flip is an exact reversal
                np.testing.assert_allclose(
                    b["scans"][i], raw["scans"][i][:, ::-1]
                )
    assert flipped_seen


def test_viz_smoke(tmp_path, rng):
    import matplotlib.pyplot as plt

    scan = rng.uniform(1, 10, 450).astype(np.float32)
    flow = rng.normal(scale=0.05, size=(450, 2)).astype(np.float32)
    colors = viz.flow_to_hsv(flow[:16])
    assert colors.shape == (16, 3)
    assert colors.min() >= 0 and colors.max() <= 1

    fig = viz.plot_gt_pred_flow(scan, flow, flow, title="t")
    plt.close(fig)
    fig = viz.plot_flow_hsv(scan, flow)
    plt.close(fig)
    fig = viz.plot_histogram(scan, "ranges")
    plt.close(fig)

    # tiny video (PNG fallback without ffmpeg is fine)
    out = str(tmp_path / "v.mp4")
    viz.render_flow_video(
        np.stack([scan, scan]),
        np.stack([flow, flow]),
        np.stack([flow, flow]),
        out, fps=2,
    )
    stem = os.path.splitext(out)[0]
    assert os.path.exists(out) or os.path.isdir(stem)

    # HSV legend wheel (reference viz_utils.color_wheel)
    fig, ax = plt.subplots()
    viz.color_wheel(ax, resolution=32)
    plt.close(fig)

    # instance-colored joint person-flow rendering (plot_person_flow);
    # capture the per-instance arrow calls to pin the beam angles (a
    # get_laser_phi positional misuse once fed ~1e5-radian "angles")
    inst = np.zeros(450, np.int32)
    inst[100:120] = 1
    inst[200:230] = 2
    seen_phis = []
    orig_arrows = viz.plot_flow_arrows

    def capture(ax, s, f, phi=None, **kw):
        if phi is not None:
            seen_phis.append(np.asarray(phi))
        return orig_arrows(ax, s, f, phi=phi, **kw)

    out2 = str(tmp_path / "pf.mp4")
    viz.plot_flow_arrows, _restore = capture, viz.plot_flow_arrows
    try:
        viz.render_detection_video(
            np.stack([scan, scan]),
            [{"dets": np.array([[1.0, 2.0]]), "conf": np.array([0.9]),
              "flow": flow, "instance_mask": inst}] * 2,
            out2, fps=2,
        )
    finally:
        viz.plot_flow_arrows = _restore
    assert os.path.exists(out2) or os.path.isdir(os.path.splitext(out2)[0])
    assert seen_phis and all(
        np.all(np.abs(p) < np.pi) for p in seen_phis
    ), "instance arrows drawn with out-of-FOV beam angles"


def test_pedestrian_only_dynamic_mask_sees_all_classes(tmp_path):
    """In pedestrian_only mode the exclude (dynamic) mask must still account
    for wc/wa people — the reference builds it from wc+wa+wp regardless
    (dataset_dr_spaam.py:406,511-523); only cls/reg matching is wp-only."""
    import glob
    import shutil
    from planar_optical_flow_tpu.data import (
        write_synthetic_drow_split, DrowDetectionDataset,
    )

    d = str(tmp_path)
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=20)
    ds_wp = DrowDetectionDataset(d, "train", num_scans=2,
                                 pedestrian_only=True)

    # same scene, but annotations moved wp -> wc (wheelchair people)
    d2 = os.path.join(d, "aswc")
    os.makedirs(os.path.join(d2, "train"))
    for f in glob.glob(os.path.join(d, "train", "*")):
        shutil.copy(f, os.path.join(d2, "train"))
    for stem in glob.glob(os.path.join(d2, "train", "*.wp")):
        base = stem[:-3]
        shutil.copy(stem, base + ".wc")
        # rebuild an empty .wp with the same ids
        with open(base + ".wa") as f, open(base + ".wp", "w") as g:
            for line in f:
                sid = line.split(",", 1)[0]
                g.write(f"{sid},[]\n")
    ds_wc = DrowDetectionDataset(d2, "train", num_scans=2,
                                 pedestrian_only=True)

    # no wp annotations -> no positive cls targets ...
    assert (ds_wc.target_cls == 0).all()
    assert not ds_wc.dets_valid.any()
    # ... but the dynamic mask still excludes points near the (wc) people.
    # wc dyn radius (2.5) > wp (2.0), so everything wp-masked must be
    # wc-masked too, and at least as much is masked overall.
    assert ((ds_wp.exclude_mask == 0) <= (ds_wc.exclude_mask == 0)).all()
    assert (ds_wc.exclude_mask == 0).sum() >= (ds_wp.exclude_mask == 0).sum()
    assert (ds_wc.exclude_mask == 0).any()


def test_pcd_truncated_header_raises(tmp_path):
    from planar_optical_flow_tpu.data import pcd

    p = tmp_path / "trunc.pcd"
    p.write_bytes(b"# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\n")
    with pytest.raises(ValueError, match="EOF"):
        pcd.read_pcd(str(p))


def test_native_csv_genfromtxt_semantics(tmp_path):
    """Empty fields -> NaN; unparsable tokens -> error (None), matching
    np.genfromtxt(delimiter=',') instead of silently shifting columns."""
    from planar_optical_flow_tpu.data import native

    if native._load() is None:
        pytest.skip("native lib unavailable")
    p = str(tmp_path / "a.csv")
    with open(p, "w") as f:
        f.write("1,2.5,3\n4,,6\n7,8,\n")
    a = native.read_csv(p)
    ref = np.genfromtxt(p, delimiter=",")
    assert a.shape == ref.shape == (3, 3)
    assert np.isnan(a[1, 1]) and np.isnan(a[2, 2])
    m = ~np.isnan(ref)
    assert np.allclose(a[m], ref[m])
    with open(p, "w") as f:
        f.write("1,abc,3\n")
    assert native.read_csv(p) is None


def test_drow_io_malformed_files(tmp_path):
    """Malformed DROW corpus files fail with errors naming the file and
    the defect (the formats are spec-implemented; real corpora must fail
    readably, not with raw numpy/json tracebacks)."""
    from planar_optical_flow_tpu.data import drow_io

    stem = str(tmp_path / "seq")

    # scan CSV with too few columns
    with open(stem + ".csv", "w") as f:
        f.write("1,100.0\n2,100.1\n")
    with pytest.raises(ValueError, match=r"malformed DROW file .*\.csv"):
        drow_io.load_scan_file(stem)

    # odometry with missing pose columns
    with open(stem + ".odom2", "w") as f:
        f.write("1,100.0,0.5\n")
    with pytest.raises(ValueError, match=r"\.odom2"):
        drow_io.load_odometry_file(stem)

    # annotation line that is not 'seq_id,[[r, phi], ...]'
    for ext, body in ((".wc", "3,[[1.0, 0.5]]\n4,not json\n"),
                      (".wa", "3,[[1.0, 0.5]]\n4,[[2.0, 0.1]]\n"),
                      (".wp", "3,[[1.0, 0.5]]\n4,[[2.0, 0.1]]\n")):
        with open(stem + ext, "w") as f:
            f.write(body)
    with pytest.raises(ValueError, match=r"\.wc:2"):
        drow_io.load_detection_file(stem)

    # flow file whose value count is not a whole number of scans
    with open(stem + ".flow", "w") as f:
        f.write(",".join(["0.1"] * 7) + "\n")
    with pytest.raises(ValueError, match="whole number of scans"):
        drow_io.load_flow_file(stem, num_pts=4)


def test_loader_early_break_releases_worker():
    """Abandoning an epoch early (``break`` mid-iteration) must not leave
    the prefetch worker blocked on the bounded queue forever."""
    import gc
    import threading
    import time

    before = set(threading.enumerate())
    loader = BatchLoader(_ToyDataset(64), batch_size=4, shuffle=False,
                         prefetch=1)
    it = iter(loader)
    next(it)
    del it  # GeneratorExit — the finally must release the worker
    gc.collect()
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if set(threading.enumerate()) <= before:
            break
        time.sleep(0.05)
    leaked = [t for t in threading.enumerate() if t not in before]
    assert not leaked, f"prefetch worker leaked: {leaked}"
