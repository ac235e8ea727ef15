"""DATASET-level parity against the reference's own data pipeline.

The ops/model parity tests (``test_reference_parity.py``) compare functions
on identical in-memory inputs. These tests go one level up: write a synthetic
corpus in the DROW/JRDB on-disk formats, load it with the REFERENCE's actual
dataset classes (torch/numpy, CPU) and with this repo's datasets, and compare
the produced samples. That validates, end to end and against executable
reference semantics rather than a spec reading:

* the on-disk formats our synthetic writers emit (csv/odom2/wc/wa/wp/
  difodom/flow, JRDB timestamps/labels/PCD incl. binary_compressed LZF)
  are accepted byte-for-byte by the reference loaders — the closest
  available stand-in for real-corpus validation;
* sequence/frame bookkeeping (static-scene filters, det->scan index maps,
  temporal stack construction, odometry timestamp matching) agrees;
* every derived quantity (regression/flow targets, exclude masks, cutout
  encodings, canonical box targets, neighbor lists) agrees numerically.

Reference citations: ``src/utils/dataset_dr_spaam.py:256-529`` (DROWDataset2),
``src/utils/dataset.py:626-822`` (FlowDataset2),
``src/data_handle/jrdb_handle.py:58-318`` and
``src/data_handle/jrdb_dataset.py:18-241`` (JRDB).

All tests skip when the reference checkout is absent.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _scan_key(scan, decimals=5):
    """Hashable key identifying a frame by its (rounded) range image —
    used to align samples across the two datasets, whose sequence
    iteration orders differ (glob vs sorted)."""
    return np.round(np.asarray(scan, np.float64), decimals).tobytes()


# ==========================================================================
# DROW detection (DROWDataset2 vs DrowDetectionDataset)
# ==========================================================================


@pytest.mark.parametrize("pedestrian_only", [False, True],
                         ids=["4class", "wp-only"])
def test_drow_detection_dataset_matches_reference(tmp_path, pedestrian_only):
    ref_mod = load_reference("src.utils.dataset_dr_spaam")
    ref_utils = load_reference("src.utils.utils")
    from planar_optical_flow_tpu import ops
    from planar_optical_flow_tpu.data import DrowDetectionDataset
    from planar_optical_flow_tpu.data.synthetic import (
        write_synthetic_drow_split,
    )

    root = str(tmp_path)
    write_synthetic_drow_split(root, "train", num_sequences=2, num_frames=30,
                               num_people=3, seed=3)

    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=24,
                         padding_val=29.99, area_mode=True)
    num_scans = 3

    ref = ref_mod.DROWDataset2(
        root, split="train", num_scans=num_scans,
        network_type="cutout_spatial", cutout_kwargs=dict(cutout_kwargs),
        pedestrian_only=pedestrian_only, scan_stride=1,
        use_data_augumentation=False,
    )
    ours = DrowDetectionDataset(
        root, "train", num_scans=num_scans, flow_distance=5,
        pedestrian_only=pedestrian_only, use_augmentation=False,
    )
    assert len(ref) == len(ours) > 0

    # align by current-scan content (iteration orders differ: glob vs sorted)
    ref_by_key = {}
    for i in range(len(ref)):
        s = ref[i]
        ref_by_key[_scan_key(s["scans"][-1])] = s
    assert len(ref_by_key) == len(ref), "current scans not unique"

    phi = ref_utils.get_laser_phi()
    matched = set()
    for j in range(len(ours)):
        got = ours[j]
        key = _scan_key(got["scans"][-1])
        want = ref_by_key[key]
        matched.add(key)

        np.testing.assert_allclose(got["scans"], want["scans"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(
            got["target_cls"], np.asarray(want["target_cls"]).astype(np.int32)
        )
        np.testing.assert_allclose(got["target_reg"], want["target_reg"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got["target_flow"], want["target_flow"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(got["exclude_mask"],
                                      want["exclude_mask"])
        np.testing.assert_allclose(got["odom1"], want["odom1"],
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(got["phi_grid"], want["phi_grid"],
                                   rtol=0, atol=1e-6)
    assert matched == set(ref_by_key)  # every ref sample matched exactly once

    # the network input: reference encodes cutouts inside __getitem__;
    # this repo encodes on device inside the train step. Run our op on the
    # dataset's scan stack and compare against the reference sample's
    # 'input'. Area mode: hand our static op the reference's realized
    # data-dependent oversampling factor (see the op-level parity test).
    for j in (0, len(ours) // 2):
        got = ours[j]
        want = ref_by_key[_scan_key(got["scans"][-1])]
        half_alpha = np.arctan(
            0.5 * cutout_kwargs["window_width"]
            / np.maximum(got["scans"], 1e-2))
        span = 2.0 * half_alpha / (phi[1] - phi[0])
        area_s = int(math.ceil(span.max()
                               / cutout_kwargs["num_cutout_pts"]))
        mine = np.asarray(ops.scans_to_cutout(
            got["scans"], phi.astype(np.float32), area_s=area_s,
            **cutout_kwargs))
        # f32-vs-f64 interpolation-index jitter flips an occasional sample
        # at steep range edges (same tolerance methodology as the op-level
        # parity test): a tiny tap fraction may exceed the atol
        diff = np.abs(mine - want["input"])
        assert (diff > 2e-3).mean() < 1e-3
        assert np.quantile(diff, 0.999) < 2e-3


# ==========================================================================
# DROW flow scan pairs (FlowDataset2 vs FlowScanPairDataset)
# ==========================================================================


def test_flow_scan_pair_dataset_matches_reference(tmp_path):
    ref_mod = load_reference("src.utils.dataset")
    from planar_optical_flow_tpu.data import FlowScanPairDataset
    from planar_optical_flow_tpu.data.prepare import prepare_split
    from planar_optical_flow_tpu.data.synthetic import (
        write_synthetic_drow_split,
    )

    root = str(tmp_path)
    stems = write_synthetic_drow_split(root, "train", num_sequences=2,
                                       num_frames=30, seed=7)

    # inject a static stretch into sequence 0 (identical consecutive odom
    # poses -> exactly-zero flow targets) so the static-frame filter of
    # both datasets actually fires
    odom = np.genfromtxt(stems[0] + ".odom2", delimiter=",")
    odom[10:14, 2:] = odom[9, 2:]
    np.savetxt(stems[0] + ".odom2", odom, fmt="%.6f", delimiter=",")

    # our preparer writes .difodom/.flow; the reference dataset reads them
    # (cross-compat: our writer -> their reader). Flow-target math parity
    # vs the reference is covered op-level in test_reference_parity.py.
    prepare_split(root, "train")

    ref = ref_mod.FlowDataset2(root, split="train")
    ours = FlowScanPairDataset(root, "train", drop_static=True,
                               mask_dynamic=False)
    assert len(ref) == len(ours) > 0
    # the injected static frames were dropped (flow of the 3 duplicated
    # poses is exactly zero; the preparer's trailing frame is zero too)
    assert len(ours) < 2 * 29

    # scan_pair is COMPUTED (polar->xy) on both sides, so content-key
    # matching on rounded bytes is fragile; match nearest-neighbor on the
    # current-frame xy instead (sequence iteration orders differ)
    ref_samples = [ref[i] for i in range(len(ref))]
    ref_xy = np.stack([s["scan_pair"][0] for s in ref_samples])

    used = set()
    for j in range(len(ours)):
        got = ours[j]
        cost = np.abs(ref_xy - got["scan_pair"][0][None]).max(axis=(1, 2))
        i = int(cost.argmin())
        assert cost[i] < 1e-4 and i not in used, (j, i, cost[i])
        used.add(i)
        want = ref_samples[i]
        np.testing.assert_allclose(got["scan_pair"][0],
                                   want["scan_pair"][0], atol=1e-5)
        # the odometry-warped next scan and the flow target
        np.testing.assert_allclose(got["scan_pair"][1],
                                   want["scan_pair"][1], atol=1e-4)
        np.testing.assert_allclose(got["flow_target"], want["flow_target"],
                                   rtol=1e-4, atol=1e-6)
    assert len(used) == len(ref_samples)


# ==========================================================================
# JRDB (JRDBHandle / JRDBBoxRegressionDataset vs Jrdb*)
# ==========================================================================


def _jrdb_cfg(root):
    return {
        "data_dir": root,
        "radius_segment": 0.7,
        "perturb": 0.0,  # deterministic pseudo-centers for exact parity
        "is_3d": True,
        # larger than any synthetic segment: the resample takes the
        # repeat+pad path, which preserves the full point set (the
        # truncation path keeps a random subset — not comparable)
        "input_size": 256,
        "min_segment_size": 5,
        "augmentation_kwargs": {
            "use_data_augmentation": False,
            "rot_max": 0.25,
            "random_drop": 0.25,
            "dist_max": 0.3,
            "dim_max": 0.2,
        },
    }


@pytest.mark.parametrize("pcd_mode", ["binary", "binary_compressed"])
def test_jrdb_handle_matches_reference(tmp_path, pcd_mode):
    ref_mod = load_reference("src.data_handle.jrdb_handle")
    from planar_optical_flow_tpu.data.jrdb import (
        JRDB_VAL_SEQUENCES,
        JrdbHandle,
        write_synthetic_jrdb,
    )

    root = str(tmp_path)
    # the reference handle eagerly loads its whole hard-coded sequence
    # list, so the synthetic corpus must provide every val sequence.
    # "binary" mode is decoded by the reference fully independently;
    # "binary_compressed" routes through the reference's LZF framing with
    # this repo's codec stubbed in for the missing python-lzf module.
    write_synthetic_jrdb(root, sequences=JRDB_VAL_SEQUENCES, num_frames=2,
                         boxes_per_frame=3, seed=11, pcd_mode=pcd_mode)

    cfg = _jrdb_cfg(root)
    ref = ref_mod.JRDBHandle("val", cfg)
    ours = JrdbHandle("val", cfg)
    assert len(ref) == len(ours) == 2 * len(JRDB_VAL_SEQUENCES)

    for i in range(len(ours)):
        rf, of = ref[i], ours[i]
        # PCD written by this repo (binary_compressed, our LZF encoder),
        # decoded by the reference's vendored _pypcd, transformed to base
        # frame by the reference's jrdb_transforms — vs our lazy path
        np.testing.assert_allclose(of["points"], rf["points"], atol=1e-5)
        np.testing.assert_allclose(of["boxes"], rf["boxes"], atol=1e-6)
        np.testing.assert_allclose(of["dets_center"], rf["dets_center"],
                                   atol=1e-6)
        assert len(of["segments"]) == len(rf["segments"])
        for sa, sb in zip(of["segments"], rf["segments"]):
            np.testing.assert_allclose(sa, sb, atol=1e-5)


def test_jrdb_box_regression_dataset_matches_reference(tmp_path):
    ref_mod = load_reference("src.data_handle.jrdb_dataset")
    from planar_optical_flow_tpu.data.jrdb import (
        JRDB_VAL_SEQUENCES,
        JrdbBoxRegressionDataset,
        write_synthetic_jrdb,
    )

    root = str(tmp_path)
    write_synthetic_jrdb(root, sequences=JRDB_VAL_SEQUENCES, num_frames=2,
                         boxes_per_frame=3, seed=13, pcd_mode="binary")

    cfg = _jrdb_cfg(root)
    ref = ref_mod.JRDBBoxRegressionDataset("val", cfg)
    ours = JrdbBoxRegressionDataset("val", cfg)

    # both materialize (segment, box, neighbors, det_center) in identical
    # handle iteration order; compare the deterministic materialized lists
    # (the __getitem__ tail adds randomness: input angle, resample shuffle)
    assert len(ref) == len(ours) > 0
    for i in range(len(ours)):
        np.testing.assert_allclose(ours.inputs[i], ref.inputs[i], atol=1e-5)
        np.testing.assert_allclose(ours.targets[i], ref.targets[i],
                                   atol=1e-6)
        np.testing.assert_allclose(ours.dets_center[i], ref.dets_center[i],
                                   atol=1e-6)
        np.testing.assert_allclose(ours.targets_neighbor[i],
                                   ref.targets_neighbor[i], atol=1e-6)

    # deterministic parts of __getitem__: canonicalized target (z/dims),
    # rot_z, det_center, box_center, and the input point SET (the angle
    # column and row order are randomized; drop/compare sorted unique xyz)
    for i in (0, len(ours) - 1):
        got, want = ours[i], ref[i]
        np.testing.assert_allclose(got["det_center"], want["det_center"],
                                   atol=1e-6)
        np.testing.assert_allclose(got["box_center"], want["box_center"],
                                   atol=1e-6)
        np.testing.assert_allclose(got["target"][:-1], want["target"][:-1],
                                   atol=1e-5)
        np.testing.assert_allclose(got["rot_z"], want["rot_z"], atol=1e-6)
        assert got["input"].shape == want["input"].shape == (256, 4)

        # the resample shuffles rows and the input-angle column is random;
        # check both outputs are exactly the canonicalized segment's point
        # set (repeat+pad preserves every point, adds none)
        canon = np.asarray(ours.inputs[i]) - np.asarray(ours.dets_center[i])
        for out in (got["input"], want["input"]):
            xyz = np.asarray(out[:, :3], np.float64)
            d_out = np.abs(xyz[:, None] - canon[None]).max(-1).min(1)
            assert d_out.max() < 1e-5  # every output row is a segment point
            d_in = np.abs(canon[:, None] - xyz[None]).max(-1).min(1)
            assert d_in.max() < 1e-5  # every segment point survived
