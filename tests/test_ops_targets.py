import numpy as np

import planar_optical_flow_tpu.ops as ops
from tests import oracles


def _pad_dets(dets, radii, labels, pad_to=8):
    d = np.zeros((pad_to, 2), dtype=np.float32)
    r = np.zeros(pad_to, dtype=np.float32)
    lb = np.zeros(pad_to, dtype=np.int32)
    v = np.zeros(pad_to, dtype=bool)
    for i, (det, rad, lab) in enumerate(zip(dets, radii, labels)):
        d[i] = det
        r[i] = rad
        lb[i] = lab
        v[i] = True
    return d, r, lb, v


def test_regression_targets_match_oracle(rng):
    phi = oracles.laser_phi()
    scan = rng.uniform(0.5, 15.0, size=450).astype(np.float32)
    # put detections right on some scan points so radii capture neighborhoods
    dets, radii, labels = [], [], []
    for j, (rad, lab) in enumerate([(0.6, 1), (0.4, 2), (0.35, 3), (0.6, 1)]):
        k = 50 + 100 * j
        dets.append((float(scan[k]), float(phi[k])))
        radii.append(rad)
        labels.append(lab)

    d, r, lb, v = _pad_dets(dets, radii, labels)
    cls, reg = ops.regression_targets(scan, phi, d, r, lb, v)
    cls_o, reg_o = oracles.regression_targets_loop(scan, phi, dets, radii, labels)

    np.testing.assert_array_equal(np.asarray(cls), cls_o)
    np.testing.assert_allclose(np.asarray(reg), reg_o, rtol=1e-4, atol=1e-5)
    assert (np.asarray(cls) > 0).sum() > 0


def test_regression_targets_empty_dets(rng):
    phi = oracles.laser_phi()
    scan = rng.uniform(0.5, 15.0, size=450).astype(np.float32)
    d, r, lb, v = _pad_dets([], [], [])
    cls, reg = ops.regression_targets(scan, phi, d, r, lb, v)
    assert (np.asarray(cls) == 0).all()
    assert (np.asarray(reg) == 0).all()


def test_flow_from_pose_pair_matches_oracle(rng):
    phi = oracles.laser_phi()
    scan = rng.uniform(0.5, 15.0, size=450)
    odom0 = np.array([1.0, -2.0, 0.3])
    odom1 = np.array([1.2, -1.9, 0.35])
    got = np.asarray(ops.flow_from_pose_pair(scan, phi, odom0, odom1))
    want = oracles.flow_between_poses(scan, phi, odom0, odom1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # canonical output == rotated global output
    got_c = np.asarray(
        ops.flow_from_pose_pair(scan, phi, odom0, odom1, to_canonical=True)
    )
    np.testing.assert_allclose(
        got_c, oracles.rotate_flow_to_canonical(want, phi), rtol=1e-4, atol=1e-5
    )


def test_displacement_from_odometry_matches_oracle(rng):
    xy = rng.normal(size=(450, 2)) * 5.0
    odom0 = np.array([0.4, 0.1, -0.2])
    odom1 = np.array([0.5, 0.15, -0.1])
    got = np.asarray(ops.displacement_from_odometry(xy, odom0, odom1))
    want = oracles.displacement_loop(xy, odom0, odom1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_displacement_consistent_with_pose_flow(rng):
    """For pure translation with zero heading both formulas describe the same
    apparent backward motion of static points."""
    phi = oracles.laser_phi()
    scan = rng.uniform(1.0, 10.0, size=450)
    odom0 = np.array([0.0, 0.0, 0.0])
    odom1 = np.array([0.3, -0.2, 0.0])
    xy1 = np.stack(
        (scan * np.cos(phi), scan * np.sin(phi)), axis=1
    )
    disp = np.asarray(ops.displacement_from_odometry(xy1, odom0, odom1))
    flow = np.asarray(ops.flow_from_pose_pair(scan, phi, odom0, odom1))
    np.testing.assert_allclose(disp, flow, rtol=1e-4, atol=1e-6)


def test_velocity_matches_displacement_small_motion(rng):
    """For infinitesimal motion the first-order velocity formula approaches
    the exact displacement."""
    xy = rng.normal(size=(100, 2)) * 3.0
    odom0 = np.array([1.0, 2.0, 0.5])
    eps = 1e-4
    odom1 = odom0 + np.array([0.3, -0.2, 0.1]) * eps
    v = np.asarray(ops.velocity_from_odometry(xy, odom0, odom1))
    d = np.asarray(ops.displacement_from_odometry(xy, odom0, odom1))
    np.testing.assert_allclose(v, d, atol=5e-5)


def test_masks(rng):
    phi = oracles.laser_phi()
    scan = rng.uniform(0.5, 25.0, size=450).astype(np.float32)
    xy = np.stack((scan * np.cos(phi), scan * np.sin(phi)), axis=1)
    dets_xy = xy[[100, 300]] + 0.01
    radii = np.array([2.0, 2.5], dtype=np.float32)
    valid = np.array([True, True])
    m = np.asarray(ops.dynamic_mask(xy, dets_xy, radii, valid))
    assert m[100] == 0.0 and m[300] == 0.0
    far = np.linalg.norm(xy - dets_xy[0], axis=1) > 2.0
    far &= np.linalg.norm(xy - dets_xy[1], axis=1) > 2.5
    np.testing.assert_array_equal(m.astype(bool), far)

    vm = np.asarray(ops.valid_range_mask(scan, 20.0))
    np.testing.assert_array_equal(vm, (scan < 20.0).astype(np.float32))
