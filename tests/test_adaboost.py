import numpy as np

from planar_optical_flow_tpu.models.adaboost_detector import (
    segment_scan,
    segment_features,
    BoostedSegmentClassifier,
    AdaBoostPersonDetector,
)
from planar_optical_flow_tpu.data import make_synthetic_drow_sequence
from planar_optical_flow_tpu.ops.geometry import get_laser_phi


def test_segment_scan_splits_at_jumps():
    phi = get_laser_phi(num_pts=20)
    scan = np.full(20, 5.0)
    scan[10:] = 8.0  # one jump
    segs = segment_scan(scan, phi, jump_dist=0.5)
    assert len(segs) == 2
    assert (segs[0] == np.arange(10)).all()


def test_segment_features_shape(rng):
    phi = get_laser_phi()
    scan = rng.uniform(1, 10, 450)
    segs = segment_scan(scan, phi)
    f = segment_features(scan, phi, segs[0])
    assert f.shape == (15,)
    assert np.isfinite(f).all()


def test_boost_learns_separable(rng):
    X = rng.normal(size=(200, 5))
    y = (X[:, 2] > 0.3).astype(int)
    clf = BoostedSegmentClassifier(n_estimators=10).fit(X, y)
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.95


def test_adaboost_detector_end_to_end():
    seq = make_synthetic_drow_sequence(num_frames=40, num_people=3, seed=3)
    det = AdaBoostPersonDetector(n_estimators=20)
    det.fit(seq["scans"][:30], seq["wps"][:30])

    # on training-domain frames the detector should find most people
    hits, total = 0, 0
    phi = get_laser_phi()
    frames = [t for t in range(1, 40) if len(seq["wps"][t])]
    assert frames, "synthetic sequence produced no visible people"
    for t in frames:
        dets_xy, scores = det.detect(seq["scans"][t], phi,
                                     prev_scan=seq["scans"][t - 1])
        gt = np.asarray(
            [[r * np.cos(a), r * np.sin(a)] for r, a in seq["wps"][t]]
        ).reshape(-1, 2)
        total += len(gt)
        for g in gt:
            if len(dets_xy) and np.linalg.norm(dets_xy - g, axis=1).min() < 0.6:
                hits += 1
    assert total > 0
    assert hits / total > 0.5, f"recall {hits}/{total}"
