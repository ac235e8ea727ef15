import numpy as np
import jax

import planar_optical_flow_tpu.ops as ops
from planar_optical_flow_tpu.ops.nms import unpack_detections
from tests import oracles


# ------------------------------------------------------------------- NMS


def _fake_votes(rng, num_pts=450):
    phi = oracles.laser_phi(num_pts)
    scan = rng.uniform(1.0, 10.0, size=num_pts).astype(np.float32)
    pred_cls = rng.uniform(size=(num_pts, 1)).astype(np.float32)
    pred_reg = rng.normal(scale=0.3, size=(num_pts, 2)).astype(np.float32)
    return scan, phi, pred_cls, pred_reg


def test_nms_matches_oracle(rng):
    scan, phi, pred_cls, pred_reg = _fake_votes(rng)
    det_xys, det_cls, keep, inst = ops.nms_predicted_center(
        scan, phi, pred_cls, pred_reg
    )
    got_xys, got_cls = unpack_detections(det_xys, det_cls, keep)
    want_xys, want_cls, want_inst = oracles.nms_loop(scan, phi, pred_cls, pred_reg)
    np.testing.assert_allclose(got_xys, want_xys, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_cls, want_cls, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(inst), want_inst)


def test_nms_suppression_distance(rng):
    """Kept detections are pairwise farther apart than min_dist."""
    scan, phi, pred_cls, pred_reg = _fake_votes(rng)
    det_xys, _, keep, inst = ops.nms_predicted_center(
        scan, phi, pred_cls, pred_reg, min_dist=0.5
    )
    kept = np.asarray(det_xys)[np.asarray(keep)]
    d = np.linalg.norm(kept[:, None] - kept[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 0.5
    # every point got an instance id
    assert (np.asarray(inst) > 0).all()


def test_nms_jittable(rng):
    scan, phi, pred_cls, pred_reg = _fake_votes(rng)
    fn = jax.jit(lambda s, c, r: ops.nms_predicted_center(s, phi, c, r))
    det_xys, det_cls, keep, inst = fn(scan, pred_cls, pred_reg)
    assert det_xys.shape == (450, 2)


# ------------------------------------------------------------------- IoU


def test_iou_identical_box():
    box = np.array([[1.0, 2.0, 3.0, 1.5, 0.7]])
    iou = np.asarray(ops.rotated_iou(box, box))
    np.testing.assert_allclose(iou, [[1.0]], rtol=1e-5)


def test_iou_disjoint():
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
    b = np.array([[10.0, 0.0, 1.0, 1.0, -0.2]])
    np.testing.assert_allclose(np.asarray(ops.rotated_iou(a, b)), [[0.0]],
                               atol=1e-7)


def test_iou_axis_aligned_analytic():
    # two unit squares overlapping by 0.5 in x: inter 0.5, union 1.5
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.5, 0.0, 1.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ops.rotated_iou(a, b)),
                               [[0.5 / 1.5]], rtol=1e-5)


def test_iou_rotated_45_analytic():
    # unit square vs itself rotated 45 deg: octagon inter = 2*(sqrt(2)-1)
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    want = inter / (2 - inter)
    np.testing.assert_allclose(np.asarray(ops.rotated_iou(a, b)),
                               [[want]], rtol=1e-5)


def test_iou_contained_box():
    a = np.array([[0.0, 0.0, 4.0, 4.0, 0.2]])
    b = np.array([[0.0, 0.0, 1.0, 2.0, 1.1]])
    want = 2.0 / 16.0
    np.testing.assert_allclose(np.asarray(ops.rotated_iou(a, b)),
                               [[want]], rtol=1e-5)


def test_iou_random_vs_monte_carlo(rng):
    for seed in range(6):
        r = np.random.default_rng(seed)
        b1 = np.array([r.uniform(-1, 1), r.uniform(-1, 1),
                       r.uniform(0.5, 2.5), r.uniform(0.5, 2.5),
                       r.uniform(-np.pi, np.pi)])
        b2 = np.array([r.uniform(-1, 1), r.uniform(-1, 1),
                       r.uniform(0.5, 2.5), r.uniform(0.5, 2.5),
                       r.uniform(-np.pi, np.pi)])
        got = float(np.asarray(ops.rotated_iou(b1[None], b2[None]))[0, 0])
        want = oracles.mc_rotated_iou(b1, b2, n=400_000, seed=seed)
        assert abs(got - want) < 0.01, (seed, got, want)


def test_iou_pairwise_matrix(rng):
    boxes = np.stack([
        [0.0, 0.0, 1.0, 1.0, 0.0],
        [5.0, 5.0, 2.0, 1.0, 0.5],
        [0.2, 0.1, 1.0, 1.0, 0.1],
    ])
    iou = np.asarray(ops.rotated_iou(boxes, boxes))
    assert iou.shape == (3, 3)
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)
    np.testing.assert_allclose(iou, iou.T, rtol=1e-4, atol=1e-6)
    assert iou[0, 1] < 1e-6 and iou[0, 2] > 0.5


def test_iou_3d_reference_smoke():
    """The reference's __main__ micro-check (rotate_iou.py:407-412):
    unit cubes offset 0.7 in z -> height overlap 0.3, union 1.7."""
    b1 = np.array([[0.0, 0.0, 0.7, 1.0, 1.0, 1.0, 0.0]])
    b2 = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    got = np.asarray(ops.rotated_iou_3d(b1, b2))
    np.testing.assert_allclose(got, [[0.3 / 1.7]], rtol=1e-5)


def test_iou_3d_no_height_overlap():
    b1 = np.array([[0.0, 0.0, 2.0, 1.0, 1.0, 1.0, 0.3]])
    b2 = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.3]])
    np.testing.assert_allclose(np.asarray(ops.rotated_iou_3d(b1, b2)),
                               [[0.0]], atol=1e-7)


def test_iou_criterion_modes():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    # b inside a: inter = 1
    np.testing.assert_allclose(np.asarray(ops.rotated_iou(a, b, criterion=0)),
                               [[0.25]], rtol=1e-5)  # / area(a)
    np.testing.assert_allclose(np.asarray(ops.rotated_iou(a, b, criterion=1)),
                               [[1.0]], rtol=1e-5)  # / area(b)


def test_iou_jit_batch(rng):
    boxes = rng.uniform(0.5, 2.0, size=(32, 5)).astype(np.float32)
    gts = rng.uniform(0.5, 2.0, size=(16, 5)).astype(np.float32)
    fn = jax.jit(ops.rotated_iou)
    iou = np.asarray(fn(boxes, gts))
    assert iou.shape == (32, 16)
    assert (iou >= -1e-6).all() and (iou <= 1.0 + 1e-5).all()


def test_aabb_iou():
    a = np.array([0.0, 0.0, 2.0, 2.0])
    b = np.array([1.0, 0.0, 2.0, 2.0])
    got = float(np.asarray(ops.aabb_iou(a, b)))
    # inter 1x2=2, union 8-2=6
    np.testing.assert_allclose(got, 2.0 / 6.0, rtol=1e-6)
    # matches rotated kernel at angle 0
    ra = np.concatenate([a, [0.0]])[None]
    rb = np.concatenate([b, [0.0]])[None]
    np.testing.assert_allclose(
        got, float(np.asarray(ops.rotated_iou(ra, rb))[0, 0]), rtol=1e-5
    )


def test_nms_while_matches_fori(rng):
    scan, phi, pred_cls, pred_reg = _fake_votes(rng)
    a = ops.nms_predicted_center(scan, phi, pred_cls, pred_reg)
    b = ops.nms_predicted_center(scan, phi, pred_cls, pred_reg,
                                 method="while")
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))  # keep
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))  # inst
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_nms_while_matches_oracle(rng):
    scan, phi, pred_cls, pred_reg = _fake_votes(rng)
    det_xys, det_cls, keep, inst = ops.nms_predicted_center(
        scan, phi, pred_cls, pred_reg, method="while"
    )
    got_xys, got_cls = unpack_detections(det_xys, det_cls, keep)
    want_xys, want_cls, want_inst = oracles.nms_loop(scan, phi, pred_cls,
                                                     pred_reg)
    np.testing.assert_allclose(got_xys, want_xys, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(inst), want_inst)


def test_nms_topk_matches_full(rng):
    """Top-k NMS keeps exactly the same detections as the full greedy pass
    (restricted to the top-k slots), on clustered vote patterns."""
    import jax.numpy as jnp

    from planar_optical_flow_tpu.ops.nms import (
        nms_predicted_center, nms_predicted_center_topk,
    )
    from planar_optical_flow_tpu.ops.geometry import get_laser_phi

    num_pts = 450
    phi = jnp.asarray(get_laser_phi(num_pts=num_pts), jnp.float32)
    scan = jnp.asarray(rng.uniform(1.0, 15.0, num_pts), jnp.float32)
    # votes clustered around a handful of centers
    pred_reg = jnp.asarray(rng.normal(scale=0.1, size=(num_pts, 2)),
                           jnp.float32)
    pred_cls = jnp.asarray(rng.uniform(0, 1, (num_pts, 1)), jnp.float32)

    xys_f, cls_f, keep_f, _ = nms_predicted_center(
        scan, phi, pred_cls, pred_reg, min_dist=0.5
    )
    xys_k, cls_k, keep_k, inst_k = nms_predicted_center_topk(
        scan, phi, pred_cls, pred_reg, min_dist=0.5, top_k=64
    )
    kept_full = np.asarray(xys_f)[np.asarray(keep_f)]
    kept_topk = np.asarray(xys_k)[np.asarray(keep_k)]
    # the kept sets agree up to the first len(kept_topk) (full may keep
    # extra ultra-low-confidence tail detections beyond the top-64)
    m = min(len(kept_full), len(kept_topk))
    assert m > 0
    np.testing.assert_allclose(kept_topk[:m], kept_full[:m], rtol=1e-5)
    conf_f = np.asarray(cls_f)[np.asarray(keep_f), 0]
    conf_k = np.asarray(cls_k)[np.asarray(keep_k), 0]
    np.testing.assert_allclose(conf_k[:m], conf_f[:m], rtol=1e-6)
    assert inst_k.shape == (num_pts,)


# ------------------------------------------- batched vs Sutherland–Hodgman


def test_iou_batched_matches_sh_random():
    """The order-free boundary-integral form (default) against the per-pair
    Sutherland–Hodgman clipper on a dense random (N, K) matrix: realistic
    box populations (lidar-scale coords, mixed sizes/angles) incl. many
    partial overlaps."""
    r = np.random.default_rng(7)
    n, k = 40, 24
    a = np.zeros((n, 5), np.float32)
    b = np.zeros((k, 5), np.float32)
    for arr, m in ((a, n), (b, k)):
        arr[:, 0:2] = r.uniform(-3, 3, (m, 2))
        arr[:, 2:4] = r.uniform(0.3, 3.0, (m, 2))
        arr[:, 4] = r.uniform(-np.pi, np.pi, m)
    got = np.asarray(ops.rotated_iou(a, b))
    want = np.asarray(ops.rotated_iou_sh(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_iou_batched_matches_sh_structured():
    """Degenerate-adjacent structured cases: identical boxes, contained,
    shared collinear edges (the double-count hazard of the boundary-integral
    form), corner touching, axis-aligned grids."""
    cases = [
        [0.0, 0.0, 1.0, 1.0, 0.0],
        [0.0, 0.0, 1.0, 1.0, 0.0],       # identical
        [0.5, 0.0, 1.0, 1.0, 0.0],       # shared collinear top/bottom
        [1.0, 0.0, 1.0, 1.0, 0.0],       # edge touching only
        [1.0, 1.0, 1.0, 1.0, 0.0],       # corner touching only
        [0.0, 0.0, 4.0, 4.0, 0.2],       # contains the rotated ones
        [0.0, 0.0, 1.0, 2.0, 1.1],
        [0.0, 0.0, 1.0, 1.0, np.pi / 4],
        [0.25, 0.25, 0.5, 0.5, 0.0],     # contained, shares no boundary
        [0.0, 0.0, 2.0, 1.0, np.pi / 2],  # 90-degree rotation
    ]
    boxes = np.asarray(cases, np.float32)
    got = np.asarray(ops.rotated_iou(boxes, boxes))
    want = np.asarray(ops.rotated_iou_sh(boxes, boxes))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.diag(got), 1.0, rtol=1e-5)


def test_iou_batched_criterion_and_3d_match_sh():
    r = np.random.default_rng(3)
    a2 = np.concatenate([r.uniform(-2, 2, (12, 2)), r.uniform(0.5, 2, (12, 2)),
                         r.uniform(-3, 3, (12, 1))], 1).astype(np.float32)
    b2 = np.concatenate([r.uniform(-2, 2, (9, 2)), r.uniform(0.5, 2, (9, 2)),
                         r.uniform(-3, 3, (9, 1))], 1).astype(np.float32)
    for crit in (-1, 0, 1, 2):
        got = np.asarray(ops.rotated_iou(a2, b2, criterion=crit))
        want = np.asarray(ops.rotated_iou_sh(a2, b2, criterion=crit))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # 3D: z-extruded 2D boxes; overlap area term must match the SH form
    a3 = np.concatenate([a2[:, :2], r.uniform(-1, 1, (12, 1)),
                         a2[:, 2:4], r.uniform(0.5, 2, (12, 1)),
                         a2[:, 4:]], 1).astype(np.float32)
    b3 = np.concatenate([b2[:, :2], r.uniform(-1, 1, (9, 1)),
                         b2[:, 2:4], r.uniform(0.5, 2, (9, 1)),
                         b2[:, 4:]], 1).astype(np.float32)
    got3 = np.asarray(ops.rotated_iou_3d(a3, b3))
    assert got3.shape == (12, 9)
    assert (got3 >= -1e-6).all() and (got3 <= 1.0 + 1e-5).all()


def test_iou_batched_vmap_per_sample():
    """The BoxRegressionTask metrics path vmaps (1, K) calls; the batched
    form must vmap cleanly and agree with the direct matrix."""
    r = np.random.default_rng(11)
    boxes = np.concatenate([r.uniform(-2, 2, (6, 2)), r.uniform(0.5, 2, (6, 2)),
                            r.uniform(-3, 3, (6, 1))], 1).astype(np.float32)
    nbrs = np.concatenate([r.uniform(-2, 2, (6, 4, 2)),
                           r.uniform(0.5, 2, (6, 4, 2)),
                           r.uniform(-3, 3, (6, 4, 1))], 2).astype(np.float32)
    per = jax.vmap(lambda b, nb: ops.rotated_iou(b[None], nb)[0])(boxes, nbrs)
    direct = np.stack([np.asarray(ops.rotated_iou(boxes[i:i + 1], nbrs[i]))[0]
                       for i in range(6)])
    np.testing.assert_allclose(np.asarray(per), direct, rtol=1e-5, atol=1e-6)


def test_iou_paired_matches_matrix_diagonal():
    r = np.random.default_rng(5)
    a = np.concatenate([r.uniform(-2, 2, (20, 2)), r.uniform(0.5, 2, (20, 2)),
                        r.uniform(-3, 3, (20, 1))], 1).astype(np.float32)
    b = np.concatenate([r.uniform(-2, 2, (20, 2)), r.uniform(0.5, 2, (20, 2)),
                        r.uniform(-3, 3, (20, 1))], 1).astype(np.float32)
    got = np.asarray(ops.rotated_iou_paired(a, b))
    want = np.diag(np.asarray(ops.rotated_iou(a, b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    def to3d(b2d, rr):  # [cx,cy,l,w,ang] -> [cx,cy,cz,l,w,h,rot_z]
        return np.column_stack([
            b2d[:, 0], b2d[:, 1], rr.uniform(-1, 1, len(b2d)),
            b2d[:, 2], b2d[:, 3], rr.uniform(0.5, 2, len(b2d)),
            b2d[:, 4]]).astype(np.float32)

    a3, b3 = to3d(a, r), to3d(b, r)
    got3 = np.asarray(ops.rotated_iou_3d_paired(a3, b3))
    want3 = np.diag(np.asarray(ops.rotated_iou_3d(a3, b3)))
    np.testing.assert_allclose(got3, want3, rtol=1e-5, atol=1e-7)
