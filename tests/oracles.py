"""Plain-numpy oracle implementations used as executable specs.

These are deliberately written as simple scalar/loop code, independent of the
vectorized jnp ops in ``planar_optical_flow_tpu.ops``, mirroring the
mathematical definitions in the reference repo (cited per function). The
tests assert the jitted TPU-path ops match these oracles — the same
methodology the reference used internally for its numpy/torch cutout pair
(``/root/reference/src/utils/utils.py:411-418``).
"""

from __future__ import annotations

import math

import numpy as np


def laser_phi(num_pts=450, angle_inc=math.radians(0.5)):
    fov = (num_pts - 1) * angle_inc
    return np.linspace(-0.5 * fov, 0.5 * fov, num_pts)


# ---------------------------------------------------------------- geometry


def canonical_offset(scan_r, scan_phi, det_r, det_phi):
    """Spec of utils.py:55-59 for scalars."""
    dx = math.sin(det_phi - scan_phi) * det_r
    dy = math.cos(det_phi - scan_phi) * det_r - scan_r
    return dx, dy


def canonical_to_global_point(scan_r, scan_phi, dx, dy):
    """Spec of utils.py:109-116 for scalars."""
    tmp_y = scan_r + dy
    tmp_phi = math.atan2(dx, tmp_y)
    return tmp_y / math.cos(tmp_phi), tmp_phi + scan_phi


def rotate_flow_to_canonical(flow, phi):
    """Spec of utils.py:62-75: per-point R(+phi) @ flow."""
    out = np.zeros_like(flow)
    for i in range(len(flow)):
        c, s = math.cos(phi[i]), math.sin(phi[i])
        out[i, 0] = c * flow[i, 0] - s * flow[i, 1]
        out[i, 1] = s * flow[i, 0] + c * flow[i, 1]
    return out


def rotate_flow_to_global(flow_c, phi):
    """Spec of utils.py:78-89: per-point R(-phi) @ flow."""
    out = np.zeros_like(flow_c)
    for i in range(len(flow_c)):
        c, s = math.cos(phi[i]), math.sin(phi[i])
        out[i, 0] = c * flow_c[i, 0] + s * flow_c[i, 1]
        out[i, 1] = -s * flow_c[i, 0] + c * flow_c[i, 1]
    return out


# ----------------------------------------------------------------- targets


def regression_targets_loop(scan, phi, dets, radii, labels):
    """Spec of utils.py:147-256: per-point closest in-radius detection.

    dets: list of (r, phi); radii/labels: parallel lists. Returns
    (cls (P,), reg (P,2)).
    """
    num = len(scan)
    cls = np.zeros(num, dtype=np.int64)
    reg = np.zeros((num, 2), dtype=np.float32)
    if not dets:
        return cls, reg
    det_xy = [(r * math.cos(p), r * math.sin(p)) for r, p in dets]
    for i in range(num):
        px = scan[i] * math.cos(phi[i])
        py = scan[i] * math.sin(phi[i])
        best, best_d = -1, 0.0
        for j, (dx, dy) in enumerate(det_xy):
            d = math.hypot(px - dx, py - dy) - radii[j]
            if d < best_d:
                best, best_d = j, d
        if best >= 0:
            cls[i] = labels[best]
            reg[i] = canonical_offset(scan[i], phi[i], dets[best][0], dets[best][1])
    return cls, reg


def flow_between_poses(scan, phi, odom0, odom1):
    """Spec of utils.py:204-229 (rigid ego-motion flow)."""

    def rot(a):
        return np.array([[math.cos(a), -math.sin(a)], [math.sin(a), math.cos(a)]])

    r0 = rot(odom0[2])
    r1 = rot(odom1[2] - odom0[2])
    trans = (odom1[:2] - odom0[:2]) @ r0.T  # row-vec form of R0 @ t
    xy0 = np.stack((scan * np.cos(phi), scan * np.sin(phi)), axis=1)
    xy1 = xy0 @ r1.T - trans
    return xy1 - xy0


def displacement_loop(scan_xy, odom0, odom1):
    """Spec of utils.py:639-662."""

    def rot(a):
        return np.array([[math.cos(a), -math.sin(a)], [math.sin(a), math.cos(a)]])

    r0, r1 = rot(odom0[2]), rot(odom1[2])
    m = np.eye(2) - r0.T @ r1
    t = (odom1[:2] - odom0[:2]).reshape(2, 1)
    return scan_xy @ m.T - (r0.T @ t).reshape(1, 2)


# ------------------------------------------------------------------ cutout


def cutout_loop(scans, phi, stride=1, centered=True, fixed=False,
                window_width=1.66, window_depth=1.0, num_cutout_pts=48,
                padding_val=29.99, area_mode=False):
    """Scalar spec of utils.py:259-334 (numpy path, the chosen oracle).

    Returns (cutouts (P', S, C), s_area used).
    """
    num_scans, num_pts = scans.shape
    pts_out = range(0, num_pts, stride)
    angle_inc = phi[1] - phi[0]
    out = np.zeros((len(pts_out), num_scans, num_cutout_pts), dtype=np.float32)

    # first pass: data-dependent area oversampling factor (utils.py:304-308)
    s_area = 1
    if area_mode:
        max_span = 0.0
        for si in range(num_scans):
            for oi, p in enumerate(pts_out):
                dist = scans[si, p] if fixed else scans[-1, p]
                ha = math.atan(0.5 * window_width / max(dist, 1e-2))
                lo = (phi[p] - ha - phi[0]) / angle_inc
                hi = (phi[p] + ha - phi[0]) / angle_inc
                max_span = max(max_span, hi - lo)
        if max_span > num_cutout_pts:
            s_area = int(math.ceil(max_span / num_cutout_pts))

    for si in range(num_scans):
        for oi, p in enumerate(pts_out):
            dist = scans[si, p] if fixed else scans[-1, p]
            ha = math.atan(0.5 * window_width / max(dist, 1e-2))
            vals = np.zeros(num_cutout_pts, dtype=np.float64)
            span = None
            # point sampling with linear interpolation
            delta = 2.0 * ha / (num_cutout_pts - 1)
            inds = [
                (phi[p] - ha + k * delta - phi[0]) / angle_inc
                for k in range(num_cutout_pts)
            ]
            span = inds[-1] - inds[0]
            for k, ind in enumerate(inds):
                lo = int(np.clip(math.floor(ind), 0, num_pts - 1))
                hi = int(np.clip(lo + 1, 0, num_pts - 1))
                frac = np.clip(ind - lo, 0.0, 1.0)
                vals[k] = scans[si, lo] + frac * (scans[si, hi] - scans[si, lo])
            # area averaging for wide windows (utils.py:303-323)
            if area_mode and s_area > 1 and span > num_cutout_pts:
                n_area = s_area * num_cutout_pts
                delta_a = 2.0 * ha / (n_area - 1)
                samples = np.zeros(n_area)
                for k in range(n_area):
                    ind = (phi[p] - ha + k * delta_a - phi[0]) / angle_inc
                    ind = int(np.rint(np.clip(ind, 0, num_pts - 1)))
                    samples[k] = scans[si, ind]
                vals = samples.reshape(num_cutout_pts, s_area).mean(axis=1)
            # padding, depth clipping, normalization
            for k, ind in enumerate(inds):
                if ind < 0 or ind > num_pts - 1:
                    vals[k] = padding_val
            vals = np.clip(vals, dist - window_depth, dist + window_depth)
            if centered:
                vals = (vals - dist) / window_depth
            out[oi, si] = vals
    return out, s_area


# ---------------------------------------------------------------- polar grid


def polar_grid_loop(scans, min_range=0.0, max_range=30.0, range_bin_size=1.0,
                    tsdf_clip=1.0, normalize=True):
    """Scalar spec of utils.py:492-531."""
    num_scans, num_pts = scans.shape
    num_range = int((max_range - min_range) / range_bin_size) + 1
    mag = max_range - min_range
    mid = 0.5 * (max_range - min_range)
    grid = np.zeros((num_scans, num_range, num_pts), dtype=np.float32)
    clipped = np.clip(scans, min_range, max_range)
    for s in range(num_scans):
        for p in range(num_pts):
            val = clipped[s, p]
            ind = int((val - min_range) / range_bin_size)
            if tsdf_clip > 0:
                tsdf = (np.arange(num_range) - ind) * range_bin_size
                tsdf = np.clip(tsdf, -tsdf_clip, tsdf_clip)
            else:
                tsdf = np.zeros(num_range)
            if normalize:
                val = (val - mid) / mag * 2.0
                tsdf = tsdf / mag * 2.0
            tsdf[ind] = val
            grid[s, :, p] = tsdf
    return grid


# --------------------------------------------------------------------- nms


def nms_loop(scan, phi, pred_cls, pred_reg, min_dist=0.5):
    """Spec of utils.py:535-571 (greedy center NMS)."""
    xs = np.zeros(len(scan))
    ys = np.zeros(len(scan))
    for i in range(len(scan)):
        r, p = canonical_to_global_point(scan[i], phi[i], pred_reg[i, 0],
                                         pred_reg[i, 1])
        xs[i], ys[i] = r * math.cos(p), r * math.sin(p)
    order = np.argsort(pred_cls[:, 0])[::-1]
    xs, ys = xs[order], ys[order]
    cls_sorted = pred_cls[order]
    n = len(scan)
    keep = np.ones(n, dtype=bool)
    inst = np.zeros(n, dtype=np.int32)
    next_id = 1
    for i in range(n):
        if not keep[i]:
            continue
        dup = np.hypot(xs - xs[i], ys - ys[i]) < min_dist
        keep[dup] = False
        keep[i] = True
        inst[order[dup]] = next_id
        next_id += 1
    det_xys = np.stack((xs, ys), axis=1)
    return det_xys[keep], cls_sorted[keep], inst


# ----------------------------------------------------------------- iou (MC)


def mc_rotated_iou(box1, box2, n=200_000, seed=0):
    """Monte-Carlo estimate of rotated-rectangle IoU — an implementation-
    independent check for the polygon-clipping kernel."""

    def contains(box, pts):
        c, s = math.cos(box[4]), math.sin(box[4])
        # undo the clockwise rotation used by box_corners
        d = pts - box[:2]
        lx = c * d[:, 0] - s * d[:, 1]
        ly = s * d[:, 0] + c * d[:, 1]
        return (np.abs(lx) <= box[2] / 2) & (np.abs(ly) <= box[3] / 2)

    rng = np.random.default_rng(seed)
    span = max(box1[2], box1[3], box2[2], box2[3])
    lo = np.minimum(box1[:2], box2[:2]) - span
    hi = np.maximum(box1[:2], box2[:2]) + span
    pts = rng.uniform(lo, hi, size=(n, 2))
    in1 = contains(np.asarray(box1, float), pts)
    in2 = contains(np.asarray(box2, float), pts)
    inter = np.sum(in1 & in2)
    union = np.sum(in1 | in2)
    return inter / max(union, 1)
