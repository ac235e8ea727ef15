"""Training-target construction: per-point class/offset targets and
ego-motion flow targets.

These are the on-device, batched equivalents of the per-sample host loops in
the reference (``/root/reference/src/utils/utils.py:147-256`` regression
targets, ``:204-229`` rigid-motion flow, ``:609-662`` odometry-apparent
motion, ``src/utils/dataset_dr_spaam.py:511-529`` masks).

Variable-length detection lists are handled with fixed-size padding plus a
validity mask, keeping every shape static for XLA. All functions vmap/jit
cleanly over leading batch dimensions of the scan arguments.
"""

from __future__ import annotations

import jax.numpy as jnp

from planar_optical_flow_tpu.ops.geometry import (
    rphi_to_xy,
    global_to_canonical,
    global_to_canonical_flow,
    phi_rotation_matrix,
)

_BIG = 1e9


def closest_detection(scan, scan_phi, dets_rphi, dets_radius, dets_valid=None):
    """For each scan point, the (1-based) index of the closest detection whose
    radius contains the point; 0 if no detection is close enough.

    Args:
      scan: ``(P,)`` ranges.
      scan_phi: ``(P,)`` beam angles.
      dets_rphi: ``(D, 2)`` detections as (r, phi); D is a padded static size.
      dets_radius: ``(D,)`` per-detection capture radius.
      dets_valid: optional ``(D,)`` bool mask for padded entries.

    Returns:
      ``(P,)`` int32 indices (0 = none). Reference: ``utils.py:232-256``.
    """
    px, py = rphi_to_xy(scan, scan_phi)
    dx, dy = rphi_to_xy(dets_rphi[..., 0], dets_rphi[..., 1])
    dists = jnp.hypot(px[:, None] - dx[None, :], py[:, None] - dy[None, :])
    dists = dists - dets_radius[None, :]
    if dets_valid is not None:
        dists = jnp.where(dets_valid[None, :], dists, _BIG)
    # A zero column at index 0 wins for any point outside every radius.
    dists = jnp.concatenate([jnp.zeros_like(scan)[:, None], dists], axis=1)
    return jnp.argmin(dists, axis=1).astype(jnp.int32)


def regression_targets(scan, scan_phi, dets_rphi, dets_radius, dets_label,
                       dets_valid=None):
    """Per-point class label and canonical-frame offset to the matched
    detection.

    Args:
      scan, scan_phi: ``(P,)``.
      dets_rphi: ``(D, 2)`` padded detections (r, phi).
      dets_radius: ``(D,)`` capture radii.
      dets_label: ``(D,)`` int class labels (e.g. 1=wc, 2=wa, 3=wp, or all 1
        for pedestrian-only).
      dets_valid: optional ``(D,)`` bool padding mask.

    Returns:
      (target_cls ``(P,)`` int32, target_reg ``(P, 2)`` float32).
      Reference: ``utils.py:147-185``.
    """
    idx = closest_detection(scan, scan_phi, dets_rphi, dets_radius, dets_valid)
    hit = idx > 0
    safe = jnp.maximum(idx - 1, 0)
    target_cls = jnp.where(hit, dets_label[safe], 0).astype(jnp.int32)
    dx, dy = global_to_canonical(
        scan, scan_phi, dets_rphi[safe, 0], dets_rphi[safe, 1]
    )
    target_reg = jnp.stack((dx, dy), axis=-1) * hit[:, None]
    return target_cls, target_reg.astype(jnp.float32)


def flow_from_pose_pair(scan, scan_phi, odom0, odom1, to_canonical=False):
    """Rigid ego-motion flow of static points between two absolute poses.

    ``odom*`` are ``(..., 3)`` poses (x, y, phi) in the world frame. Returns
    per-point displacement ``(..., P, 2)`` in the frame of pose 0.
    Reference: ``utils.py:204-229``.
    """
    phi0 = odom0[..., 2]
    rot0 = phi_rotation_matrix(phi0)  # world <- frame0
    dphi = odom1[..., 2] - odom0[..., 2]
    rot1 = phi_rotation_matrix(dphi)  # frame0 scan -> frame1 scan

    trans_world = odom1[..., :2] - odom0[..., :2]
    # world translation expressed in frame 0: t @ R0 (row-vector convention)
    trans_frame0 = jnp.einsum("...j,...ij->...i", trans_world, rot0)

    x, y = rphi_to_xy(scan, scan_phi)
    xy0 = jnp.stack((x, y), axis=-1)  # (..., P, 2)
    xy1 = jnp.einsum("...pj,...ij->...pi", xy0, rot1) - trans_frame0[..., None, :]
    flow = xy1 - xy0
    if to_canonical:
        flow = global_to_canonical_flow(flow, scan_phi)
    return flow


def displacement_from_odometry(scan1_xy, odom0, odom1):
    """Apparent displacement of stationary points caused by scanner motion.

    ``scan1_xy``: ``(..., P, 2)`` points in the current scanner frame;
    ``odom0``/``odom1``: ``(..., 3)`` previous/current absolute poses.
    Reference derivation: ``utils.py:639-662``:
        scan0_xy = R0^T (R1 scan1_xy + t1 - t0);  disp = scan1_xy - scan0_xy
    which collapses to ``scan1_xy @ (I - R0^T R1)^T - (R0^T (t1 - t0))``.
    """
    rot0 = phi_rotation_matrix(odom0[..., 2])
    rot1 = phi_rotation_matrix(odom1[..., 2])
    eye = jnp.eye(2, dtype=scan1_xy.dtype)
    rot = eye - jnp.einsum("...ki,...kj->...ij", rot0, rot1)  # I - R0^T R1
    tran = odom1[..., :2] - odom0[..., :2]
    tran0 = jnp.einsum("...ki,...k->...i", rot0, tran)  # R0^T t
    return jnp.einsum("...pj,...ij->...pi", scan1_xy, rot) - tran0[..., None, :]


def velocity_from_odometry(scan1_xy, odom0, odom1):
    """Apparent velocity (times dt) of stationary points from scanner motion.

    Reference: ``utils.py:609-636``:
        v*dt = -R1^T (t1 - t0) - dphi * J @ scan1_xy,  J = [[0,-1],[1,0]]
    """
    dpose = odom1 - odom0
    rot1 = phi_rotation_matrix(odom1[..., 2])
    dxy1 = jnp.einsum("...ki,...k->...i", rot1, dpose[..., :2])  # R1^T dt
    dphi = dpose[..., 2]
    x, y = scan1_xy[..., 0], scan1_xy[..., 1]
    # cross([0,0,dphi], p) restricted to the plane = dphi * (-y, x)
    rot_term = jnp.stack((-y, x), axis=-1) * dphi[..., None, None]
    return -dxy1[..., None, :] - rot_term


def dynamic_mask(scan_xy, dets_xy, dets_radius, dets_valid=None):
    """1.0 for points farther than every detection radius (static points),
    0.0 for points near any annotated person (dynamic).

    Reference: ``dataset_dr_spaam.py:511-523``.
    """
    d = jnp.linalg.norm(scan_xy[..., :, None, :] - dets_xy[..., None, :, :], axis=-1)
    inside = d <= dets_radius[..., None, :]
    if dets_valid is not None:
        inside = jnp.logical_and(inside, dets_valid[..., None, :])
    return jnp.where(jnp.any(inside, axis=-1), 0.0, 1.0)


def valid_range_mask(scan, thresh: float = 20.0):
    """1.0 where the return is closer than ``thresh`` meters.

    Reference: ``dataset_dr_spaam.py:525-529``.
    """
    return jnp.where(scan >= thresh, 0.0, 1.0)
