"""Scan geometry: polar/Cartesian conversions and per-beam canonical frames.

Semantics follow the reference numpy implementations in
``/root/reference/src/utils/utils.py:25-126`` (SICK S300 layout: 450 beams,
0.5 deg increment, 225 deg FOV; canonical frame per beam with y pointing
outward along the beam, x pointing right).

Everything is written with broadcasting so the same function serves scalars,
single scans ``(P,)`` and batches ``(..., P)`` — no per-point loops anywhere.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_laser_phi(angle_inc: float = np.radians(0.5), num_pts: int = 450) -> np.ndarray:
    """Beam angles of the DROW laser (SICK S300, 225 deg FOV, 450 beams).

    Returns a host numpy array — this is static scan geometry, typically
    computed once and closed over by jitted functions.
    """
    fov = (num_pts - 1) * angle_inc
    return np.linspace(-0.5 * fov, 0.5 * fov, num_pts)


def rphi_to_xy(r, phi):
    """Polar (r, phi) -> Cartesian (x, y). Axes: x along phi=0, y to the side."""
    return r * jnp.cos(phi), r * jnp.sin(phi)


def xy_to_rphi(x, y):
    """Cartesian (x, y) -> polar (r, phi)."""
    return jnp.hypot(x, y), jnp.arctan2(y, x)


def scan_to_xy(scan, phi=None):
    """Convert a range scan to xy, defaulting to the DROW beam layout."""
    if phi is None:
        phi = jnp.asarray(get_laser_phi(num_pts=scan.shape[-1]))
    return rphi_to_xy(scan, phi)


def global_to_canonical(scan_r, scan_phi, dets_r, dets_phi):
    """Express detections (r, phi) in the per-beam canonical frame.

    Canonical frame sits on the scan point; y points outward along the beam,
    x points right. Reference: ``utils.py:55-59``.
    """
    dx = jnp.sin(dets_phi - scan_phi) * dets_r
    dy = jnp.cos(dets_phi - scan_phi) * dets_r - scan_r
    return dx, dy


def canonical_to_global(scan_r, scan_phi, dx, dy):
    """Inverse of :func:`global_to_canonical`. Reference: ``utils.py:109-116``."""
    tmp_y = scan_r + dy
    # dx first: canonical x maps to the lateral direction of the beam.
    tmp_phi = jnp.arctan2(dx, tmp_y)
    dets_phi = tmp_phi + scan_phi
    dets_r = tmp_y / jnp.cos(tmp_phi)
    return dets_r, dets_phi


def global_to_canonical_flow(flow, scan_phi):
    """Rotate per-point flow vectors from the global frame into per-beam
    canonical frames.

    ``flow`` has shape ``(..., P, 2)``; ``scan_phi`` broadcasts as ``(P,)``
    or ``(..., P)``. Applies R(+phi) = [[c, -s], [s, c]] per point
    (reference ``utils.py:62-75``), but with broadcasting instead of an
    einsum over stacked 2x2 matrices.
    """
    c = jnp.cos(scan_phi)
    s = jnp.sin(scan_phi)
    fx, fy = flow[..., 0], flow[..., 1]
    return jnp.stack((c * fx - s * fy, s * fx + c * fy), axis=-1)


def canonical_to_global_flow(flow_canonical, scan_phi):
    """Inverse rotation of :func:`global_to_canonical_flow`
    (reference ``utils.py:78-89``)."""
    c = jnp.cos(scan_phi)
    s = jnp.sin(scan_phi)
    fx, fy = flow_canonical[..., 0], flow_canonical[..., 1]
    return jnp.stack((c * fx + s * fy, -s * fx + c * fy), axis=-1)


def phi_rotation_matrix(phi, is_3d: bool = False):
    """2x2 (or 3x3 about z) rotation matrix R(phi); batched over leading dims.

    Reference: ``utils.py:601-606``.
    """
    c, s = jnp.cos(phi), jnp.sin(phi)
    if is_3d:
        z = jnp.zeros_like(c)
        o = jnp.ones_like(c)
        rows = jnp.stack(
            [
                jnp.stack([c, -s, z], axis=-1),
                jnp.stack([s, c, z], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )
    else:
        rows = jnp.stack(
            [
                jnp.stack([c, -s], axis=-1),
                jnp.stack([s, c], axis=-1),
            ],
            axis=-2,
        )
    return rows
