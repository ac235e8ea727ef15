"""Offline data preparation: derive ``.difodom`` and ``.flow`` files from
raw DROW sequences.

TPU-native equivalent of the reference ETL (``bin/data_prepare.py:82-115``):
instead of a per-scan host loop, all flow targets of a sequence are computed
in one batched device call (rigid ego-motion flow, ``v = v_lin + w x p``,
scaled by dt).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.data import drow_io
from planar_optical_flow_tpu.ops.geometry import get_laser_phi, rphi_to_xy

_REG = 1e-6


def diff_odometry(odom_t: np.ndarray, odom: np.ndarray):
    """Frame-to-frame odometry deltas, last row zero-padded
    (reference ``data_prepare.py:82-90``)."""
    dt = np.concatenate([odom_t[1:] - odom_t[:-1], [0.0]]).astype(np.float32)
    dpose = np.concatenate([odom[1:] - odom[:-1], np.zeros((1, 3))]).astype(
        np.float32
    )
    return dt, dpose


@jax.jit
def _flow_targets_batched(scans, phi, dts, dposes):
    """Rigid ego-motion flow for a whole sequence at once.

    v = v_lin + w x p evaluated per point, displacement = v * dt
    (reference ``data_prepare.py:29-47``).
    """
    v_lin = dposes[:, None, :2] / (dts[:, None, None] + _REG)  # (T, 1, 2)
    w = dposes[:, 2] / (dts + _REG)  # (T,)
    x, y = rphi_to_xy(scans, phi)  # (T, P)
    # w x p in the plane: (-w*y, w*x)
    v_rot = jnp.stack((-w[:, None] * y, w[:, None] * x), axis=-1)
    return (v_rot + v_lin) * dts[:, None, None]


def flow_targets_for_sequence(scans: np.ndarray, dts: np.ndarray,
                              dposes: np.ndarray) -> np.ndarray:
    phi = jnp.asarray(get_laser_phi(num_pts=scans.shape[-1]))
    return np.asarray(_flow_targets_batched(jnp.asarray(scans), phi,
                                            jnp.asarray(dts),
                                            jnp.asarray(dposes)))


def prepare_split(data_dir: str, split: str, verbose: bool = True):
    """Write ``.difodom`` and ``.flow`` next to each ``.csv`` of a split."""
    stems = drow_io.list_sequences(data_dir, split)
    for stem in stems:
        _, odom_t, odom = drow_io.load_odometry_file(stem)
        dt, dpose = diff_odometry(odom_t, odom)
        np.savetxt(
            stem + ".difodom",
            np.column_stack([dt, dpose]),
            fmt="%8.6f",
            delimiter=",",
        )

        _, scan_t, scans = drow_io.load_scan_file(stem)
        # match each scan to the nearest odom sample by timestamp
        idx = np.argmin(np.abs(scan_t[:, None] - odom_t[None, :]), axis=1)
        flows = flow_targets_for_sequence(scans, dt[idx], dpose[idx])
        np.savetxt(
            stem + ".flow",
            flows.reshape(len(scans), -1),
            fmt="%10.8f",
            delimiter=",",
        )
        if verbose:
            print(f"prepared {stem}: {len(scans)} scans")
    return stems
