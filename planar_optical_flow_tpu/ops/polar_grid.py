"""TSDF-style polar occupancy grid encoding (the "fc2d" network input).

Vectorized, on-device equivalent of the scalar double loop in the reference
(``/root/reference/src/utils/utils.py:492-531``).
"""

from __future__ import annotations

import jax.numpy as jnp


def scans_to_polar_grid(
    scans,
    min_range: float = 0.0,
    max_range: float = 30.0,
    range_bin_size: float = 1.0,
    tsdf_clip: float = 1.0,
    normalize: bool = True,
):
    """Encode ``(..., S, P)`` scans as ``(..., S, R, P)`` truncated signed
    distance fields over range bins, with the hit bin carrying the (optionally
    normalized) measured range."""
    scans = jnp.asarray(scans)
    num_range = int((max_range - min_range) / range_bin_size) + 1
    mag = max_range - min_range
    mid = 0.5 * (max_range - min_range)

    scans = jnp.clip(scans, min_range, max_range)
    hit_bin = ((scans - min_range) / range_bin_size).astype(jnp.int32)  # (..., S, P)

    bins = jnp.arange(num_range, dtype=scans.dtype)  # (R,)
    if tsdf_clip > 0.0:
        # signed distance of every bin to the hit bin, in meters, truncated
        tsdf = (bins[:, None] - hit_bin[..., None, :]) * range_bin_size
        tsdf = jnp.clip(tsdf, -tsdf_clip, tsdf_clip)
    else:
        tsdf = jnp.zeros(scans.shape[:-1] + (num_range, scans.shape[-1]),
                         dtype=scans.dtype)

    val = scans
    if normalize:
        val = (val - mid) / mag * 2.0
        tsdf = tsdf / mag * 2.0

    is_hit = bins[:, None] == hit_bin[..., None, :]
    grid = jnp.where(is_hit, val[..., None, :], tsdf)
    return grid.astype(jnp.float32)
