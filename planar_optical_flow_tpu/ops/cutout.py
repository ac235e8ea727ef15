"""Batched, on-device cutout extraction.

For every scan point, resample a depth window around it ("cutout") whose
angular width shrinks with distance. This is the input encoding of the
DROW/DR-SPAAM detectors. The reference computes this per sample on the host
in dataloader workers (``/root/reference/src/utils/utils.py:259-334`` numpy,
``:337-420`` torch); here it is a single fused gather + lerp over an
HBM-resident ``(..., S, P)`` scan stack, jittable and vmappable, so the whole
batch is encoded on device.

Numerics follow the *numpy* reference path (the oracle): the torch mirror in
the reference has a known ``logical_xor`` bug in its out-of-bounds mask
(``utils.py:363``) which we deliberately do not reproduce.

Shape note: the data-dependent area-sampling factor of the reference
(``ceil(max_window_pts / num_cutout_pts)``, ``utils.py:308``) is not jittable;
it is exposed as the static ``area_s`` argument. ``area_s_for`` computes the
geometric worst-case bound so callers can pick a fixed value once.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def area_s_for(window_width: float, num_cutout_pts: int,
               angle_inc: float = math.radians(0.5),
               min_range: float = 1e-2) -> int:
    """Worst-case area-sampling factor: the widest possible angular window
    (a point at ``min_range``) divided by the cutout resolution."""
    max_half_alpha = math.atan(0.5 * window_width / min_range)
    max_window_pts = 2.0 * max_half_alpha / angle_inc
    return max(1, int(math.ceil(max_window_pts / num_cutout_pts)))


def _gather_last(scans, inds):
    """take_along_axis of ``scans (..., S, P)`` with ``inds (..., S, P', C)``."""
    lead = inds.shape[:-2]
    flat = inds.reshape(*lead, -1)
    out = jnp.take_along_axis(scans, flat, axis=-1)
    return out.reshape(inds.shape)


def scans_to_cutout(
    scans,
    scan_phi,
    stride: int = 1,
    centered: bool = True,
    fixed: bool = False,
    window_width: float = 1.66,
    window_depth: float = 1.0,
    num_cutout_pts: int = 48,
    padding_val: float = 29.99,
    area_mode: bool = False,
    area_s: int | None = None,
    area_fast: bool = False,
    gather_mode: str = "gather",
):
    """Extract per-point cutouts from a stack of scans, fully on device.

    Args:
      scans: ``(..., S, P)`` range scans (S = temporal stack, P = beams).
      scan_phi: ``(P,)`` beam angles (host numpy or jnp; assumed uniform grid).
      stride: beam subsampling stride for output points.
      centered: subtract the window center and normalize by ``window_depth``.
      fixed: if True each scan uses its own ranges for the window geometry;
        otherwise all scans use the most recent scan's ranges.
      area_mode: average-downsample windows wider than ``num_cutout_pts``
        beams instead of point-sampling them (reference ``utils.py:303-323``).
      area_s: static oversampling factor for area mode; defaults to the
        geometric worst case from :func:`area_s_for`.

    Returns:
      ``(..., P', S, C)`` cutouts with ``P' = ceil(P / stride)`` and
      ``C = num_cutout_pts``, in the input dtype. The window geometry and
      interpolation always run in float32 internally — a reduced-precision
      caller (mixed-precision training) only quantizes the normalized
      output, not the beam geometry.
    """
    scans = jnp.asarray(scans)
    out_dtype = scans.dtype
    scans = scans.astype(jnp.float32)
    num_pts = scans.shape[-1]
    phi = np.asarray(scan_phi)
    angle_inc = float(phi[1] - phi[0])
    phi0 = float(phi[0])
    phi_s = jnp.asarray(phi[::stride], dtype=scans.dtype)

    if fixed:
        dists = scans[..., :, ::stride]  # (..., S, P')
    else:
        dists = jnp.broadcast_to(
            scans[..., -1:, ::stride], scans[..., :, ::stride].shape
        )

    half_alpha = jnp.arctan(0.5 * window_width / jnp.maximum(dists, 1e-2))

    def window_indices(n_samples):
        # angles of the n_samples window taps -> fractional beam indices
        delta = 2.0 * half_alpha / (n_samples - 1)
        taps = jnp.arange(n_samples, dtype=scans.dtype)
        ang = (phi_s - half_alpha)[..., None] + taps * delta[..., None]
        return (ang - phi0) / angle_inc  # (..., S, P', n_samples)

    inds = window_indices(num_cutout_pts)
    outbound = jnp.logical_or(inds < 0, inds > num_pts - 1)

    low = jnp.clip(jnp.floor(inds), 0, num_pts - 1).astype(jnp.int32)
    high = jnp.clip(low + 1, 0, num_pts - 1)
    frac = jnp.clip(inds - low, 0.0, 1.0)

    if gather_mode == "matmul":
        # TPU fast path: express the sampling as 0/1 one-hot blocks
        # contracted with the scan on the MXU (~4x faster than XLA's
        # lane-axis gather at these shapes). Accuracy recipe:
        #   * selection matrices are exact 0/1 in bf16,
        #   * the scan is split into bf16 hi+lo parts, so each sampled value
        #     is recovered to ~f32 accuracy from two matmuls,
        #   * the fractional lerp / area normalization runs elementwise in
        #     f32 on the VPU (frac in bf16 would smear depth discontinuities).
        # ``high == clip(low + 1)``, so sampling at ``high`` is the LOW
        # selection applied to an edge-shifted copy of the scan — the
        # selection tensor (the bandwidth cost of this op) carries one
        # interp block instead of two.
        beams = jnp.arange(num_pts, dtype=jnp.int32)
        blocks = [
            (beams == low[..., None]).astype(jnp.bfloat16),
        ]
        if area_mode:
            tap_w = (inds[..., -1:] - inds[..., 0:1]) / (num_cutout_pts - 1)
            a_lo = jnp.rint(jnp.clip(inds - 0.5 * tap_w, 0, num_pts - 1)
                            ).astype(jnp.int32)
            a_hi = jnp.rint(jnp.clip(inds + 0.5 * tap_w, 0, num_pts - 1)
                            ).astype(jnp.int32)
            a_hi = jnp.maximum(a_hi, a_lo)
            blocks.append(
                jnp.logical_and(beams >= a_lo[..., None],
                                beams <= a_hi[..., None]).astype(jnp.bfloat16)
            )
        w01 = jnp.concatenate(blocks, axis=-2)  # (..., P', K*C, P)

        shifted = jnp.concatenate(
            [scans[..., 1:], scans[..., -1:]], axis=-1
        )  # scan[p+1] with edge clamp == gather at `high`

        def split16(a):
            hi = a.astype(jnp.bfloat16)
            lo = (a - hi.astype(a.dtype)).astype(jnp.bfloat16)
            return hi, lo

        s_hi, s_lo = split16(scans)
        n_hi, n_lo = split16(shifted)
        # one contraction with all scan parts stacked on a trailing axis:
        # the (large, fused-on-the-fly) selection tensor streams once —
        # this op is bandwidth-bound on it
        rhs = jnp.stack([s_hi, s_lo, n_hi, n_lo], axis=-1)  # (..., P, 4)
        sampled = jnp.einsum(
            "...pcq,...qk->...pck", w01, rhs,
            preferred_element_type=jnp.float32,
        ).astype(scans.dtype)

        c = num_cutout_pts
        ct_low_v = sampled[..., 0 * c:1 * c, 0] + sampled[..., 0 * c:1 * c, 1]
        ct_high_v = sampled[..., 0 * c:1 * c, 2] + sampled[..., 0 * c:1 * c, 3]
        ct = ct_low_v + frac * (ct_high_v - ct_low_v)
        if area_mode:
            band_sum = (sampled[..., 1 * c:2 * c, 0]
                        + sampled[..., 1 * c:2 * c, 1])
            ct_area = band_sum / (a_hi - a_lo + 1).astype(scans.dtype)
            window_span = inds[..., -1:] - inds[..., 0:1]
            use_area = window_span > num_cutout_pts
            ct = jnp.where(use_area, ct_area, ct)
        area_mode = False  # handled above
    else:
        ct_low = _gather_last(scans, low)
        ct_high = _gather_last(scans, high)
        ct = ct_low + frac * (ct_high - ct_low)

    if area_mode and area_fast:
        # O(1)-per-tap box filter via prefix sums: tap k averages the beams
        # whose indices fall in its sub-window [k, k+1) of the cutout. This
        # is the continuous limit of the reference's rint-oversampling
        # (utils.py:303-323) — equal within interpolation tolerance for
        # realistic scans, and ~area_s x cheaper in gathers.
        csum = jnp.cumsum(scans, axis=-1)
        csum = jnp.concatenate(
            [jnp.zeros_like(csum[..., :1]), csum], axis=-1
        )  # csum[i] = sum of beams < i
        tap_w = (inds[..., -1:] - inds[..., 0:1]) / (num_cutout_pts - 1)
        lo = jnp.rint(jnp.clip(inds - 0.5 * tap_w, 0, num_pts - 1)).astype(
            jnp.int32
        )
        hi = jnp.rint(jnp.clip(inds + 0.5 * tap_w, 0, num_pts - 1)).astype(
            jnp.int32
        )
        hi = jnp.maximum(hi, lo)
        sums = _gather_last(csum, hi + 1) - _gather_last(csum, lo)
        ct_area = sums / (hi - lo + 1).astype(scans.dtype)
        window_span = inds[..., -1] - inds[..., 0]
        use_area = (window_span > num_cutout_pts)[..., None]
        ct = jnp.where(use_area, ct_area, ct)
    elif area_mode:
        s = area_s_for(window_width, num_cutout_pts, angle_inc) if area_s is None \
            else int(area_s)
        if s > 1:
            n_area = s * num_cutout_pts
            inds_area = window_indices(n_area)
            inds_area = jnp.rint(jnp.clip(inds_area, 0, num_pts - 1)).astype(jnp.int32)
            ct_area = _gather_last(scans, inds_area)
            # tap k of the oversampled window maps to (k // s) in the output
            ct_area = ct_area.reshape(*ct_area.shape[:-1], num_cutout_pts, s)
            ct_area = ct_area.mean(axis=-1)
            window_span = inds[..., -1] - inds[..., 0]
            use_area = (window_span > num_cutout_pts)[..., None]
            ct = jnp.where(use_area, ct_area, ct)

    ct = jnp.where(outbound, padding_val, ct)
    ct = jnp.clip(ct, (dists - window_depth)[..., None],
                  (dists + window_depth)[..., None])
    if centered:
        ct = (ct - dists[..., None]) / window_depth

    # (..., S, P', C) -> (..., P', S, C)
    ct = jnp.swapaxes(ct, -3, -2)
    return ct.astype(out_dtype)
