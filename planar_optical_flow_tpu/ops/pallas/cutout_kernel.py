"""Pallas cutout kernel: per-point depth windows via in-VMEM lane gathers.

The XLA serving path expresses the cutout's data-dependent sampling as a
one-hot matmul (``ops/cutout.py`` ``gather_mode="matmul"``) because XLA's
lane-axis gather is slow — but the contraction has N=4 output lanes, so the
MXU runs at ~3% utilization and the op costs ~9 ms at B=128. Mosaic DOES
support dynamic gather along lanes (``take_along_axis(axis=1)``), so this
kernel does the obvious thing instead: per scan, broadcast the (P,) range
vector to a (P, P) VMEM table and gather the interpolation/area taps
directly — plus all the window geometry (arctan widths, fractional indices,
area-mode prefix-sum means, depth clipping, centering) in-kernel.

Supported config (the dr_spaam.yaml serving point): ``fixed=True``,
``stride=1``; area mode uses the cumulative-sum band mean, numerically
identical to the matmul path's (``ops/cutout.py:127-170``).

Reference math: ``/root/reference/src/utils/utils.py:259-334``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cutout_block(dists, half_alpha, scan_chunks, csum_chunks, *, rows,
                 p_valid, c, n_chunks, angle_inc, window_depth,
                 padding_val, centered, area_mode, row_off=0):
    """Pure cutout math for ``rows`` consecutive beams of one scan,
    callable from any Pallas kernel body (also fused into the serving
    backbone, ``conv_stack.fused_backbone_int8_p2cut``).

    Inputs are pre-shaped in XLA to avoid lane<->sublane relayouts and
    multi-vreg gathers, which Mosaic does not support:
    * dists/half_alpha: (rows, 1) per-point range / half-window-angle,
    * scan/csum chunks: (W/128, 128) beam-table chunks (ranges / prefix
      sums) — each lane gather reads one 128-wide vreg, selected by chunk
      id. ``row_off``: global beam index of row 0 (may be traced)."""
    p = rows

    taps = jax.lax.broadcasted_iota(jnp.int32, (p, c), 1).astype(
        jnp.float32)  # (P, C)
    delta = 2.0 * half_alpha / (c - 1)
    pidx = (jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
            + row_off).astype(jnp.float32)
    # beam angles cancel: inds = p + (taps * delta - half_alpha) / angle_inc
    inds = pidx + (taps * delta - half_alpha) / angle_inc

    # beams beyond p_valid are padding rows of a sublane-aligned scan —
    # treat them as out of range exactly like beams beyond the array
    outbound = jnp.logical_or(inds < 0, inds > p_valid - 1)
    low = jnp.clip(jnp.floor(inds), 0, p_valid - 1).astype(jnp.int32)
    high = jnp.clip(low + 1, 0, p_valid - 1)
    frac = jnp.clip(inds - low.astype(jnp.float32), 0.0, 1.0)

    def gather_lane(chunks, idx):
        # chunks: (n_chunks, 128) table; idx: (P, c) beam indices
        pr, cr = idx.shape
        idx_p = jnp.pad(idx, ((0, 0), (0, 128 - cr)))  # cr <= 128
        out = jnp.zeros((pr, 128), chunks.dtype)
        for k in range(n_chunks):
            tab_k = jnp.broadcast_to(chunks[k].reshape(1, 128), (pr, 128))
            local = jnp.clip(idx_p - k * 128, 0, 127)
            g = jnp.take_along_axis(tab_k, local, axis=1)
            hit = jnp.logical_and(idx_p >= k * 128, idx_p < (k + 1) * 128)
            out = jnp.where(hit, g, out)
        return out[:, :cr]

    ct_low = gather_lane(scan_chunks, low)
    ct_high = gather_lane(scan_chunks, high)
    ct = ct_low + frac * (ct_high - ct_low)

    if area_mode:
        # csum_chunks: prefix sums, csum[i] = sum of beams < i
        tap_w = (inds[:, c - 1:c] - inds[:, 0:1]) / (c - 1)
        a_lo = jnp.rint(jnp.clip(inds - 0.5 * tap_w, 0, p_valid - 1)).astype(
            jnp.int32)
        a_hi = jnp.rint(jnp.clip(inds + 0.5 * tap_w, 0, p_valid - 1)).astype(
            jnp.int32)
        a_hi = jnp.maximum(a_hi, a_lo)
        band = (gather_lane(csum_chunks, a_hi + 1)
                - gather_lane(csum_chunks, a_lo))
        ct_area = band / (a_hi - a_lo + 1).astype(jnp.float32)
        window_span = inds[:, c - 1:c] - inds[:, 0:1]
        ct = jnp.where(window_span > c, ct_area, ct)

    ct = jnp.where(outbound, padding_val, ct)
    ct = jnp.clip(ct, dists - window_depth, dists + window_depth)
    if centered:
        ct = (ct - dists) / window_depth
    return ct


def cutout_prep(scans, window_width: float):
    """Host/XLA pre-shaping shared by the standalone kernel and the fused
    cutout+backbone program (``conv_stack.fused_backbone_int8_p2cut``):
    (B, P) scans -> (scans f32, half_alpha (B, P), scan chunks, prefix-sum
    chunks, n_chunks) with the beam tables padded to 128-lane chunks for
    the kernel's single-vreg lane gathers. The prefix sum gets a leading
    zero so ``csum[i]`` = sum of beams < i (area-mode band means)."""
    b, p = scans.shape
    scans = scans.astype(jnp.float32)
    csum = jnp.cumsum(scans, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum], axis=-1)
    half_alpha = jnp.arctan(  # Mosaic has no atan; tiny (B, P) XLA op
        0.5 * window_width / jnp.maximum(scans, 1e-2)
    )
    wp = ((p + 1 + 127) // 128) * 128
    n_chunks = wp // 128
    schunk = jnp.pad(scans, ((0, 0), (0, wp - p))).reshape(b, n_chunks, 128)
    cchunk = jnp.pad(csum, ((0, 0), (0, wp - p - 1))).reshape(
        b, n_chunks, 128)
    return scans, half_alpha, schunk, cchunk, n_chunks


def _cutout_kernel(scol_ref, ha_ref, schunk_ref, cchunk_ref, out_ref, *,
                   num_pts, p_valid, c, n_chunks, angle_inc, window_depth,
                   padding_val, centered, area_mode):
    """One scan per grid step (see :func:`cutout_block`)."""
    out_ref[:] = cutout_block(
        scol_ref[0], ha_ref[0], schunk_ref[0], cchunk_ref[0],
        rows=num_pts, p_valid=p_valid, c=c, n_chunks=n_chunks,
        angle_inc=angle_inc, window_depth=window_depth,
        padding_val=padding_val, centered=centered, area_mode=area_mode)


@functools.partial(jax.jit, static_argnames=(
    "num_cutout_pts", "window_width", "window_depth", "padding_val",
    "centered", "area_mode", "angle_inc", "p_valid", "interpret"))
def cutout_fused(scans, num_cutout_pts: int = 56, window_width: float = 1.0,
                 window_depth: float = 0.5, padding_val: float = 29.99,
                 centered: bool = True, area_mode: bool = True,
                 angle_inc: float = math.radians(0.5),
                 p_valid: int | None = None, interpret: bool = False):
    """(B, P) scans -> (B * P, C) flat cutouts, one pallas program.

    P must be a multiple of 8 (pad the scan with ``p_valid`` = the real beam
    count; padded rows produce cutouts that downstream masking ignores).
    The laser phi grid is the standard symmetric one (``utils.py:25-29``) —
    it cancels out of the index math entirely.
    """
    b, p = scans.shape
    c = num_cutout_pts
    p_valid = p_valid or p
    scans, half_alpha, schunk, cchunk, n_chunks = cutout_prep(
        scans, window_width)
    kernel = functools.partial(
        _cutout_kernel, num_pts=p, p_valid=int(p_valid), c=c,
        n_chunks=n_chunks, angle_inc=float(angle_inc),
        window_depth=float(window_depth), padding_val=float(padding_val),
        centered=bool(centered), area_mode=bool(area_mode),
    )
    col = lambda a: a.reshape(b, p, 1)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * p, c), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(col(scans), col(half_alpha), schunk, cchunk)
    return out
