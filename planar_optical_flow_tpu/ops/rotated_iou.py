"""Rotated bounding-box IoU as a single fixed-shape XLA program.

This replaces the reference's numba-CUDA kernel
(``/root/reference/src/utils/rotate_iou.py``) — the only native device code
in the reference — with branch-free, fully batched TPU formulations.

Two implementations live here:

* :func:`rotated_iou` / :func:`rotated_iou_3d` — the DEFAULT, an
  **order-free boundary-integral** form built for TPU tiling: the area of
  the (convex) intersection of two convex polygons equals the shoelace sum
  over every directed boundary piece, and those pieces are exactly each
  polygon's edges clipped to the other's interior. Clipping one edge by 4
  half-planes is a 1-D ``t``-interval intersection, so the WHOLE (N, K)
  pair matrix is evaluated with plain ``(N, K)``-shaped elementwise ops —
  no per-pair vertex buffers, no compaction scatters, no sorts. Every
  intermediate tiles perfectly onto the VPU's (8, 128) registers; XLA fuses
  the ~500 flops/pair into a handful of kernels. (The earlier per-pair
  Sutherland–Hodgman form, kept below for cross-checking, vmapped its
  ``(8, 2)`` vertex scatters into ``(N, K, 8, 2)`` intermediates whose tiny
  trailing dims pad catastrophically on TPU: 4.5 s and 137 GB peak at
  N = K = 1000 vs ~1 ms here.)

  Collinear shared boundaries need a tie-break: a piece of one box's edge
  lying exactly ON an edge line of the other is either a *duplicate* (both
  boxes traverse it in the same direction — overlapping boxes sharing a
  side, counting it twice would double its term) or a *cancelling pair*
  (anti-parallel — boxes touching along an edge with zero-area overlap,
  where the two opposite traversals must both be kept so their shoelace
  terms cancel to 0). The rule is direction-aware: an on-plane piece is
  kept in the first pass always, and in the second pass only when it runs
  anti-parallel to the clip polygon's own edge. It engages only in the
  on-plane branch (|signed dist| of both endpoints below a 5e-5 m band; the
  box workloads here are meter-scale lidar boxes), so no intersection point
  is ever perturbed by it. Exact collinearity from real float data arrives
  via equal coordinates/angles and lands on exact-zero distances; a
  geometrically-collinear-but-independently-computed pair inside the noise
  band is handled by the same rule.

* :func:`rotated_iou_sh` — the per-pair Sutherland–Hodgman clipper
  (fixed 8-vertex padded buffer, masked cumsum compaction, masked
  shoelace), double-vmapped. Shape-faithful to the reference's device
  algorithm (``rotate_iou.py:297-360``); kept as an independent in-repo
  oracle for parity tests (the role ``scans_to_cutout_original`` plays in
  the reference), and fine for the small (N, K) it is tested at.

Box formats (matching ``rotate_iou_gpu_eval``, ``rotate_iou.py:363-404``):
  2D: ``[cx, cy, l, w, angle]`` (angle clockwise-positive)
  3D: ``[cx, cy, cz, l, w, h, rot_z]``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_VERTS = 8
_EPS = 1e-8
# Unit-normal half-plane tests make these true distances [m]:
_ON_EPS = 5e-5   # both endpoints within this band = edge lies ON the plane
_PAR_EPS = 2e-5  # |ds - de| below this = edge parallel to the clip plane


# ---------------------------------------------------------------------------
# batched order-free formulation (default)
# ---------------------------------------------------------------------------


def _corners_xy(cx, cy, l, w, angle):
    """Corner coordinate arrays of ``[cx, cy, l, w, angle]`` boxes given as
    component arrays (any broadcastable shape). Returns ``(xs, ys)``, each a
    list of 4 arrays, in the same clockwise order and clockwise-positive
    rotation convention as :func:`box_corners`."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    hx, hy = 0.5 * l, 0.5 * w
    xs, ys = [], []
    for ex, ey in ((-1.0, -1.0), (-1.0, 1.0), (1.0, 1.0), (1.0, -1.0)):
        lx, ly = ex * hx, ey * hy
        xs.append(cx + lx * c + ly * s)
        ys.append(cy - lx * s + ly * c)
    return xs, ys


def _clip_area_oneway(ax, ay, bx, by, bcx, bcy, first_pass):
    """Signed shoelace contribution of A's boundary clipped to B's interior.

    ``ax/ay``: A's 4 corner coordinate arrays (boundary order); ``bx/by``:
    B's; ``bcx/bcy``: B's center (defines the interior side of each B edge).
    ``first_pass`` selects the on-plane tie-break side (module docstring).
    All inputs broadcast elementwise; returns the summed signed cross terms
    (2x the signed area contribution).
    """
    # B's 4 interior half-planes, unit normals: dot(n, x - b_j) >= 0 inside
    planes = []
    for j in range(4):
        jx, jy = bx[j], by[j]
        ex, ey = bx[(j + 1) % 4] - jx, by[(j + 1) % 4] - jy
        inv = jax.lax.rsqrt(jnp.maximum(ex * ex + ey * ey, 1e-20))
        nx, ny = -ey * inv, ex * inv  # unit left normal of the directed edge
        sgn = jnp.where(nx * (bcx - jx) + ny * (bcy - jy) >= 0.0, 1.0, -1.0)
        planes.append((nx * sgn, ny * sgn, jx, jy, ex, ey))

    total = 0.0
    for i in range(4):
        px, py = ax[i], ay[i]
        qx, qy = ax[(i + 1) % 4], ay[(i + 1) % 4]
        dx, dy = qx - px, qy - py

        t0 = jnp.zeros_like(px)
        t1 = jnp.ones_like(px)
        alive = jnp.ones_like(px, dtype=bool)
        for nx, ny, jx, jy, ex, ey in planes:
            ds = nx * (px - jx) + ny * (py - jy)
            de = nx * (qx - jx) + ny * (qy - jy)
            denom = ds - de  # constraint: ds + t*(de - ds) >= 0
            on = (jnp.abs(ds) <= _ON_EPS) & (jnp.abs(de) <= _ON_EPS)
            par = jnp.abs(denom) <= _PAR_EPS
            skip = on | par
            t = ds / jnp.where(skip, 1.0, denom)
            # denom > 0 (leaving): upper bound; denom < 0 (entering): lower
            t1 = jnp.where(~skip & (denom > 0), jnp.minimum(t1, t), t1)
            t0 = jnp.where(~skip & (denom < 0), jnp.maximum(t0, t), t0)
            if first_pass:
                keep_on = jnp.ones_like(alive)
            else:  # second pass: keep only anti-parallel (cancelling) pieces
                keep_on = dx * ex + dy * ey < 0.0
            ok = jnp.where(on, keep_on, ~par | (ds >= 0.0))
            alive = alive & ok

        empty = (t0 > t1) | ~alive
        u0 = jnp.where(empty, 0.0, t0)
        u1 = jnp.where(empty, 0.0, t1)  # empty -> zero-length piece -> 0
        v0x, v0y = px + u0 * dx, py + u0 * dy
        v1x, v1y = px + u1 * dx, py + u1 * dy
        total = total + (v0x * v1y - v1x * v0y)
    return total


def _intersection_area_batched(p1, p2):
    """Overlap area of rotated rectangles given as component tuples
    ``(cx, cy, l, w, angle)`` of broadcastable arrays."""
    ax, ay = _corners_xy(*p1)
    bx, by = _corners_xy(*p2)
    total = _clip_area_oneway(ax, ay, bx, by, p2[0], p2[1], first_pass=True)
    total += _clip_area_oneway(bx, by, ax, ay, p1[0], p1[1], first_pass=False)
    return 0.5 * jnp.abs(total)


def _iou_from_areas(inter, area1, area2, criterion):
    if criterion == -1:
        denom = area1 + area2 - inter
    elif criterion == 0:
        denom = area1
    elif criterion == 1:
        denom = area2
    else:
        return inter
    return inter / jnp.maximum(denom, _EPS)


def _split2d(b):
    return tuple(b[..., i] for i in range(5))


def rotated_iou(boxes, query_boxes, criterion: int = -1):
    """Pairwise rotated IoU of ``boxes (N, 5)`` vs ``query_boxes (K, 5)``.

    Returns ``(N, K)`` float32. Jittable; one fused program for all pairs
    (vs one CUDA launch per detection in the reference eval,
    ``src/model/box_regression_fn.py:77-82``).
    """
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    query_boxes = jnp.asarray(query_boxes, dtype=jnp.float32)
    p1 = _split2d(boxes[:, None, :])
    p2 = _split2d(query_boxes[None, :, :])
    inter = _intersection_area_batched(p1, p2)
    return _iou_from_areas(inter, p1[2] * p1[3], p2[2] * p2[3], criterion)


def rotated_iou_paired(boxes, others, criterion: int = -1):
    """Elementwise rotated IoU of aligned ``(..., 5)`` box arrays (the 1:1
    prediction-vs-target case, e.g. the mean-box baseline) — same math as
    :func:`rotated_iou` without materializing the (N, N) matrix."""
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    others = jnp.asarray(others, dtype=jnp.float32)
    p1, p2 = _split2d(boxes), _split2d(others)
    inter = _intersection_area_batched(p1, p2)
    return _iou_from_areas(inter, p1[2] * p1[3], p2[2] * p2[3], criterion)


def rotated_iou_3d(boxes, query_boxes, criterion: int = -1):
    """Pairwise 3D rotated IoU of ``boxes (N, 7)`` vs ``query_boxes (K, 7)``,
    format ``[cx, cy, cz, l, w, h, rot_z]`` (z-aligned boxes)."""
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    query_boxes = jnp.asarray(query_boxes, dtype=jnp.float32)
    return _iou_3d_core(boxes[:, None, :], query_boxes[None, :, :], criterion)


def rotated_iou_3d_paired(boxes, others, criterion: int = -1):
    """Elementwise 3D rotated IoU of aligned ``(..., 7)`` box arrays."""
    return _iou_3d_core(jnp.asarray(boxes, dtype=jnp.float32),
                        jnp.asarray(others, dtype=jnp.float32), criterion)


def _iou_3d_core(b1, b2, criterion):
    p1 = (b1[..., 0], b1[..., 1], b1[..., 3], b1[..., 4], b1[..., 6])
    p2 = (b2[..., 0], b2[..., 1], b2[..., 3], b2[..., 4], b2[..., 6])
    area_inter = _intersection_area_batched(p1, p2)

    top = jnp.minimum(b1[..., 2] + 0.5 * b1[..., 5],
                      b2[..., 2] + 0.5 * b2[..., 5])
    bot = jnp.maximum(b1[..., 2] - 0.5 * b1[..., 5],
                      b2[..., 2] - 0.5 * b2[..., 5])
    vol_inter = area_inter * jnp.maximum(top - bot, 0.0)
    vol1 = b1[..., 3] * b1[..., 4] * b1[..., 5]
    vol2 = b2[..., 3] * b2[..., 4] * b2[..., 5]
    return _iou_from_areas(vol_inter, vol1, vol2, criterion)


# ---------------------------------------------------------------------------
# per-pair Sutherland–Hodgman (cross-check oracle; reference-shaped)
# ---------------------------------------------------------------------------


def box_corners(box):
    """Corners ``(4, 2)`` of one ``[cx, cy, l, w, angle]`` box, clockwise,
    rotated clockwise for positive angle (reference convention,
    ``rbbox_to_corners``, ``rotate_iou.py:208-230``)."""
    c, s = jnp.cos(box[4]), jnp.sin(box[4])
    hx, hy = 0.5 * box[2], 0.5 * box[3]
    local = jnp.array([[-1.0, -1.0], [-1.0, 1.0], [1.0, 1.0], [1.0, -1.0]])
    local = local * jnp.array([hx, hy])
    rot = jnp.array([[c, s], [-s, c]])  # clockwise for positive angle
    return local @ rot.T + box[:2]


def _clip_by_halfplane(verts, count, p, q, interior):
    """Clip polygon (``verts (8,2)`` with ``count`` valid, in boundary order)
    by the half-plane through edge p->q containing ``interior``."""
    n = jnp.array([-(q[1] - p[1]), q[0] - p[0]])  # left normal of p->q
    sign = jnp.where(jnp.dot(n, interior - p) >= 0.0, 1.0, -1.0)
    n = n * sign  # inside: dot(n, x - p) >= 0

    idx = jnp.arange(_MAX_VERTS)
    valid_in = idx < count
    cnt = jnp.maximum(count, 1)
    nxt = (idx + 1) % cnt
    s_pt = verts
    e_pt = verts[nxt]

    ds = jnp.einsum("j,ij->i", n, s_pt - p)
    de = jnp.einsum("j,ij->i", n, e_pt - p)
    s_in = ds >= 0.0
    e_in = de >= 0.0

    t = ds / jnp.where(jnp.abs(ds - de) < _EPS, _EPS, ds - de)
    inter = s_pt + t[:, None] * (e_pt - s_pt)

    # per input edge, emit (crossing-intersection?, endpoint-if-inside?)
    emit_inter = jnp.logical_and(jnp.logical_xor(s_in, e_in), valid_in)
    emit_end = jnp.logical_and(e_in, valid_in)

    cand = jnp.stack((inter, e_pt), axis=1).reshape(2 * _MAX_VERTS, 2)
    emit = jnp.stack((emit_inter, emit_end), axis=1).reshape(2 * _MAX_VERTS)

    pos = jnp.cumsum(emit) - 1
    pos = jnp.where(emit, pos, 2 * _MAX_VERTS)  # dropped
    out = jnp.zeros_like(verts).at[pos].set(cand, mode="drop")
    return out, jnp.sum(emit).astype(count.dtype)


def _polygon_area(verts, count):
    """Masked shoelace area of the first ``count`` vertices (boundary order)."""
    idx = jnp.arange(_MAX_VERTS)
    cnt = jnp.maximum(count, 1)
    nxt = (idx + 1) % cnt
    cross = verts[:, 0] * verts[nxt, 1] - verts[nxt, 0] * verts[:, 1]
    cross = jnp.where(idx < count, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross))


def _rect_intersection_area(box1, box2):
    """Overlap area of two rotated rectangles via Sutherland–Hodgman."""
    subj = box_corners(box1)
    clip = box_corners(box2)
    center2 = box2[:2]

    verts = jnp.zeros((_MAX_VERTS, 2), dtype=subj.dtype).at[:4].set(subj)
    count = jnp.asarray(4, dtype=jnp.int32)
    for k in range(4):
        verts, count = _clip_by_halfplane(
            verts, count, clip[k], clip[(k + 1) % 4], center2
        )
    return _polygon_area(verts, count)


def _pair_iou_2d(box1, box2, criterion: int = -1):
    inter = _rect_intersection_area(box1, box2)
    return _iou_from_areas(inter, box1[2] * box1[3], box2[2] * box2[3],
                           criterion)


def rotated_iou_sh(boxes, query_boxes, criterion: int = -1):
    """Per-pair Sutherland–Hodgman variant of :func:`rotated_iou` (same
    semantics; see module docstring). Use for cross-checks and small N*K."""
    boxes = jnp.asarray(boxes, dtype=jnp.float32)
    query_boxes = jnp.asarray(query_boxes, dtype=jnp.float32)
    f = jax.vmap(jax.vmap(lambda a, b: _pair_iou_2d(a, b, criterion),
                          in_axes=(None, 0)), in_axes=(0, None))
    return f(boxes, query_boxes)


def aabb_iou(box1, box2):
    """Axis-aligned IoU of ``[cx, cy, l, w]`` boxes (batched over leading
    dims); the cheap helper the reference keeps alongside the rotated kernel
    (``src/utils/eval_utils.py:643-664``)."""
    box1 = jnp.asarray(box1)
    box2 = jnp.asarray(box2)

    def bounds(b):
        return (b[..., 0] - 0.5 * b[..., 2], b[..., 0] + 0.5 * b[..., 2],
                b[..., 1] - 0.5 * b[..., 3], b[..., 1] + 0.5 * b[..., 3])

    x0a, x1a, y0a, y1a = bounds(box1)
    x0b, x1b, y0b, y1b = bounds(box2)
    iw = jnp.maximum(jnp.minimum(x1a, x1b) - jnp.maximum(x0a, x0b), 0.0)
    ih = jnp.maximum(jnp.minimum(y1a, y1b) - jnp.maximum(y0a, y0b), 0.0)
    inter = iw * ih
    union = box1[..., 2] * box1[..., 3] + box2[..., 2] * box2[..., 3] - inter
    return inter / jnp.maximum(union, _EPS)
