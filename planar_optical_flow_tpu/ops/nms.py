"""Vote-space non-maximum suppression for per-point center predictions.

On-device, fixed-shape equivalent of the host loop in the reference
(``/root/reference/src/utils/utils.py:535-571``): each point votes for a
person center (canonical offset), votes are sorted by confidence and greedily
deduplicated by distance. Output shapes are static (one slot per point) with
a boolean ``keep`` mask; the host unpacks variable-length detections when it
needs them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.ops.geometry import canonical_to_global, rphi_to_xy


def nms_predicted_center_topk(scan, scan_phi, pred_cls, pred_reg,
                              min_dist: float = 0.5, top_k: int = 64):
    """Greedy center NMS restricted to the ``top_k`` most confident votes.

    EXACT for the surviving set among the top-k candidates: a vote outside
    the top-k can only suppress votes of even lower confidence, so the kept
    detections (there are physically far fewer than 64 people in a 450-beam
    scan) are identical to :func:`nms_predicted_center`'s — with ~P/top_k
    fewer sequential loop steps (the serve-path hot variant; the full-P
    method remains the oracle-parity default).

    Returns (det_xys (K, 2), det_cls (K, 1), keep (K,), instance_mask (P,))
    — the instance id of every original point is the id of the nearest kept
    detection within ``min_dist`` (0 = unassigned).
    """
    num_pts = scan.shape[0]
    pred_r, pred_phi = canonical_to_global(
        scan, scan_phi, pred_reg[:, 0], pred_reg[:, 1]
    )
    xs_all, ys_all = rphi_to_xy(pred_r, pred_phi)

    conf = pred_cls[:, 0]
    _, order = jax.lax.top_k(conf, top_k)  # sorted descending
    xs, ys = xs_all[order], ys_all[order]
    cls_sorted = pred_cls[order]

    dist = jnp.hypot(xs[:, None] - xs[None, :], ys[:, None] - ys[None, :])
    close = dist < min_dist

    def body(i, keep):
        active = keep[i]
        dup = jnp.logical_and(close[i], active)
        return jnp.logical_and(keep, jnp.logical_not(dup)).at[i].set(active)

    keep = jax.lax.fori_loop(0, top_k, body, jnp.ones(top_k, dtype=bool))

    # per-point instance: nearest kept detection within min_dist. Pure
    # row-reductions (min + masked-min) instead of argmin + gathers — the
    # vmapped (P, K) gathers lowered to ~1 ms of scalar-ish T(1024) code at
    # B=128 while this form stays fully vectorized. Ties resolve to the
    # lowest rank (== argmin's first index: ranks increase along K).
    d_all = jnp.hypot(xs_all[:, None] - xs[None, :],
                      ys_all[:, None] - ys[None, :])  # (P, K)
    d_all = jnp.where(keep[None, :], d_all, jnp.inf)
    d_min = jnp.min(d_all, axis=1)
    in_range = d_min < min_dist
    # instance ids are 1-based ranks among kept detections
    ranks = jnp.cumsum(keep.astype(jnp.int32))
    at_min = d_all == d_min[:, None]
    inst_min = jnp.min(jnp.where(at_min, ranks[None, :], top_k + 1), axis=1)
    instance_mask = jnp.where(in_range, inst_min, 0)

    det_xys = jnp.stack((xs, ys), axis=1)
    return det_xys, cls_sorted, keep, instance_mask


def nms_predicted_center(scan, scan_phi, pred_cls, pred_reg,
                         min_dist: float = 0.5, method: str = "fori"):
    """Greedy center NMS over one scan.

    Args:
      scan: ``(P,)`` ranges.
      scan_phi: ``(P,)`` beam angles.
      pred_cls: ``(P, 1)`` confidences (already sigmoided).
      pred_reg: ``(P, 2)`` canonical-frame center votes.
      min_dist: suppression radius in meters.
      method: ``"fori"`` — one loop step per point (data-independent trip
        count); ``"while"`` — one loop step per *kept detection* (exact same
        greedy result, typically 10-50x fewer sequential steps when
        detections are sparse).

    Returns:
      det_xys: ``(P, 2)`` voted centers sorted by descending confidence.
      det_cls: ``(P, 1)`` confidences in the same order.
      keep: ``(P,)`` bool, True for surviving detections (in sorted order).
      instance_mask: ``(P,)`` int32 instance id per *original* point
        (0 = unassigned).
    """
    num_pts = scan.shape[0]
    pred_r, pred_phi = canonical_to_global(
        scan, scan_phi, pred_reg[:, 0], pred_reg[:, 1]
    )
    xs, ys = rphi_to_xy(pred_r, pred_phi)

    order = jnp.argsort(-pred_cls[:, 0])
    xs, ys = xs[order], ys[order]
    cls_sorted = pred_cls[order]

    dist = jnp.hypot(xs[:, None] - xs[None, :], ys[:, None] - ys[None, :])
    close = dist < min_dist

    keep0 = jnp.ones(num_pts, dtype=bool)
    inst0 = jnp.zeros(num_pts, dtype=jnp.int32)

    if method == "while":
        # greedy, but each iteration consumes the highest-confidence
        # still-unprocessed survivor — iterations == #detections
        idx = jnp.arange(num_pts)

        def cond(carry):
            keep, processed, inst, next_id = carry
            return jnp.any(jnp.logical_and(keep, jnp.logical_not(processed)))

        def body(carry):
            keep, processed, inst, next_id = carry
            cand = jnp.logical_and(keep, jnp.logical_not(processed))
            # confidences are sorted descending: first candidate wins
            i = jnp.argmax(cand)
            dup = close[i]
            keep = jnp.logical_and(keep, jnp.logical_not(dup)).at[i].set(True)
            processed = processed.at[i].set(True)
            inst = jnp.where(dup, next_id, inst)
            return keep, processed, inst, next_id + 1

        keep, _, inst_sorted, _ = jax.lax.while_loop(
            cond, body,
            (keep0, jnp.zeros(num_pts, dtype=bool), inst0, 1),
        )
    else:
        def body(i, carry):
            keep, inst, next_id = carry
            active = keep[i]
            dup = jnp.logical_and(close[i], active)
            # suppress everything close to i, but i itself stays kept
            keep = jnp.logical_and(keep, jnp.logical_not(dup)).at[i].set(active)
            inst = jnp.where(dup, next_id, inst)
            next_id = jnp.where(active, next_id + 1, next_id)
            return keep, inst, next_id

        keep, inst_sorted, _ = jax.lax.fori_loop(
            0, num_pts, body, (keep0, inst0, 1)
        )

    # instance ids back to original point order
    instance_mask = jnp.zeros(num_pts, dtype=jnp.int32).at[order].set(inst_sorted)
    det_xys = jnp.stack((xs, ys), axis=1)
    return det_xys, cls_sorted, keep, instance_mask


def unpack_detections(det_xys, det_cls, keep):
    """Host-side convenience: drop suppressed slots (variable-length result)."""
    import numpy as np

    keep = np.asarray(keep)
    return np.asarray(det_xys)[keep], np.asarray(det_cls)[keep]
