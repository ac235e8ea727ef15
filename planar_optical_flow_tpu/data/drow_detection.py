"""DROW detection + per-point-flow dataset (temporal scan stacks).

Capability-parity rebuild of the reference ``DROWDataset2``
(``src/utils/dataset_dr_spaam.py:256-529``):

* static frames (no odometry change) are dropped,
* each annotated frame yields a sample of ``num_scans`` history scans ending
  ``flow_distance`` frames back, plus the current scan,
* per-point class/offset regression targets from the wc/wa/wp annotations
  (radii 0.6/0.4/0.35 m; pedestrian-only mode uses wp with radius 0.35),
* the ego-motion flow target between the oldest stacked scan's pose and the
  current pose, rotated to per-beam canonical frames,
* an exclude mask (dynamic radii 2.5/2.0/2.0 m x valid range < 20 m).

TPU-first differences from the reference:
* targets/masks for ALL samples are computed at construction in a handful of
  batched jnp calls (padded detections) instead of per-sample python loops in
  dataloader workers,
* the network input encoding (cutouts / polar grid) is NOT done here — it
  runs on device inside the jitted train step (see ``train.tasks``), so
  batches carry raw ``(S+1, P)`` scan stacks only,
* the left-right flip augmentation flips every per-point tensor consistently
  (the reference flips only scans+target_reg, ``utils.py:129-144``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.data import drow_io
from planar_optical_flow_tpu.ops.geometry import get_laser_phi
from planar_optical_flow_tpu.ops import targets as tgt_ops

_CLS_RADII = {"wc": 0.6, "wa": 0.4, "wp": 0.35}
_DYN_RADII = {"wc": 2.5, "wa": 2.0, "wp": 2.0}


def _pad_frame_dets(wcs, was, wps, pedestrian_only, pad_to):
    """One frame's annotations -> padded (rphi (D,2), cls_radius, dyn_radius,
    label, cls_valid, dyn_valid).

    The dynamic mask ALWAYS sees wc+wa+wp (``dyn_valid``) — the reference
    builds it from all three classes regardless of pedestrian_only
    (``dataset_dr_spaam.py:406,511-523``); only the cls/reg target matching
    (``cls_valid``) is restricted to wp in pedestrian_only mode. In that mode
    wp entries are packed first so they can never be cut by padding.
    """
    if pedestrian_only:
        groups = [
            (wps, _CLS_RADII["wp"], _DYN_RADII["wp"], 1, True),
            (wcs, _CLS_RADII["wc"], _DYN_RADII["wc"], 0, False),
            (was, _CLS_RADII["wa"], _DYN_RADII["wa"], 0, False),
        ]
    else:
        groups = [
            (wcs, _CLS_RADII["wc"], _DYN_RADII["wc"], 1, True),
            (was, _CLS_RADII["wa"], _DYN_RADII["wa"], 2, True),
            (wps, _CLS_RADII["wp"], _DYN_RADII["wp"], 3, True),
        ]
    rphi = np.zeros((pad_to, 2), np.float32)
    cls_r = np.zeros(pad_to, np.float32)
    dyn_r = np.zeros(pad_to, np.float32)
    label = np.zeros(pad_to, np.int32)
    cls_valid = np.zeros(pad_to, bool)
    dyn_valid = np.zeros(pad_to, bool)
    i = 0
    for dets, cr, dr, lab, for_cls in groups:
        for r, phi in dets:
            if i >= pad_to:
                break
            rphi[i] = (r, phi)
            cls_r[i], dyn_r[i], label[i] = cr, dr, lab
            cls_valid[i], dyn_valid[i] = for_cls, True
            i += 1
    return rphi, cls_r, dyn_r, label, cls_valid, dyn_valid


@jax.jit
def _targets_batched(scans, phi, dets_rphi, cls_radius, dyn_radius, labels,
                     cls_valid, dyn_valid, odom0, odom1):
    """All per-frame targets in one vmapped program."""

    def one(scan, d_rphi, d_cls_r, d_dyn_r, d_lab, d_cval, d_dval, o0, o1):
        cls, reg = tgt_ops.regression_targets(
            scan, phi, d_rphi, d_cls_r, d_lab, d_cval
        )
        x = scan * jnp.cos(phi)
        y = scan * jnp.sin(phi)
        xy = jnp.stack((x, y), axis=-1)
        flow = tgt_ops.displacement_from_odometry(xy, o0, o1)
        from planar_optical_flow_tpu.ops.geometry import (
            global_to_canonical_flow,
        )

        flow = global_to_canonical_flow(flow, phi)
        dets_xy = jnp.stack(
            (
                d_rphi[:, 0] * jnp.cos(d_rphi[:, 1]),
                d_rphi[:, 0] * jnp.sin(d_rphi[:, 1]),
            ),
            axis=-1,
        )
        dyn = tgt_ops.dynamic_mask(xy, dets_xy, d_dyn_r, d_dval)
        mask = dyn * tgt_ops.valid_range_mask(scan)
        return cls, reg, flow.astype(jnp.float32), mask.astype(jnp.float32)

    return jax.vmap(one)(
        scans, dets_rphi, cls_radius, dyn_radius, labels, cls_valid,
        dyn_valid, odom0, odom1
    )


class DrowDetectionDataset:
    def __init__(self, data_dir: str, split: str = "train", num_scans: int = 5,
                 scan_stride: int = 1, flow_distance: int = 5,
                 pedestrian_only: bool = False, train_with_val: bool = False,
                 use_augmentation: bool = False, max_dets: int = 16,
                 max_sequences: int | None = None, seed: int = 0):
        self.num_scans = num_scans
        self.use_augmentation = use_augmentation and split == "train"
        self._rng = np.random.default_rng(seed)

        stems = drow_io.list_sequences(data_dir, split)
        if train_with_val and split == "train":
            stems += drow_io.list_sequences(data_dir, "val")
        if max_sequences:
            stems = stems[:max_sequences]
        if not stems:
            raise FileNotFoundError(f"no sequences under {data_dir}/{split}")

        phi = None  # beam geometry inferred from the first sequence read

        all_scans, stack_idx, cur_idx = [], [], []
        det_rphi, det_cls_r, det_dyn_r, det_lab = [], [], [], []
        det_cval, det_dval = [], []
        odom0_l, odom1_l = [], []
        offset = 0

        for stem in stems:
            scan_ids, scan_t, scans = drow_io.load_scan_file(stem)
            if phi is None:
                # fixed SICK 0.5 deg/beam increment over however many
                # beams the corpus has (450 -> 225 deg FOV for DROWv2;
                # synthetic/test corpora with fewer beams get a
                # proportionally narrower FOV, NOT a rescaled increment)
                phi = get_laser_phi(num_pts=scans.shape[-1])
                self.phi_grid = phi.astype(np.float32)
            elif scans.shape[-1] != len(phi):
                raise ValueError(
                    f"{stem}: {scans.shape[-1]} beams but the first "
                    f"sequence in this split has {len(phi)} — mixed beam "
                    "counts in one corpus are not supported"
                )
            _, odom_t, odom = drow_io.load_odometry_file(stem)
            ann_ids, wcs, was, wps = drow_io.load_detection_file(stem)

            # drop frames where odometry does not change (static scenes,
            # dataset_dr_spaam.py:277-291)
            moving = np.concatenate(
                [np.any(odom[1:] != odom[:-1], axis=1), [False]]
            )
            if not moving.any():
                continue
            kept_odom_t = odom_t[moving]
            kept_odom = odom[moving]
            # the reference filters scans with the same boolean index
            # (scan and odom rows are aligned 1:1 in DROW sequences)
            n = min(len(moving), len(scans))
            kept_scan_mask = moving[:n]
            scans = scans[:n][kept_scan_mask]
            scan_ids_k = scan_ids[:n][kept_scan_mask]
            scan_t_k = scan_t[:n][kept_scan_mask]
            if len(scans) == 0:
                continue

            id2row = {int(s): i for i, s in enumerate(scan_ids_k)}
            for a_i, sid in enumerate(ann_ids):
                row = id2row.get(int(sid))
                if row is None:
                    continue
                # temporal stack: oldest num_scans ending flow_distance back
                offs = (
                    np.arange(num_scans + flow_distance) * scan_stride
                )[::-1][:num_scans]
                hist = np.maximum(0, row - offs)
                stack_idx.append(offset + np.concatenate([hist, [row]]))
                cur_idx.append(offset + row)

                o1 = np.argmin(np.abs(kept_odom_t - scan_t_k[row]))
                o0 = np.argmin(np.abs(kept_odom_t - scan_t_k[hist[-1]]))
                odom0_l.append(kept_odom[o0])
                odom1_l.append(kept_odom[o1])

                d = _pad_frame_dets(
                    wcs[a_i], was[a_i], wps[a_i], pedestrian_only, max_dets
                )
                det_rphi.append(d[0])
                det_cls_r.append(d[1])
                det_dyn_r.append(d[2])
                det_lab.append(d[3])
                det_cval.append(d[4])
                det_dval.append(d[5])

            all_scans.append(scans)
            offset += len(scans)

        if not stack_idx:
            raise FileNotFoundError(f"{split}: no valid samples")

        self.scans_flat = np.concatenate(all_scans).astype(np.float32)
        self.stack_idx = np.stack(stack_idx)
        self.cur_idx = np.asarray(cur_idx)
        self.odom1 = np.stack(odom1_l).astype(np.float32)

        cls, reg, flow, mask = _targets_batched(
            jnp.asarray(self.scans_flat[self.cur_idx]),
            jnp.asarray(phi),
            jnp.asarray(np.stack(det_rphi)),
            jnp.asarray(np.stack(det_cls_r)),
            jnp.asarray(np.stack(det_dyn_r)),
            jnp.asarray(np.stack(det_lab)),
            jnp.asarray(np.stack(det_cval)),
            jnp.asarray(np.stack(det_dval)),
            jnp.asarray(np.stack(odom0_l)),
            jnp.asarray(self.odom1),
        )
        self.target_cls = np.asarray(cls).astype(np.int32)
        self.target_reg = np.asarray(reg)
        self.target_flow = np.asarray(flow)
        self.exclude_mask = np.asarray(mask)
        # padded GT detections (sensor polar) for AP evaluation — only the
        # classes the head is trained on (wp in pedestrian_only mode)
        self.dets_rphi = np.stack(det_rphi)
        self.dets_valid = np.stack(det_cval)

    def gt_centers(self, idx) -> np.ndarray:
        """GT detection centers of one sample in sensor xy, ``(N, 2)``."""
        rphi = self.dets_rphi[idx][self.dets_valid[idx]]
        return np.stack(
            (rphi[:, 0] * np.cos(rphi[:, 1]), rphi[:, 0] * np.sin(rphi[:, 1])),
            axis=-1,
        ) if len(rphi) else np.zeros((0, 2), np.float32)

    def __len__(self):
        return len(self.stack_idx)

    def _gather(self, idx):
        return {
            "scans": self.scans_flat[self.stack_idx[idx]],
            "target_cls": self.target_cls[idx],
            "target_reg": self.target_reg[idx].copy(),
            "target_flow": self.target_flow[idx].copy(),
            "exclude_mask": self.exclude_mask[idx],
            "odom1": self.odom1[idx],
        }

    def __getitem__(self, idx):
        out = self._gather(idx)
        out["phi_grid"] = self.phi_grid
        return out

    def batch(self, indices):
        idx = np.asarray(indices)
        b = {
            "scans": self.scans_flat[self.stack_idx[idx]],
            "target_cls": self.target_cls[idx],
            "target_reg": self.target_reg[idx].copy(),
            "target_flow": self.target_flow[idx].copy(),
            "exclude_mask": self.exclude_mask[idx],
        }
        if self.use_augmentation:
            flip = self._rng.random(len(idx)) < 0.5
            if flip.any():
                f = np.where(flip)[0]
                b["scans"][f] = b["scans"][f][:, :, ::-1]
                for key in ("target_cls", "exclude_mask"):
                    b[key][f] = b[key][f][:, ::-1]
                for key in ("target_reg", "target_flow"):
                    b[key][f] = b[key][f][:, ::-1]
                    b[key][f, :, 0] *= -1.0
        return b
