"""Box-regression inference API.

Rebuild of the reference ``box_regressor.py:9-105``: given detection centers
on a point cloud, crop a radius segment around each, resample it to the
network's fixed input size, run the regressor, and de-canonicalize the
prediction back to a global box ``[cx, cy, (cz), l, w, (h), rot_z]``.

The crop/resample is host-side numpy (variable-length segments); the network
forward is one jitted batched call for ALL detections of a frame at once
(the reference loops one detection per call).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models.pointnet import BoundingBoxRegressor
from planar_optical_flow_tpu.train import checkpoint as ckpt_lib


def resample_segment(segment: np.ndarray, size: int,
                     rng: np.random.Generator | None = None) -> np.ndarray:
    """Shuffle+truncate or repeat+pad a variable-length segment to ``size``
    points (reference ``jrdb_dataset.py:139-149`` — already TPU-shaped)."""
    rng = rng or np.random.default_rng(0)
    seg = segment.copy()
    if len(seg) >= size:
        rng.shuffle(seg)
        return seg[:size]
    repeat = size // len(seg)
    pad = size % len(seg)
    rng.shuffle(seg)
    seg = np.repeat(seg, repeat, axis=0)
    seg = np.vstack([seg, seg[:pad]])
    rng.shuffle(seg)
    return seg


class BoxRegressor:
    """Callable box regressor over (points, detection centers).

    Args mirror the reference's config surface: ``input_size``,
    ``radius_segment``, ``is_3d``, ``input_with_angle``.
    """

    def __init__(self, variables, cfg: dict, seed: int = 0,
                 _build_network: bool = True):
        self.cfg = cfg
        self.is_3d = cfg.get("is_3d", True)
        self.input_size = cfg.get("input_size", 256)
        self.radius = cfg.get("radius_segment", 0.4)
        self.input_with_angle = cfg.get("input_with_angle", True)
        self.min_segment_size = cfg.get("min_segment_size", 1)
        self._rng = np.random.default_rng(seed)
        self.in_dim = (3 if self.is_3d else 2) + (
            1 if self.input_with_angle else 0)

        self.model = None
        self.variables = variables
        if _build_network:
            tgt_dim = 5 if self.is_3d else 3
            self.model = BoundingBoxRegressor(
                input_dim=self.in_dim, target_dim=tgt_dim,
                dropout=cfg.get("dropout", 0.0),
            )
            self._forward = jax.jit(
                lambda v, x: self.model.apply(v, x, train=False)
            )

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, cfg: dict, **kw):
        """Load from any TrainState checkpoint (raw tree — works regardless
        of the optimizer it was trained with)."""
        self = cls(None, cfg, **kw)
        tree = ckpt_lib.load_checkpoint_tree(ckpt_path)
        variables = {"params": tree["params"]}
        if tree.get("batch_stats") is not None:
            variables["batch_stats"] = tree["batch_stats"]
        self.variables = variables
        return self

    @classmethod
    def from_artifact(cls, path: str, cfg: dict, **kw):
        """Run the full box-regression API (radius crop, resample,
        de-canonicalization) on an AOT-exported network
        (``bin/export_model.py``) — no checkpoint or model code needed.

        Detection counts need not match the exported batch sizes: frames
        are padded to the smallest exported batch that fits (chunked over
        the largest for bigger frames) and the pad rows dropped — exact,
        because the eval-mode forward is per-sample independent.
        """
        from planar_optical_flow_tpu.infer.export import load_model

        self = cls(None, cfg, _build_network=False, **kw)
        engine = load_model(path)
        mtype = engine.meta.get("model_type")
        if mtype is not None and mtype != "box_reg":
            raise ValueError(
                f"artifact {path} holds a {mtype!r} model, not a box "
                f"regressor")
        for sig in engine.meta.get("input_shapes", {}).values():
            if len(sig) != 1 or len(sig[0]["shape"]) != 3:
                raise ValueError(
                    f"artifact {path} is not a box-regression export "
                    f"(expected one (B, num_pts, dim) input, got "
                    f"{[s['shape'] for s in sig]})")
            want = [sig[0]["shape"][1], sig[0]["shape"][2]]
            if want != [self.input_size, self.in_dim]:
                raise ValueError(
                    f"artifact {path} expects segments of shape "
                    f"(B, {want[0]}, {want[1]}) but the config implies "
                    f"(B, {self.input_size}, {self.in_dim})")
        # the input dim alone cannot distinguish a 2D+angle export from a
        # 3D-without-angle config (both are in_dim 3): check the predicted
        # width too, or the mismatch would surface as an IndexError deep
        # in __call__ instead of here
        tgt_dim = 5 if self.is_3d else 3
        for osig in engine.meta.get("output_shapes", {}).values():
            oshape = osig[0]["shape"] if len(osig) == 1 else None
            if oshape is None or len(oshape) != 2 or oshape[1] != tgt_dim:
                raise ValueError(
                    f"artifact {path} predicts shape {oshape or osig} but "
                    f"the config (is_3d={self.is_3d}) implies "
                    f"(B, {tgt_dim}) boxes")

        exported = sorted(engine.meta["batches"])

        def fwd(_, x):
            x = jnp.asarray(x)
            outs, i, n = [], 0, x.shape[0]
            if n == 0:
                # run the smallest program on a dummy row and keep none of
                # it: output width/dtype come from the export, no rows do
                dummy = jnp.zeros((exported[0],) + x.shape[1:], x.dtype)
                return engine(dummy)[:0]
            while i < n:
                rem = n - i
                fit = next((e for e in exported if e >= rem), None)
                le = [e for e in exported if e <= rem]
                # pad the whole remainder iff that costs no more rows than
                # chunking it at the largest fitting size (ties -> fewer
                # dispatches); otherwise consume one full chunk
                if fit is not None and (
                        not le or fit <= le[-1] * -(-rem // le[-1])):
                    b, take = fit, rem
                else:
                    b = take = le[-1]
                chunk = x[i:i + take]
                if take < b:
                    pad = jnp.broadcast_to(
                        chunk[:1], (b - take,) + chunk.shape[1:])
                    chunk = jnp.concatenate([chunk, pad], axis=0)
                outs.append(engine(chunk)[:take])
                i += take
            return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

        self._forward = fwd
        return self

    def generate_segments(self, points: np.ndarray, det_centers: np.ndarray):
        """Radius-crop + resample one segment per detection center
        (reference ``generate_segment``, ``box_regressor.py:94-105``)."""
        segs, ok = [], []
        dim = 3 if self.is_3d else 2
        if len(det_centers) == 0:
            return (np.zeros((0, self.input_size, dim), np.float32),
                    np.zeros((0,), bool))
        pts = points[:, :dim]
        for c in det_centers:
            d = np.linalg.norm(pts[:, :2] - c[None, :2], axis=1)
            seg = pts[d <= self.radius]
            if len(seg) < max(self.min_segment_size, 1):
                segs.append(np.zeros((self.input_size, dim), np.float32))
                ok.append(False)
                continue
            segs.append(
                resample_segment(seg, self.input_size, self._rng).astype(
                    np.float32
                )
            )
            ok.append(True)
        return np.stack(segs), np.asarray(ok)

    def __call__(self, points: np.ndarray, det_centers: np.ndarray,
                 det_oris: np.ndarray | None = None):
        """Regress one box per detection center.

        Returns ``(N, 7)`` ``[cx, cy, cz, l, w, h, rot_z]`` when 3D, else
        ``(N, 5)`` ``[cx, cy, l, w, rot_z]``, plus the validity mask.
        """
        det_centers = np.atleast_2d(det_centers)
        n = len(det_centers)
        if n == 0:
            width = 7 if self.is_3d else 5
            return np.zeros((0, width), np.float32), np.zeros((0,), bool)
        if det_oris is None:
            det_oris = np.zeros(n, np.float32)
        segs, ok = self.generate_segments(points, det_centers)

        inputs = segs - det_centers[:, None, : segs.shape[-1]]
        if self.input_with_angle:
            ang = np.broadcast_to(
                det_oris[:, None, None], (n, self.input_size, 1)
            )
            inputs = np.concatenate([inputs, ang], axis=-1)

        pred = np.asarray(self._forward(self.variables,
                                        jnp.asarray(inputs)))
        if self.is_3d:
            cz = pred[:, 0] + det_centers[:, 2]
            rot = pred[:, -1] + det_oris
            boxes = np.column_stack(
                [det_centers[:, 0], det_centers[:, 1], cz,
                 pred[:, 1], pred[:, 2], pred[:, 3], rot]
            )
        else:
            rot = pred[:, -1] + det_oris
            boxes = np.column_stack(
                [det_centers[:, 0], det_centers[:, 1],
                 pred[:, 0], pred[:, 1], rot]
            )
        return boxes, ok
