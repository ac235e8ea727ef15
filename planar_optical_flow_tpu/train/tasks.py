"""Per-workload loss/eval definitions ("tasks").

The reference couples models to the pipeline through ``model_fn(model,
batch) -> (loss, tb_dict, rtn_dict)`` closures (``src/utils/eval_utils.py``,
``src/model/box_regression_fn.py``). Here each workload is a Task object
with pure ``loss``/``metrics`` functions over (apply_fn, variables, batch) —
jit-compiled by the Trainer, including any on-device input encoding (cutout
extraction happens *inside* the train step, not in dataloader workers).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from planar_optical_flow_tpu import ops
from planar_optical_flow_tpu.ops.cutout import scans_to_cutout, area_s_for
from planar_optical_flow_tpu.ops.geometry import get_laser_phi


def _model_dtype(variables):
    """The floating dtype of the model parameters — mixed-precision
    training casts params (not the batch), so model INPUTS must be cast to
    this dtype by the task, after any f32 encoding/geometry. Feeding f32
    inputs to bf16 params would silently promote the whole network back to
    f32 (flax ``promote_dtype``)."""
    for leaf in jax.tree_util.tree_leaves(variables.get("params", {})):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            return leaf.dtype
    return jnp.float32


def _apply(apply_fn, variables, args, kwargs, train, rng=None):
    """Run the model, collecting batch-norm updates when training."""
    rngs = {"dropout": rng} if rng is not None else None
    if train:
        out, mutated = apply_fn(
            variables, *args, train=True, mutable=["batch_stats"], rngs=rngs,
            **kwargs,
        )
        return out, mutated.get("batch_stats")
    return apply_fn(variables, *args, train=False, **kwargs), None


@dataclass(frozen=True)
class FlowUNetTask:
    """Scan-pair planar flow (reference ``bin/train_prototype.py`` +
    ``eval_utils.model_fn/eval``)."""

    masked: bool = False

    def loss(self, apply_fn, variables, batch, train, rng=None):
        dt = _model_dtype(variables)
        scan1 = batch["scan_pair"][:, 0].astype(dt)
        scan2 = batch["scan_pair"][:, 1].astype(dt)
        pred, new_stats = _apply(apply_fn, variables, (scan1, scan2), {},
                                 train, rng)
        mask = batch.get("exclude_mask") if self.masked else None
        loss = ops.epe_loss(pred, batch["flow_target"], mask)
        return loss, {"loss": loss}, {"pred_flow": pred}, new_stats

    def metrics(self, apply_fn, variables, batch):
        pred, _ = _apply(
            apply_fn, variables,
            (batch["scan_pair"][:, 0], batch["scan_pair"][:, 1]), {}, False,
        )
        epe, aae = ops.epe_aae(pred, batch["flow_target"])
        return {"epe": jnp.mean(epe), "aae": jnp.mean(aae)}, {"pred_flow": pred}


@dataclass(frozen=True)
class DetectionTask:
    """DROW / DR-SPAAM person detection (reference ``bin/train_obj_det.py``
    + ``eval_utils.model_fn_obj_det``). Input encoding runs on device
    inside the jitted step.

    ``encoding`` selects the reference's network-input family
    (``dataset_dr_spaam.py:437-460``): "cutout" (default; depth windows),
    "fc1d" (raw per-beam ranges), "fc1d_fea" (transposed cutouts) or
    "fc2d" (TSDF polar grid via ``polar_grid_kwargs``) — the fc encodings
    produce ``(B, S, R, P)`` columns for :class:`models.PolarGridDetector`.

    ``cutout_kwargs["encode_impl"]`` selects the cutout implementation:
    "auto" (default — the Pallas serving kernel on accelerators when the
    geometry allows, XLA elsewhere), "pallas", "pallas_interpret" (CPU
    testing) or "xla". The Pallas kernel (in-VMEM lane gathers,
    ``ops/pallas/cutout_kernel.py``) replaces ~7.6 ms of XLA one-hot-matmul
    encode per 8x11-scan train step with ~0.7 ms, and requires
    ``fixed=True, stride=1`` (each scan windows its own ranges). Under
    mesh-sharded (pjit) training the Trainer resolves "auto" to "xla" —
    ``pallas_call`` carries no SPMD partitioning rule, so the partitioner
    would replicate the encode instead of sharding it along the batch
    (an explicit "pallas" is still honored).
    """

    # GPipe stage count of loss_pipelined's staged forward (backbone |
    # head, drow_pipeline_train_stages); the Trainer checks the mesh's
    # pipe axis against this before building steps
    pp_num_stages = 2

    cutout_kwargs: dict = field(default_factory=dict)
    focal_loss_gamma: float = 0.0
    pedestrian_only: bool = False
    num_pts: int = 450
    encoding: str = "cutout"
    polar_grid_kwargs: dict = field(default_factory=dict)

    def _encode_cutout(self, scans):
        kw = dict(self.cutout_kwargs)
        impl = kw.pop("encode_impl", "auto")
        eligible = kw.get("fixed", False) and kw.get("stride", 1) == 1
        if impl in ("pallas", "pallas_interpret") and not eligible:
            # an explicit request must not silently fall back to the ~10x
            # slower XLA encode (and a parity test would compare the XLA
            # path against itself)
            raise ValueError(
                f"cutout_kwargs encode_impl={impl!r} requires fixed=True "
                "and stride=1 (the pallas cutout kernel's supported "
                "geometry); use encode_impl='auto' or 'xla' otherwise"
            )
        pallas_ok = (
            impl in ("auto", "pallas", "pallas_interpret")
            and eligible
            and not (impl == "auto" and jax.default_backend() == "cpu")
        )
        if pallas_ok:
            return self._encode_cutout_pallas(
                scans, kw, interpret=(impl == "pallas_interpret"))
        if kw.pop("area_mode", False):
            kw["area_mode"] = True
            kw.setdefault(
                "area_s",
                area_s_for(kw.get("window_width", 1.66),
                           kw.get("num_cutout_pts", 48)),
            )
        phi = get_laser_phi(num_pts=self.num_pts)
        return scans_to_cutout(scans, phi, **kw)

    def _encode_cutout_pallas(self, scans, kw, interpret):
        """(B, S, P) -> (B, P, S, C) via the serving cutout kernel (no
        gradient flows into the encode — scans are inputs)."""
        from planar_optical_flow_tpu.ops.pallas.cutout_kernel import (
            cutout_fused,
        )

        b, s, p = scans.shape
        p_pad = ((p + 7) // 8) * 8  # kernel wants sublane-aligned beams
        flat = scans.reshape(b * s, p).astype(jnp.float32)
        if p_pad != p:
            flat = jnp.pad(flat, ((0, 0), (0, p_pad - p)))
        ct = cutout_fused(
            flat,
            num_cutout_pts=kw.get("num_cutout_pts", 48),
            window_width=kw.get("window_width", 1.66),
            window_depth=kw.get("window_depth", 1.0),
            padding_val=kw.get("padding_val", 29.99),
            centered=kw.get("centered", True),
            area_mode=bool(kw.get("area_mode", False)),
            p_valid=p, interpret=interpret,
        )  # (b*s*p_pad, C) f32
        c = ct.shape[-1]
        ct = ct.reshape(b, s, p_pad, c)[:, :, :p]
        return ct.transpose(0, 2, 1, 3)  # (B, P, S, C)

    def _encode(self, scans):
        if self.encoding == "fc1d":
            # (B, S, P) raw ranges -> (B, S, 1, P) columns
            return scans[..., None, :]
        if self.encoding == "fc1d_fea":
            # cutouts (B, P, S, L) -> (B, S, L, P) columns (the reference's
            # transpose at dataset_dr_spaam.py:452-454)
            return self._encode_cutout(scans).transpose(0, 2, 3, 1)
        if self.encoding == "fc2d":
            from planar_optical_flow_tpu.ops.polar_grid import (
                scans_to_polar_grid,
            )

            return scans_to_polar_grid(scans, **self.polar_grid_kwargs)
        return self._encode_cutout(scans)

    def forward(self, apply_fn, variables, batch, train, rng=None):
        encoded = self._encode(batch["scans"])  # geometry stays f32
        encoded = encoded.astype(_model_dtype(variables))
        return _apply(apply_fn, variables, (encoded,), {}, train, rng)

    def loss(self, apply_fn, variables, batch, train, rng=None):
        out, new_stats = self.forward(apply_fn, variables, batch, train, rng)
        pred_cls, pred_reg = out[0], out[1]  # SpatialDrow also returns sim
        cls_loss, reg_loss, fg_ratio = ops.detection_loss(
            pred_cls, pred_reg, batch["target_cls"], batch["target_reg"],
            focal_gamma=self.focal_loss_gamma,
            pedestrian_only=self.pedestrian_only,
        )
        loss = cls_loss + reg_loss
        tb = {"loss": loss, "cls_loss": cls_loss, "reg_loss": reg_loss,
              "fg_ratio": fg_ratio}
        return loss, tb, {"pred_cls": pred_cls, "pred_reg": pred_reg}, new_stats

    def metrics(self, apply_fn, variables, batch):
        out, _ = self.forward(apply_fn, variables, batch, False)
        pred_cls, pred_reg = out[0], out[1]
        cls_loss, reg_loss, fg_ratio = ops.detection_loss(
            pred_cls, pred_reg, batch["target_cls"], batch["target_reg"],
            focal_gamma=self.focal_loss_gamma,
            pedestrian_only=self.pedestrian_only,
        )
        return (
            {"cls_loss": cls_loss, "reg_loss": reg_loss, "fg_ratio": fg_ratio},
            {"pred_cls": pred_cls, "pred_reg": pred_reg},
        )

    def loss_pipelined(self, apply_fn, variables, batch, train, rng=None,
                       *, mesh, n_microbatches=None):
        """Training loss with the detector forward run as a GPipe
        wavefront over the mesh's ``pipe`` axis (backbone | head stages,
        ``parallel/pipeline_parallel.py``). BatchNorm follows the stated
        ghost-batch policy: per-microbatch statistics, running-stat EMA
        advanced once per microbatch in order (see
        ``drow_pipeline_train_stages``); numerics match a sequential
        microbatched loop exactly, not the unstaged global-batch step.

        Supports the plain DROW detector only — SpatialDROW's gate is a
        cross-cutout op BETWEEN the stages and PolarGridDetector has a
        different trunk; both raise rather than silently destage.
        """
        from planar_optical_flow_tpu.models.drow import Drow
        from planar_optical_flow_tpu.parallel.pipeline_parallel import (
            drow_pipeline_train_stages,
            pipeline_apply,
        )

        model = getattr(apply_fn, "__self__", None)
        if type(model) is not Drow:
            raise ValueError(
                "pipeline-parallel training stages exist for the plain "
                f"DROW detector only, got {type(model).__name__} — use a "
                "data/model mesh for other detectors"
            )
        if not train:
            return self.loss(apply_fn, variables, batch, train, rng)
        encoded = self._encode(batch["scans"]).astype(
            _model_dtype(variables))
        fns, split_p, split_s, combine = drow_pipeline_train_stages(
            model,
            dropout_rng=rng if getattr(model, "dropout", 0) > 0 else None,
        )
        # both stage entries reference the SAME params tracer, so
        # jax.grad sums the two stages' contributions automatically
        (pred_cls, pred_reg), new_states = pipeline_apply(
            fns, split_p(variables["params"]), encoded, mesh,
            n_microbatches=n_microbatches,
            stage_state=split_s(variables["batch_stats"]),
        )
        cls_loss, reg_loss, fg_ratio = ops.detection_loss(
            pred_cls, pred_reg, batch["target_cls"], batch["target_reg"],
            focal_gamma=self.focal_loss_gamma,
            pedestrian_only=self.pedestrian_only,
        )
        loss = cls_loss + reg_loss
        tb = {"loss": loss, "cls_loss": cls_loss, "reg_loss": reg_loss,
              "fg_ratio": fg_ratio}
        return loss, tb, {"pred_cls": pred_cls, "pred_reg": pred_reg}, \
            combine(new_states)


@dataclass(frozen=True)
class FlowDrowTask(DetectionTask):
    """Joint detection + flow with the frozen detector (reference
    ``eval_utils.model_fn_dr_spaam:90-110`` / ``model_fn_eval:136-155``)."""

    def loss(self, apply_fn, variables, batch, train, rng=None):
        dt = _model_dtype(variables)
        cutouts = self._encode(batch["scans"]).astype(dt)
        cur_scan = batch["scans"][:, -1].astype(dt)
        out, new_stats = _apply(apply_fn, variables, (cutouts, cur_scan), {},
                                train, rng)
        pred_cls, pred_reg, pred_flow = out
        loss = ops.epe_loss(pred_flow, batch["target_flow"],
                            batch["exclude_mask"])
        pred_norm = ops.epe_loss(pred_flow, jnp.zeros_like(pred_flow),
                                 batch["exclude_mask"])
        tb = {"loss": loss, "avg_pred_norm": pred_norm}
        return loss, tb, {"pred_flow": pred_flow}, new_stats

    def metrics(self, apply_fn, variables, batch):
        cutouts = self._encode(batch["scans"])
        cur_scan = batch["scans"][:, -1]
        out, _ = _apply(apply_fn, variables, (cutouts, cur_scan), {}, False)
        pred_cls, pred_reg, pred_flow = out
        epe, aae = ops.epe_aae(pred_flow, batch["target_flow"])
        return (
            {"epe": jnp.mean(epe), "aae": jnp.mean(aae)},
            {"pred_flow": pred_flow, "pred_cls": pred_cls,
             "pred_reg": pred_reg},
        )


@dataclass(frozen=True)
class FlowDrowFusedTask(FlowDrowTask):
    """FlowDROW training with the FROZEN detector run on the fused
    serving kernels (Pallas cutout + folded-BN bf16 conv stacks + banded
    z-carry gate) instead of the flax module — ~3x faster step, legal
    because no gradient flows through the detector (``stop_gradient``; the
    reference freezes with ``requires_grad=False``, ``dr_spaam.py:294-298``).
    Only the flow head (the trained part) runs through the module, exact
    and with its BatchNorm stats updating.

    Requires the fixed-geometry cutout config (``fixed=True, stride=1``)
    and a ``flow_drow`` model with ``freeze_detector=True``. Eval
    (:meth:`metrics`) keeps the exact module path.

    ``alpha``/``window_size`` MUST match the model's gate configuration —
    the task replays the frozen detector outside the module, so a
    mismatched alpha silently mixes templates differently from the model.
    Construct via :meth:`for_model` to derive them from the model.
    """

    alpha: float = 0.5
    window_size: int = 7
    interpret: bool = False

    @classmethod
    def for_model(cls, model, **kwargs):
        """Build the task with ``alpha``/``window_size`` taken from the
        model's gate config (the safe way — no silent mismatch)."""
        kwargs.setdefault("alpha", float(model.alpha))
        kwargs.setdefault("window_size", int(model.window_size))
        return cls(**kwargs)

    def loss(self, apply_fn, variables, batch, train, rng=None):
        from planar_optical_flow_tpu.train.fused_frozen import (
            frozen_detector_forward,
        )

        kw = self.cutout_kwargs
        if not kw.get("fixed") or kw.get("stride", 1) != 1:
            return super().loss(apply_fn, variables, batch, train, rng)

        scans = batch["scans"]  # (B, S, P), scan S-1 current
        det_vars = {
            "params": variables["params"]["dr_spaam"],
            "batch_stats": variables["batch_stats"]["dr_spaam"],
        }
        # num_classes from the actual head weights (not the task flag —
        # a mismatched flag would size the kernel's cls ref wrongly)
        n_cls = det_vars["params"]["head"]["cls"]["kernel"].shape[-1]
        _, _, sim_band = frozen_detector_forward(
            det_vars, scans, alpha=self.alpha,
            window_size=self.window_size,
            num_classes=int(n_cls),
            num_pts=self.num_pts,
            ct_len=kw.get("num_cutout_pts", 48),
            window_width=kw.get("window_width", 1.66),
            window_depth=kw.get("window_depth", 1.0),
            padding_val=kw.get("padding_val", 29.99),
            centered=kw.get("centered", True),
            area_mode=bool(kw.get("area_mode", False)),
            interpret=self.interpret,
        )
        dt = _model_dtype(variables)
        cur_scan = scans[:, -1].astype(dt)
        # the flow head — the only trained submodule — runs in the module
        # (exact math, BN stats update); grads reach only its params
        rngs = {"dropout": rng} if rng is not None else None
        if train:
            pred_flow, mutated = apply_fn(
                variables, sim_band.astype(dt), cur_scan,
                method=lambda m, s, c: m._flow_head(s, c, train=True),
                mutable=["batch_stats"], rngs=rngs,
            )
            # merge: the mutated tree covers only the flow-head submodules
            new_stats = dict(variables["batch_stats"])
            new_stats.update(dict(mutated["batch_stats"]))
        else:
            pred_flow = apply_fn(
                variables, sim_band.astype(dt), cur_scan,
                method=lambda m, s, c: m._flow_head(s, c, train=False),
            )
            new_stats = None
        loss = ops.epe_loss(pred_flow, batch["target_flow"],
                            batch["exclude_mask"])
        pred_norm = ops.epe_loss(pred_flow, jnp.zeros_like(pred_flow),
                                 batch["exclude_mask"])
        tb = {"loss": loss, "avg_pred_norm": pred_norm}
        return loss, tb, {"pred_flow": pred_flow}, new_stats


@dataclass(frozen=True)
class BoxRegressionTask:
    """PointNet box regression (reference ``src/model/box_regression_fn.py``).

    Eval computes, fully batched on device, the rotated IoU of each
    de-canonicalized prediction against its padded neighbor GT boxes — one
    program instead of the reference's per-sample kernel launches
    (``box_regression_fn.py:77-82``)."""

    alpha: float = 0.5
    is_3d: bool = True

    def loss(self, apply_fn, variables, batch, train, rng=None):
        x = batch["input"].astype(_model_dtype(variables))
        pred, new_stats = _apply(apply_fn, variables, (x,), {}, train, rng)
        loss = ops.box_regression_loss(pred, batch["target"], self.alpha)
        return loss, {"loss": loss}, {"pred": pred}, new_stats

    def metrics(self, apply_fn, variables, batch):
        pred, _ = _apply(apply_fn, variables, (batch["input"],), {}, False)
        target = batch["target"]
        det_center = batch["det_center"]
        input_angle = batch["input"][:, 0, -1]

        if self.is_3d:
            loss_z = jnp.abs(
                pred[:, 0] + det_center[:, -1]
                - (target[:, 0] + det_center[:, -1])
            )
            loss_dim = jnp.sum(jnp.abs(pred[:, 1:-1] - target[:, 1:-1]), axis=1)
            ori = pred[:, -1] + input_angle
            boxes = jnp.concatenate(
                [
                    det_center[:, :2],
                    (pred[:, 0] + det_center[:, -1])[:, None],
                    pred[:, 1:-1],
                    ori[:, None],
                ],
                axis=1,
            )  # (B, 7): cx cy cz l w h rot
            iou_fn = ops.rotated_iou_3d
        else:
            loss_z = jnp.zeros(pred.shape[0])
            loss_dim = jnp.sum(jnp.abs(pred[:, :-1] - target[:, :-1]), axis=1)
            ori = pred[:, -1] + input_angle
            boxes = jnp.concatenate(
                [det_center[:, :2], pred[:, :-1], ori[:, None]], axis=1
            )  # (B, 5)
            iou_fn = ops.rotated_iou

        loss_ori = jnp.abs(ori - batch["rot_z"])

        # batched IoU vs padded neighbor GTs: vmap one (1, K) call per sample
        neighbors = batch["target_neighbor"]  # (B, K, 7|5)
        neighbor_valid = batch["target_neighbor_valid"]  # (B, K)

        def per_sample(box, nbrs, valid):
            iou = iou_fn(box[None], nbrs)[0]  # (K,)
            return jnp.max(jnp.where(valid, iou, -jnp.inf))

        ious = jax.vmap(per_sample)(boxes, neighbors, neighbor_valid)
        return (
            {
                "iou": jnp.mean(ious),
                "loss_z": jnp.mean(loss_z),
                "loss_dim": jnp.mean(loss_dim),
                "loss_ori": jnp.mean(loss_ori),
            },
            {"pred": pred},
        )
