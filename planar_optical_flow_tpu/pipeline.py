"""Pipeline facade: config tree -> (model, task, datasets, trainer).

Public surface mirrors the reference ``src/pipeline/pipeline.py:6-36``
(``Pipeline(cfg).train() / evaluate() / load_ckpt() / load_sigterm_ckpt()``)
but covers every workload, not just box regression. Accepts both reference
config styles (SURVEY §2.12):

* nested (``train_3d_box_regression.yaml``): ``dataset / dataloader / model /
  pipeline.{Trainer,Optim,Logger}``
* flat DROW style (``dr_spaam.yaml``): ``epochs / batch_size / num_scans /
  network / cutout_kwargs / similarity_kwargs / ...``
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import (
    Trainer,
    create_train_state,
    make_optimizer,
    exp_decay_schedule,
    tasks,
)
from planar_optical_flow_tpu.train import checkpoint as ckpt_lib
from planar_optical_flow_tpu.utils.logger import RunLogger
from planar_optical_flow_tpu.data import BatchLoader
from planar_optical_flow_tpu.parallel import make_mesh


def normalize_config(cfg: dict) -> dict:
    """Flat DROW-style config -> nested pipeline config."""
    if "pipeline" in cfg:
        return cfg
    model_type = cfg.get("model_type")
    if model_type is None:
        net = cfg.get("network", "cutout_spatial")
        model_type = {
            "cutout": "drow",
            "cutout_gating": "dr-spaam",
            "cutout_spatial": "flow_drow" if cfg.get("with_flow", True)
            else "dr-spaam",
            # fc-family encodings (reference dataset_dr_spaam.py:437-460)
            "fc1d": "fc1d",
            "fc1d_fea": "fc1d_fea",
            "fc2d": "fc2d",
        }.get(net, "dr-spaam")
    sim = cfg.get("similarity_kwargs", {})
    nested = {
        "name": cfg.get("name", "run"),
        "workload": cfg.get("workload", "detection"),
        "dataset": {
            "data_dir": cfg.get("data_dir", "./data/DROWv2-data"),
            "num_scans": cfg.get("num_scans", 5),
            "pedestrian_only": cfg.get("pedestrian_only", False),
            "train_with_val": cfg.get("train_with_val", False),
            "use_augmentation": cfg.get("use_data_augumentation", False),
            "cutout_kwargs": cfg.get("cutout_kwargs", {}),
            "polar_grid_kwargs": cfg.get("polar_grid_kwargs", {}),
        },
        "dataloader": {
            "batch_size": cfg.get("batch_size", 8),
            "num_workers": cfg.get("num_workers", 0),
        },
        "model": {
            "type": model_type,
            "dropout": cfg.get("dropout", 0.0),
            "alpha": sim.get("alpha", 0.5),
            "window_size": sim.get("window_size", 7),
            "pedestrian_only": cfg.get("pedestrian_only", False),
            "focal_loss_gamma": cfg.get("focal_loss_gamma", 0.0),
            "fused_frozen_detector": cfg.get("fused_frozen_detector",
                                             False),
        },
        "pipeline": {
            "Trainer": {
                "grad_norm_clip": cfg.get("grad_norm_clip", 0.0),
                "ckpt_interval": cfg.get("ckpt_interval", 5),
                "eval_interval": cfg.get("eval_interval", 5),
                "epoch": cfg.get("epochs", 1),
                "compute_dtype": cfg.get("compute_dtype"),
                "conv_impl": cfg.get("conv_impl"),
                "pp_microbatches": cfg.get("pp_microbatches"),
            },
            "mesh": cfg.get("mesh"),
            "Optim": {
                "scheduler_kwargs": cfg.get(
                    "scheduler_kwargs",
                    {"epoch0": 0, "lr0": 1e-3,
                     "epoch1": cfg.get("epochs", 1), "lr1": 1e-6},
                ),
            },
            "Logger": {
                "log_dir": cfg.get("log_dir", "./logs"),
                "tag": cfg.get("name", cfg.get("tag", "run")) or "run",
                "log_fname": "log.txt",
                "backup_list": [],
            },
        },
    }
    return nested


def _build_task(cfg: dict, model=None, num_pts: int | None = None):
    """``num_pts``: beam count of the corpus actually loaded (the
    datasets infer it from the first sequence) — without it the
    detection tasks' phi grid defaults to the DROW 450 and a
    narrower/wider corpus crashes at trace time."""
    mtype = cfg["model"]["type"]
    ds = cfg["dataset"]
    if mtype in ("flow_unet", "prototype", "prototype_test"):
        return tasks.FlowUNetTask()
    if mtype == "box_reg":
        return tasks.BoxRegressionTask(is_3d=ds.get("is_3d", True))
    common = dict(
        cutout_kwargs=ds.get("cutout_kwargs", {}),
        focal_loss_gamma=cfg["model"].get("focal_loss_gamma", 0.0),
        pedestrian_only=cfg["model"].get("pedestrian_only", False),
    )
    if num_pts is not None:
        common["num_pts"] = int(num_pts)
    if mtype in ("fc1d", "fc1d_fea", "fc2d"):
        return tasks.DetectionTask(
            **common, encoding=mtype,
            polar_grid_kwargs=ds.get("polar_grid_kwargs", {}),
        )
    if mtype == "flow_drow":
        # fused_frozen_detector: run the frozen detector on the serving
        # kernels inside the train step (~3x faster; tasks.FlowDrowFusedTask)
        if cfg["model"].get("fused_frozen_detector"):
            import jax as _jax

            # alpha/window_size come from the MODEL (not the raw config),
            # so the frozen-detector replay can't mismatch the gate
            return tasks.FlowDrowFusedTask.for_model(
                model, **common,
                interpret=_jax.default_backend() == "cpu",
            )
        return tasks.FlowDrowTask(**common)
    return tasks.DetectionTask(**common)


def _build_datasets(cfg: dict, synthetic_dir: str | None = None):
    from planar_optical_flow_tpu.data import (
        FlowScanPairDataset,
        DrowDetectionDataset,
    )
    from planar_optical_flow_tpu.data.jrdb import JrdbBoxRegressionDataset

    ds = cfg["dataset"]
    data_dir = synthetic_dir or ds["data_dir"]
    mtype = cfg["model"]["type"]
    if mtype in ("flow_unet", "prototype", "prototype_test"):
        train = FlowScanPairDataset(
            data_dir, "train", train_with_val=ds.get("train_with_val", False)
        )
        try:
            val = FlowScanPairDataset(data_dir, "val")
        except FileNotFoundError:
            val = None
        return train, val
    if mtype == "box_reg":
        train = JrdbBoxRegressionDataset("train", {**ds, "data_dir": data_dir})
        try:
            val = JrdbBoxRegressionDataset("val", {**ds, "data_dir": data_dir})
        except FileNotFoundError:
            val = None
        return train, val
    kwargs = dict(
        num_scans=ds.get("num_scans", 5),
        pedestrian_only=ds.get("pedestrian_only", False),
        use_augmentation=ds.get("use_augmentation", False),
    )
    train = DrowDetectionDataset(
        data_dir, "train",
        train_with_val=ds.get("train_with_val", False), **kwargs,
    )
    try:
        val = DrowDetectionDataset(data_dir, "val", **kwargs)
    except FileNotFoundError:
        val = None
    return train, val


def _example_inputs(cfg: dict, batch_size: int, num_pts: int = 450):
    mtype = cfg["model"]["type"]
    ds = cfg["dataset"]
    if mtype in ("flow_unet", "prototype", "prototype_test"):
        x = jnp.zeros((batch_size, num_pts, 2))
        return (x, x)
    if mtype == "box_reg":
        in_dim = cfg["model"].get("input_dim", 4)
        size = ds.get("input_size", 256)
        return (jnp.zeros((batch_size, size, in_dim)),)
    n_ct = ds.get("cutout_kwargs", {}).get("num_cutout_pts", 48)
    s = ds.get("num_scans", 5) + 1
    if mtype in ("fc1d", "fc1d_fea", "fc2d"):
        # (B, S, R, P) per-beam feature columns (models/polar_grid_net.py)
        if mtype == "fc1d":
            r = 1
        elif mtype == "fc1d_fea":
            r = n_ct
        else:
            pg = ds.get("polar_grid_kwargs", {})
            r = int((pg.get("max_range", 30.0) - pg.get("min_range", 0.0))
                    / pg.get("range_bin_size", 1.0)) + 1
        return (jnp.zeros((batch_size, s, r, num_pts)),)
    x = jnp.zeros((batch_size, num_pts, s, n_ct))
    if mtype == "flow_drow":
        return (x, jnp.zeros((batch_size, num_pts)))
    return (x,)


class Pipeline:
    def __init__(self, cfg: dict, synthetic_dir: str | None = None,
                 use_mesh: bool = True, install_signal_handlers: bool = True):
        cfg = normalize_config(cfg)
        self.cfg = cfg
        pcfg = cfg["pipeline"]
        self.logger = RunLogger(pcfg["Logger"])
        self.model = get_model(cfg["model"])
        self.train_set, self.val_set = _build_datasets(cfg, synthetic_dir)
        # beam count comes from the corpus (the datasets infer it from
        # the first sequence); the task's phi grid must match it
        num_pts = (len(self.train_set.phi_grid)
                   if hasattr(self.train_set, "phi_grid") else None)
        self.task = _build_task(cfg, self.model, num_pts=num_pts)

        bsz = cfg["dataloader"]["batch_size"]
        self.train_loader = BatchLoader(self.train_set, bsz, shuffle=True)
        self.val_loader = (
            BatchLoader(self.val_set, bsz, shuffle=False)
            if self.val_set is not None and len(self.val_set) >= bsz else None
        )

        steps_per_epoch = max(len(self.train_loader), 1)
        optim_cfg = dict(pcfg["Optim"])
        optim_cfg.setdefault(
            "grad_norm_clip", pcfg["Trainer"].get("grad_norm_clip", 0.0)
        )
        self.tx = make_optimizer(optim_cfg, steps_per_epoch)
        sk = optim_cfg.get("scheduler_kwargs", {})
        schedule = exp_decay_schedule(
            sk.get("epoch0", 0), sk.get("lr0", 1e-3),
            sk.get("epoch1", 100), sk.get("lr1", 1e-6), steps_per_epoch,
        )

        self.state = create_train_state(
            self.model,
            _example_inputs(cfg, bsz, num_pts=num_pts or 450), self.tx,
            init_kwargs={"train": False},
        )

        # FlowDROW workflow: graft a pre-trained detector checkpoint into the
        # frozen dr_spaam subtree (reference dr_spaam.py:294-298 loads
        # ./pre_trained_ckpts/dr_spaam_e40.pth)
        pretrained = cfg["model"].get("pretrained_detector")
        if pretrained and cfg["model"]["type"] == "flow_drow":
            self.load_pretrained_detector(pretrained)
        # mesh knob: pipeline.mesh: {data: N, model: M} (-1/"auto" absorbs
        # the remaining devices; dcn: K adds an outer slice axis — see
        # parallel/mesh.py). Default: 1-D data-parallel over all devices.
        # With a model axis > 1, the state is partitioned by the default
        # Megatron-style rule (parallel.default_partition_rule).
        #
        # A mesh request is NEVER dropped silently: an unknown axis name is
        # a config error, every fallback to single-device jit logs a
        # warning naming the reason, and `pipeline.mesh: {strict: true}`
        # turns fallbacks into errors (config contract analogue:
        # reference src/pipeline/pipeline.py:6-36 builds exactly what the
        # config names or crashes).
        mesh = None
        sharding_fn = None
        if use_mesh:
            from planar_optical_flow_tpu.parallel import (
                make_mesh_from_config, state_shardings,
            )

            mesh_cfg = pcfg.get("mesh")
            strict = False
            if mesh_cfg is not None and not isinstance(mesh_cfg, dict):
                raise TypeError(
                    f"pipeline.mesh must be a mapping of axis sizes, got "
                    f"{type(mesh_cfg).__name__}: {mesh_cfg!r}"
                )
            if mesh_cfg:
                mesh_cfg = dict(mesh_cfg)
                strict = bool(mesh_cfg.pop("strict", False))
                unknown = set(mesh_cfg) - {"dcn", "data", "model", "pipe"}
                if unknown:
                    raise ValueError(
                        f"unknown mesh axis {sorted(unknown)} in "
                        "pipeline.mesh — valid axes: dcn, data, model, "
                        "pipe (plus strict: true/false)"
                    )

            def _fallback(reason):
                if strict:
                    raise ValueError(
                        f"pipeline.mesh {mesh_cfg} unusable: {reason} "
                        "(strict: true — remove it to allow the "
                        "single-device fallback)"
                    )
                if mesh_cfg:
                    self.logger.warning(
                        f"pipeline.mesh {mesh_cfg} dropped — {reason}; "
                        "falling back to single-device jit"
                    )
                return None

            try:
                mesh = make_mesh_from_config(mesh_cfg)
            except ValueError as e:
                mesh = _fallback(f"mesh construction failed: {e}")
            if mesh is not None:
                shape = dict(mesh.shape)
                if shape.get("pipe", 1) > 1 and shape.get("dcn", 1) > 1:
                    # pipeline_apply's shard_map only spans (data, pipe);
                    # a dcn axis would be silently replicated — every dcn
                    # group computing identical work is a config error,
                    # not a fallback
                    raise ValueError(
                        f"pipeline.mesh {mesh_cfg}: a dcn axis cannot "
                        "combine with a pipe axis (the pipeline "
                        "wavefront does not span DCN; each dcn group "
                        "would redundantly compute the same schedule) — "
                        "use {dcn, data[, model]} or {data, pipe}"
                    )
                if shape.get("pipe", 1) > 1:
                    # pipe axis: batch must split into the microbatches
                    # (default = pipe size) and each microbatch's rows
                    # over a data axis, if any; Trainer validates the
                    # stage count against the task
                    micro = int(pcfg["Trainer"].get("pp_microbatches")
                                or shape["pipe"])
                    rows = shape.get("data", 1) * max(micro, 1)
                    if bsz % max(rows, 1) != 0:
                        mesh = _fallback(
                            f"batch_size {bsz} does not divide into "
                            f"data={shape.get('data', 1)} x "
                            f"{micro} microbatches"
                        )
                else:
                    if "data" in shape or "dcn" in shape:
                        # batch rows shard over (dcn, data) jointly
                        data_size = (shape.get("dcn", 1)
                                     * shape.get("data", 1))
                    else:
                        # model-only mesh: the Trainer replicates the
                        # batch (no data axis to shard over), so no
                        # divisibility constraint applies
                        data_size = 1
                    if bsz % max(data_size, 1) != 0:
                        mesh = _fallback(
                            f"batch_size {bsz} not divisible by the "
                            f"data-parallel extent {data_size}"
                        )
                    if mesh is not None and shape.get("model", 1) > 1:
                        sharding_fn = state_shardings
        self.trainer = Trainer(
            self.logger, pcfg["Trainer"], self.task, lr_schedule=schedule,
            mesh=mesh, state_sharding_fn=sharding_fn,
            install_signal_handlers=install_signal_handlers,
        )

    # ------------------------------------------------------------- control

    def train(self):
        self.state, rc = self.trainer.train(
            self.state, self.train_loader, self.val_loader
        )
        return rc

    def evaluate(self, loader=None, tb_prefix="TEST"):
        loader = loader or self.val_loader or self.train_loader
        return self.trainer.evaluate(self.state, loader, tb_prefix=tb_prefix)

    def load_ckpt(self, path: str):
        self.state = ckpt_lib.restore_checkpoint(path, self.state)

    def save_ckpt(self, name: str = "ckpt_final"):
        return ckpt_lib.save_checkpoint(
            os.path.join(self.logger.ckpt_dir, name), self.state
        )

    def load_pretrained_detector(self, ckpt_path: str):
        """Restore a SpatialDrow checkpoint (raw tree, no optimizer
        template needed) and graft its weights into this FlowDrow state's
        (frozen) ``dr_spaam`` subtree."""
        from planar_optical_flow_tpu.train.state import (
            load_pretrained_subtree,
        )

        tree = ckpt_lib.load_checkpoint_tree(ckpt_path)
        self.state = load_pretrained_subtree(
            self.state, "dr_spaam", tree["params"], tree["batch_stats"]
        )
        self.logger.info(f"grafted pre-trained detector from {ckpt_path}")

    def sigterm_ckpt_exists(self) -> bool:
        return os.path.isdir(self.logger.sigterm_ckpt)

    def load_sigterm_ckpt(self):
        self.state = ckpt_lib.restore_checkpoint(
            self.logger.sigterm_ckpt, self.state
        )
