"""Model registry: config dict -> flax module.

Extends the reference's one-entry registry (``src/model/get_model.py:1-6``,
``"box_reg"`` only) to every model family in the repo; the ``"dr-spaam"``
type that the reference declares but never implements
(``config/config_test.yaml``) resolves here.
"""

from __future__ import annotations

from planar_optical_flow_tpu.models.flow_unet import FlowUNet, FlowUNetAdditive
from planar_optical_flow_tpu.models.drow import Drow
from planar_optical_flow_tpu.models.spatial_drow import SpatialDrow
from planar_optical_flow_tpu.models.flow_drow import FlowDrow
from planar_optical_flow_tpu.models.pointnet import BoundingBoxRegressor
from planar_optical_flow_tpu.models.polar_grid_net import PolarGridDetector


def _build_box_reg(cfg):
    return BoundingBoxRegressor(
        input_dim=cfg.get("input_dim", 4),
        target_dim=cfg.get("target_dim", 5),
        dropout=cfg.get("dropout", 0.3),
    )


def _build_flow_unet(cfg):
    return FlowUNet(
        in_channels=cfg.get("in_channels", 2),
        max_displacement=cfg.get("max_displacement", 5),
        linear_head=cfg.get("linear_head", False),
    )


def _build_flow_unet_additive(cfg):
    return FlowUNetAdditive(in_channels=cfg.get("in_channels", 2))


def _build_drow(cfg):
    return Drow(
        dropout=cfg.get("dropout", 0.0),
        pedestrian_only=cfg.get("pedestrian_only", False),
        remat=cfg.get("remat", False),
    )


def _build_spatial_drow(cfg):
    return SpatialDrow(
        dropout=cfg.get("dropout", 0.0),
        alpha=cfg.get("alpha", 0.5),
        window_size=cfg.get("window_size", 7),
        pedestrian_only=cfg.get("pedestrian_only", False),
        remat=cfg.get("remat", False),
        banded_chunk=cfg.get("banded_chunk", 0),
    )


def _build_flow_drow(cfg):
    return FlowDrow(
        dropout=cfg.get("dropout", 0.0),
        alpha=cfg.get("alpha", 0.5),
        window_size=cfg.get("window_size", 7),
        pedestrian_only=cfg.get("pedestrian_only", False),
        freeze_detector=cfg.get("freeze_detector", True),
        remat=cfg.get("remat", False),
        banded_chunk=cfg.get("banded_chunk", 0),
    )


def _build_fc_detector(cfg):
    return PolarGridDetector(
        num_classes=1 if cfg.get("pedestrian_only", False) else 4,
        hidden=cfg.get("hidden", 256),
        dropout=cfg.get("dropout", 0.0),
    )


# model types whose forward carries template state across scans — these
# serve through the streaming engines (bin/export_serving.py), never the
# stateless AOT export (bin/export_model.py); both CLIs gate on this
STREAMING_MODEL_TYPES = ("flow_drow", "dr-spaam", "spatial_drow")

MODEL_REGISTRY = {
    "box_reg": _build_box_reg,
    "flow_unet": _build_flow_unet,
    "prototype": _build_flow_unet,
    "prototype_test": _build_flow_unet_additive,
    "drow": _build_drow,
    "dr-spaam": _build_spatial_drow,
    "spatial_drow": _build_spatial_drow,
    "flow_drow": _build_flow_drow,
    # fc-family detectors (reference fc1d/fc1d_fea/fc2d encodings,
    # dataset_dr_spaam.py:437-460; model was never shipped upstream)
    "fc1d": _build_fc_detector,
    "fc1d_fea": _build_fc_detector,
    "fc2d": _build_fc_detector,
}


def get_model(cfg: dict):
    """Build a model from ``cfg["type"]`` and its hyperparameters."""
    mtype = cfg["type"]
    if mtype not in MODEL_REGISTRY:
        raise NotImplementedError(
            f"unknown model type {mtype!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[mtype](cfg)
