"""Model zoo: flax modules for every reference model family.

* :class:`FlowUNet`        — planar-flow U-Net with banded correlation cost
  volume (reference ``Prototype``).
* :class:`FlowUNetAdditive`— additive-fusion debug variant
  (reference ``PrototypeTest``).
* :class:`Drow`            — per-cutout conv detector with temporal sum
  fusion (reference ``DROW``).
* :class:`SpatialDrow`     — DR-SPAAM: spatial-attention auto-regressive
  template memory over the scan axis (reference ``SpatialDROW``).
* :class:`FlowDrow`        — frozen SpatialDrow + per-point flow head
  (reference ``FlowDROW_pretrained``).
* :class:`BoundingBoxRegressor` / :class:`PointNet` / :class:`TNet` — lidar
  segment box regression.
"""

from planar_optical_flow_tpu.models.blocks import conv_block, dense_block  # noqa: F401
from planar_optical_flow_tpu.models.flow_unet import (  # noqa: F401
    FlowUNet,
    FlowUNetAdditive,
)
from planar_optical_flow_tpu.models.drow import Drow  # noqa: F401
from planar_optical_flow_tpu.models.spatial_drow import SpatialDrow  # noqa: F401
from planar_optical_flow_tpu.models.flow_drow import FlowDrow  # noqa: F401
from planar_optical_flow_tpu.models.pointnet import (  # noqa: F401
    PointNet,
    TNet,
    BoundingBoxRegressor,
)
from planar_optical_flow_tpu.models.adaboost_detector import (  # noqa: F401
    AdaBoostPersonDetector,
    BoostedSegmentClassifier,
)
from planar_optical_flow_tpu.models.polar_grid_net import PolarGridDetector  # noqa: F401
from planar_optical_flow_tpu.models.registry import get_model, MODEL_REGISTRY  # noqa: F401
