"""Pure jnp ops: geometry, cutouts, targets, NMS, rotated IoU, losses.

All functions here are shape-static, branch-free (jnp.where / lax control
flow), differentiable where meaningful, and safe to call under jit/vmap/pjit.
"""

from planar_optical_flow_tpu.ops.geometry import (  # noqa: F401
    get_laser_phi,
    rphi_to_xy,
    xy_to_rphi,
    scan_to_xy,
    global_to_canonical,
    canonical_to_global,
    global_to_canonical_flow,
    canonical_to_global_flow,
    phi_rotation_matrix,
)
from planar_optical_flow_tpu.ops.targets import (  # noqa: F401
    closest_detection,
    regression_targets,
    flow_from_pose_pair,
    displacement_from_odometry,
    velocity_from_odometry,
    dynamic_mask,
    valid_range_mask,
)
from planar_optical_flow_tpu.ops.cutout import scans_to_cutout  # noqa: F401
from planar_optical_flow_tpu.ops.polar_grid import scans_to_polar_grid  # noqa: F401
from planar_optical_flow_tpu.ops.nms import nms_predicted_center  # noqa: F401
from planar_optical_flow_tpu.ops.rotated_iou import (  # noqa: F401
    rotated_iou,
    rotated_iou_3d,
    rotated_iou_paired,
    rotated_iou_3d_paired,
    rotated_iou_sh,
    aabb_iou,
)
from planar_optical_flow_tpu.ops.losses import (  # noqa: F401
    epe_loss,
    epe_aae,
    focal_loss,
    binary_focal_loss,
    box_regression_loss,
    detection_loss,
)
