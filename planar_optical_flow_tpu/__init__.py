"""planar_optical_flow_tpu — a TPU-native JAX framework for planar optical flow
estimation and person detection from 2D lidar range scans.

This is a ground-up TPU-first rebuild of the capabilities of the PyTorch
reference ``huzjkevin/planar_optical_flow``:

* planar flow from scan pairs (1-D conv U-Net with a banded correlation cost
  volume, cf. reference ``src/depracted/model/prototype.py``),
* person detection on 2D lidar (DROW / DR-SPAAM spatial-attention temporal
  memory, cf. ``src/depracted/model/dr_spaam.py``),
* joint detection + per-point flow (``FlowDROW``),
* 2D/3D bounding-box regression with a rotated-IoU metric
  (cf. ``src/model/box_regression.py``, ``src/utils/rotate_iou.py``).

Design stance: functional core, explicit state, everything jittable
end-to-end; batched device ops instead of per-sample host loops; `lax.scan`
for temporal recursion; `jax.sharding.Mesh` + jit for multi-chip scaling.
"""

__version__ = "0.1.0"
