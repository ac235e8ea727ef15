"""Host-side data layer: file readers, datasets, synthetic generators,
prefetching loaders.

Datasets produce fixed-shape numpy PyTrees (dict batches); all heavy
per-point math (cutouts, targets) happens on device in the ops layer.
"""

from planar_optical_flow_tpu.data.drow_io import (  # noqa: F401
    load_scan_file,
    load_detection_file,
    load_odometry_file,
    load_diff_odometry_file,
    load_flow_file,
    list_sequences,
)
from planar_optical_flow_tpu.data.synthetic import (  # noqa: F401
    make_synthetic_drow_sequence,
    write_synthetic_drow_split,
    make_synthetic_jrdb,
)
from planar_optical_flow_tpu.data.drow_flow import FlowScanPairDataset  # noqa: F401
from planar_optical_flow_tpu.data.drow_detection import DrowDetectionDataset  # noqa: F401
from planar_optical_flow_tpu.data.loader import BatchLoader  # noqa: F401
