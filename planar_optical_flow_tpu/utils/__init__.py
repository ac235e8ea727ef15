"""Run logging, config loading, visualization."""

from planar_optical_flow_tpu.utils.config import load_config  # noqa: F401
from planar_optical_flow_tpu.utils.logger import RunLogger  # noqa: F401
