"""Inference APIs: stateful streaming detection+flow, batch offline
inference, box regression."""

from planar_optical_flow_tpu.infer.streaming import (  # noqa: F401
    make_stream_step,
    make_fused_stream_step,
    make_sequence_processor,
    make_serve_step_v3,
    make_serve_sequence_processor,
    cast_variables,
    merge_stream_carries,
    StreamingRunner,
)
from planar_optical_flow_tpu.infer.box_regressor import BoxRegressor  # noqa: F401
from planar_optical_flow_tpu.infer.calibration import (  # noqa: F401
    ServeCalibration,
    calibrate_serve_v3,
)
from planar_optical_flow_tpu.infer.export import (  # noqa: F401
    export_serving_engine,
    load_serving_engine,
    export_model,
    load_model,
)
