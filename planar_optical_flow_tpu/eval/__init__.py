"""Evaluation: flow metrics, detection PR/AP, box-regression IoU eval,
analytic baselines."""

from planar_optical_flow_tpu.eval.detection_ap import (  # noqa: F401
    match_detections,
    precision_recall_curve,
    average_precision,
    peak_f1,
    eer,
)
from planar_optical_flow_tpu.eval.evaluator import (  # noqa: F401
    evaluate_flow,
    evaluate_flow_serving,
    evaluate_detection_ap,
    evaluate_detection_ap_batched,
    DetectionEvalFrames,
    evaluate_box_regression,
)
from planar_optical_flow_tpu.eval.baseline import mean_box_baseline  # noqa: F401
