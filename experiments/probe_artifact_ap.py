"""Real-TPU closure of the artifact-QA loop on a TRAINED detector.

The new evaluation surface (``evaluate_detection_ap_batched(step=...)``
with a loaded AOT engine, the library face of ``bin/evaluate.py
--artifact --ap``) must score the SAME detection AP as the live jitted
int8c step it was exported from — the exported programs are
bit-identical (``experiments/probe_export.py``), so any AP difference
would mean the evaluator treats the two step objects differently.

Usage: PYTHONPATH=/root/repo python experiments/probe_artifact_ap.py
"""
import json
import tempfile

import numpy as np
import jax

from experiments.validate_int8_ap import CUTOUT_KW, train_small_detector
from planar_optical_flow_tpu.eval import evaluate_detection_ap_batched
from planar_optical_flow_tpu.infer import (
    export_serving_engine, load_serving_engine,
)
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3


def main():
    model, variables, frames = train_small_detector()
    calib = frames.scans[:8]
    step = make_serve_step_v3(model, variables, CUTOUT_KW,
                              calib_scans=calib, precision="int8c")
    b = 16
    live = evaluate_detection_ap_batched(None, None, None, frames,
                                         step=step, batch_streams=b)
    print(json.dumps({"path": "live int8c",
                      **{k: round(float(v), 4) for k, v in live.items()}}),
          flush=True)

    out = tempfile.mkdtemp()
    export_serving_engine(
        out, step,
        jax.ShapeDtypeStruct((b, frames.scans.shape[1]), np.float32),
        meta={"engine": "int8c"})
    engine = load_serving_engine(out)
    art = evaluate_detection_ap_batched(None, None, None, frames,
                                        step=engine, batch_streams=b)
    print(json.dumps({"path": "AOT artifact",
                      **{k: round(float(v), 4) for k, v in art.items()}}),
          flush=True)
    assert art["ap"] == live["ap"], (art, live)
    assert art["peak_f1"] == live["peak_f1"], (art, live)
    print("ARTIFACT AP GATE PASSED")


if __name__ == "__main__":
    main()
