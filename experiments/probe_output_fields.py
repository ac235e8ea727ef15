"""Probe: does dropping un-requested serving outputs buy real step time?

Round-3 trace attributed ~0.25 ms of the 12.5 ms step to the NMS
instance assignment + output epilogues (VERDICT r3 follow-up #8). With
``make_serve_step_v3(output_fields=...)`` XLA DCEs whatever only feeds
dropped fields, so callers that don't read ``instance_mask`` (or only
read detections, like the AP evaluator) should get the time back.

Run on the real chip: ``python experiments/probe_output_fields.py``.
"""

import time

import numpy as np

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import CUTOUT_KWARGS, NUM_PTS, flagship_model  # noqa: E402


def timed(step, scan, iters=50):
    import jax.numpy as jnp  # noqa: F401

    carry, out = step(None, scan)
    for _ in range(3):
        carry, out = step(carry, scan)
    first = next(iter(out.values()))
    float(np.asarray(first).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = step(carry, scan)
    first = next(iter(out.values()))
    float(np.asarray(first).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax.numpy as jnp

    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    model, variables = flagship_model()
    batch = 128
    rng = np.random.default_rng(0)
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, NUM_PTS)),
                       jnp.float32)
    common = dict(calib_scans=np.asarray(scan[:8]), num_pts=NUM_PTS,
                  precision="int8c", tile=128, layout="p2")

    variants = [
        ("full contract (7 outputs)", None),
        ("drop instance_mask", ("pred_cls", "pred_reg", "pred_flow",
                                "det_xys", "det_cls", "det_keep")),
        ("serving consumer (flow+dets)", ("pred_flow", "det_xys",
                                          "det_cls", "det_keep")),
        ("AP evaluator (dets only)", ("det_xys", "det_cls", "det_keep")),
    ]
    for name, fields in variants:
        step = make_serve_step_v3(model, variables, CUTOUT_KWARGS,
                                  output_fields=fields, **common)
        ms = timed(step, scan)
        print(f"{name:34s} {ms:6.2f} ms  "
              f"{batch / ms * 1000:,.0f} scans/s")


if __name__ == "__main__":
    main()
