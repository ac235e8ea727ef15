"""Attribute the wall-vs-device gap of the v3 serving step.

The headline bench (B=128, int8c/p2) measures ~12.3 ms wall per step while
the device trace sums ~11.7 ms. Two hypotheses:
  (a) host-bound: per-call dispatch through the axon relay (argument/output
      buffer bookkeeping) exceeds device time, so the device idles between
      steps;
  (b) device-bound: the trace undercounts (gaps between programs on device).

Method: time three loops on the same compiled step
  1. full loop + trailing readback (the bench's method)  -> wall/step
  2. dispatch-only loop (time until the LAST dispatch returns, then sync
     OUTSIDE the timed region)                            -> host cost/step
  3. full loop with fewer outputs (with_nms=False, drop the 4 NMS arrays)
     -> does output count move the wall?

If (2) ~= (1), the host is the bottleneck and output-count reduction (3)
should show a proportional win.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3


def bench_loop(step, scan, iters=50):
    template, out = step(None, scan)
    for _ in range(3):
        template, out = step(template, scan)
    jax.block_until_ready(out)

    # 1. full loop + trailing readback
    t0 = time.perf_counter()
    for _ in range(iters):
        template, out = step(template, scan)
    jax.block_until_ready(out)
    full = (time.perf_counter() - t0) / iters * 1e3

    # 2. dispatch-only: time the enqueues; sync outside the timed region
    t0 = time.perf_counter()
    for _ in range(iters):
        template, out = step(template, scan)
    dispatch = (time.perf_counter() - t0) / iters * 1e3
    jax.block_until_ready(out)
    return full, dispatch


def main():
    batch = int(os.environ.get("B", "128"))
    num_pts = 450
    cutout_kwargs = dict(
        fixed=True, centered=True, window_width=1.0, window_depth=0.5,
        num_cutout_pts=56, padding_val=29.99, area_mode=True,
        gather_mode="matmul",
    )
    model = FlowDrow(window_size=11, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 56))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    rng = np.random.default_rng(0)
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, num_pts)), jnp.float32)

    for tag, kw in [
        ("nms-top64 (bench)", dict(with_nms=True, nms_top_k=64)),
        ("no-nms (4 fewer outputs)", dict(with_nms=False)),
    ]:
        step = make_serve_step_v3(
            model, variables, cutout_kwargs, calib_scans=np.asarray(scan[:8]),
            num_pts=num_pts, precision="int8c", tile=128, layout="p2", **kw,
        )
        full, dispatch = bench_loop(step, scan)
        print(f"{tag:28s} full {full:6.2f} ms/step   "
              f"dispatch-only {dispatch:6.2f} ms/step")


if __name__ == "__main__":
    main()
