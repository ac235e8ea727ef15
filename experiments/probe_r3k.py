"""Round-3 probe K: pm_tile granularity sweep on the shipping p2 step.

All candidates keep the same padded cutout count (450 -> 480), so the
work is identical — only the Pallas grid granularity changes:

  pm_tile=96   five blocks/stream  (finer grid: more DMA overlap,
                                    more per-step overhead)
  pm_tile=160  three blocks/stream (shipping default, probe_r2l-era)
  pm_tile=480  one block/stream    (coarsest; serve_cell-adjacent)

Timing via the carry data-dependency chain + one scalar readback
(bench.py methodology), B=128, 30 iters.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

B, num_pts, iters = 128, 450, 30
cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                     window_depth=0.5, num_cutout_pts=56,
                     padding_val=29.99, area_mode=True,
                     gather_mode="matmul")

model = FlowDrow(window_size=11, pedestrian_only=True)
x = jnp.zeros((1, num_pts, 1, 56))
cur = jnp.zeros((1, num_pts))
variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
rng = np.random.default_rng(0)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (B, num_pts)), jnp.float32)
calib = np.asarray(scan[:8])

for tile in (96, 160, 480):
    step = make_serve_step_v3(
        model, variables, cutout_kwargs, calib_scans=calib,
        num_pts=num_pts, precision="int8c", layout="p2", pm_tile=tile,
    )
    carry, out = step(None, scan)
    for _ in range(3):
        carry, out = step(carry, scan)
    float(out["pred_cls"][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = step(carry, scan)
    float(out["pred_cls"][0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"pm_tile={tile:4d}: {dt * 1e3:6.2f} ms/step "
          f"({B / dt:,.0f} scans/s)")
