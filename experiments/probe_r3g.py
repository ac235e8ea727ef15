"""Round-3 probe G: full serve-step A/B of the uncommitted variants.

  pm           — shipped baseline (round-2 config; expect ~14.9 ms)
  pm+gps       — per-stream gate kernel (one grid step per stream)
  p2-repack    — pack-2 backbone, layer1 built pm-style then pair-packed
  p2-blend     — pack-2 backbone, layer1 via full-lane where-blends

Each variant is a fresh make_serve_step_v3; compile happens on warmup.
Timing via the carry data-dependency chain + one scalar readback
(bench.py methodology).
"""
import time
import traceback

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

VARIANTS = [
    ("pm", dict(layout="pm")),
    ("pm+gps", dict(layout="pm", gate_per_stream=True)),
    ("p2-repack", dict(layout="p2", p2_l1_mode="repack")),
    ("p2-blend", dict(layout="p2", p2_l1_mode="blend")),
    ("p2-mm", dict(layout="p2", p2_l1_mode="mm")),
    ("p2-mm+gps", dict(layout="p2", p2_l1_mode="mm", gate_per_stream=True)),
]

for name, kw in VARIANTS:
    try:
        step = make_serve_step_v3(
            model, variables, cutout_kwargs, calib_scans=calib,
            num_pts=num_pts, precision="int8c", tile=128, **kw)
        t0 = time.perf_counter()
        carry, out = step(None, scan)
        for _ in range(3):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])
        print(f"[{name}: compiled+warm in {time.perf_counter()-t0:.0f}s]",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name}: {dt:.3f} ms  ({B/dt*1000:.0f} scans/s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)
        traceback.print_exc()
