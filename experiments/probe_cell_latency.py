"""Small-batch latency: p2 three-program pipeline vs the serve_cell
mega-kernel (layout="cell").

serve_cell was a measured negative at B=128 (throughput: coarse per-stream
grid serializes VPU attention and MXU head work). At B=1 the step time is
dominated by fixed costs and inter-program idle (~0.5 ms of the 0.87 ms
p50), which ONE program per step would amortize — this probe checks whether
the cell wins the latency end of the curve.

RESULT (v5e, chained timing): NEGATIVE there too — B=1: p2 0.92 ms vs
cell 2.90 ms; B=16: p2 2.49 vs cell 3.42. At B=1 the cell is a single
grid step: zero pipelining of weight DMAs against compute, and the
serialized VPU-attention/MXU-head issue inside one body costs ~3x more
than the inter-program idle it removes. The three-program p2 pipeline
stays the flagship at every batch size.

Run: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/probe_cell_latency.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

NUM_PTS = 450
CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=56, padding_val=29.99, area_mode=True,
           gather_mode="matmul")

model = FlowDrow(window_size=11, pedestrian_only=True)
x = jnp.zeros((1, NUM_PTS, 1, 56))
cur = jnp.zeros((1, NUM_PTS))
variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
rng = np.random.default_rng(0)

for batch in (1, 16):
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, NUM_PTS)), jnp.float32)
    for layout in ("p2", "cell"):
        kw = {} if layout == "cell" else {"tile": 128}
        step = make_serve_step_v3(
            model, variables, CUT,
            calib_scans=np.asarray(scan[: min(batch, 8)]),
            num_pts=NUM_PTS, precision="int8c", layout=layout, **kw,
        )
        carry, out = step(None, scan)
        for _ in range(3):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])

        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "batch": batch, "layout": layout,
            "ms_per_step": round(dt * 1000, 3),
            "scans_per_sec": round(batch / dt, 1),
        }), flush=True)
