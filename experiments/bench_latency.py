"""Serving latency curve: per-step latency and throughput of the flagship
int8c serve-v3 step across stream counts (B=1..256).

The headline bench (bench.py) reports throughput at B=128; the BASELINE
target also asks for per-scan p50 latency. A robot streams ONE scan at a
time, so the B=1 row is the deployment latency floor (includes the
~0.8 ms relay dispatch gap; on a local chip it would be lower).

Run on the TPU: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/bench_latency.py
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

results = []
for batch in (1, 2, 4, 8, 16, 32, 64, 128, 256):
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, NUM_PTS)), jnp.float32)
    step = make_serve_step_v3(
        model, variables, CUT, calib_scans=np.asarray(scan[: min(batch, 8)]),
        num_pts=NUM_PTS, precision="int8c", tile=128, layout="p2",
    )
    carry, out = step(None, scan)
    for _ in range(3):
        carry, out = step(carry, scan)
    float(out["pred_cls"][0, 0, 0])  # sync

    iters = 50
    lat = []
    t0 = time.perf_counter()
    for _ in range(iters):
        t_s = time.perf_counter()
        carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])  # per-step sync for p50 latency
        lat.append(time.perf_counter() - t_s)
    # throughput run: chained (no per-step readback), honest via carry dep
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = step(carry, scan)
    float(out["pred_cls"][0, 0, 0])
    dt = time.perf_counter() - t0
    row = {
        "batch": batch,
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000.0, 3),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1000.0, 3),
        "chained_ms": round(dt / iters * 1000.0, 3),
        "scans_per_sec": round(batch * iters / dt, 1),
    }
    results.append(row)
    print(json.dumps(row), flush=True)

print(json.dumps({"table": results}))
