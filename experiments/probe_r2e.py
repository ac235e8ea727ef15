"""TPU probe r2e: full serve_step_v3 end-to-end (bf16 + int8)."""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import (
    make_stream_step, make_serve_step_v3, cast_variables,
)

B = int(os.environ.get("B", "128"))
ITERS = 30
num_pts = 450
KEY = jax.random.PRNGKey(0)
cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                     window_depth=0.5, num_cutout_pts=56, padding_val=29.99,
                     area_mode=True, gather_mode="matmul")
model = FlowDrow(window_size=11, pedestrian_only=True)
x = jnp.zeros((1, num_pts, 1, 56))
cur = jnp.zeros((1, num_pts))
variables = model.init(KEY, x, cur, train=False)
rng = np.random.default_rng(0)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (B, num_pts)), jnp.float32)
calib = np.asarray(scan[:8])


def bench_step(step, label):
    try:
        carry, out = step(None, scan)
        for _ in range(3):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"label": label, "ms": round(dt, 2),
                          "scans_per_s": round(B / dt * 1000, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"label": label, "error": str(e)[:200]}), flush=True)


for prec in ("bf16", "int8"):
    for tile in (64, 128):
        step = make_serve_step_v3(model, variables, cutout_kwargs,
                                  calib_scans=calib, num_pts=num_pts,
                                  precision=prec, tile=tile)
        bench_step(step, f"serve_v3 {prec} tile={tile}")
