"""TPU probe r2g: int8c end-to-end + batch sweep."""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

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

def bench(B, prec, tile):
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (B, num_pts)), jnp.float32)
    try:
        step = make_serve_step_v3(model, variables, cutout_kwargs,
                                  calib_scans=np.asarray(scan[:8]),
                                  num_pts=num_pts, precision=prec,
                                  tile=tile)
        carry, out = step(None, scan)
        for _ in range(3):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            carry, out = step(carry, scan)
        float(out["pred_cls"][0, 0, 0])
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"label": f"v3 {prec} B={B} tile={tile}",
                          "ms": round(dt, 2),
                          "scans_per_s": round(B / dt * 1000, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"label": f"v3 {prec} B={B} tile={tile}",
                          "error": str(e)[:160]}), flush=True)

bench(128, "int8c", 128)
bench(256, "int8c", 128)
bench(192, "int8c", 128)
bench(256, "int8", 128)
