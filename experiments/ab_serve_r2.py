import sys, time
import numpy as np
import jax, jax.numpy as jnp
from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

prec, layout = sys.argv[1], sys.argv[2]
batch, num_pts, iters = 128, 450, 50
cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
                     num_cutout_pts=56, padding_val=29.99, area_mode=True,
                     gather_mode="matmul")
model = FlowDrow(window_size=11, pedestrian_only=True)
x = jnp.zeros((1, num_pts, 1, 56)); cur = jnp.zeros((1, num_pts))
variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
rng = np.random.default_rng(0)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, num_pts)), dtype=jnp.float32)

v3 = make_serve_step_v3(model, variables, cutout_kwargs,
                        calib_scans=np.asarray(scan[:8]), num_pts=num_pts,
                        precision=prec, layout=layout, tile=128)
carry, out = v3(None, scan)
for _ in range(3):
    carry, out = v3(carry, scan)
float(out["pred_cls"][0, 0, 0])
t0 = time.perf_counter()
for _ in range(iters):
    carry, out = v3(carry, scan)
float(out["pred_cls"][0, 0, 0])
dt = (time.perf_counter() - t0) / iters * 1000
print(f"{prec}/{layout}: {dt:.2f} ms -> {batch/dt*1000:.0f} scans/s", flush=True)
