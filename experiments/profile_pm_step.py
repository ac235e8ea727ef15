"""Profile the int8c/pm serve-v3 step: jax.profiler trace at B=128."""
import time
import numpy as np
import jax, jax.numpy as jnp
from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

batch, num_pts = 128, 450
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
                        precision="int8c", layout="p2", tile=128)
carry, out = v3(None, scan)
for _ in range(3):
    carry, out = v3(carry, scan)
float(out["pred_cls"][0, 0, 0])
with jax.profiler.trace("/tmp/pm_trace"):
    for _ in range(10):
        carry, out = v3(carry, scan)
    float(out["pred_cls"][0, 0, 0])
print("trace written")
