"""TPU probe: make_serve_step (banded gate + z-carry) vs make_stream_step.

Timing per memory/axon-tpu-env: chained carry dependency + scalar readback.
"""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import (
    make_stream_step, make_serve_step, cast_variables,
)

batch = int(os.environ.get("B", "128"))
iters = int(os.environ.get("ITERS", "30"))
num_pts = 450
cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                     window_depth=0.5, num_cutout_pts=56, padding_val=29.99,
                     area_mode=True, gather_mode="matmul")

model = FlowDrow(window_size=11, pedestrian_only=True)
x = jnp.zeros((1, num_pts, 1, 56))
cur = jnp.zeros((1, num_pts))
variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
rng = np.random.default_rng(0)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, num_pts)), jnp.float32)

def bench(step, carry0, label):
    carry, out = step(carry0, scan)
    for _ in range(3):
        carry, out = step(carry, scan)
    float(out["pred_cls"][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = step(carry, scan)
    float(out["pred_cls"][0, 0, 0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"label": label, "ms": round(dt, 2),
                      "scans_per_s": round(batch / dt * 1000, 1)}), flush=True)

# baseline: current bf16 stream step
bf16_vars = cast_variables(variables, jnp.bfloat16)
base = make_stream_step(model, cutout_kwargs, num_pts=num_pts,
                        donate_template=True, compute_dtype=jnp.bfloat16)
bench(lambda c, s: base(bf16_vars, c, s), None, "stream_step bf16 (r1 best)")

for mix in ("xla", "pallas"):
    step = make_serve_step(model, variables, cutout_kwargs, num_pts=num_pts,
                           compute_dtype=jnp.bfloat16, gate_mix=mix)
    bench(step, None, f"serve_step bf16 gate={mix}")
