"""Timing: batched detection-AP eval over 10k synthetic frames (VERDICT #6
done criterion: seconds, not minutes) and the serve sequence processor vs
the step API at T=100 (VERDICT #9: scan path >= step API)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.eval.evaluator import (
    DetectionEvalFrames, evaluate_detection_ap_batched,
)
from planar_optical_flow_tpu.infer.streaming import (
    make_serve_step_v3, make_serve_sequence_processor,
)

num_pts = 450
CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=56, padding_val=29.99, area_mode=True,
           gather_mode="matmul")
model = FlowDrow(window_size=11, pedestrian_only=True)
x = jnp.zeros((1, num_pts, 1, 56)); cur = jnp.zeros((1, num_pts))
variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
rng = np.random.default_rng(0)

# ---- batched AP over 10k frames (untrained net: AP value meaningless,
# timing is the point)
T = 10000
scans = rng.uniform(0.5, 25.0, (T, num_pts)).astype(np.float32)
gt = [rng.uniform(-5, 5, (2, 2)).astype(np.float32) for _ in range(T)]
frames = DetectionEvalFrames(scans, gt)
# steady-state pattern: build the serving step ONCE and pass it in —
# per-call step construction (re-trace + int8c self-recalibration) costs
# ~30-40 s/call on the remote chip and is one-time work
eval_step = make_serve_step_v3(model, variables, CUT, num_pts=num_pts,
                               precision="int8c", calib_scans=scans[:8])
t0 = time.perf_counter()
res = evaluate_detection_ap_batched(model, variables, CUT, frames,
                                    batch_streams=128, step=eval_step)
dt = time.perf_counter() - t0
t0 = time.perf_counter()
res = evaluate_detection_ap_batched(model, variables, CUT, frames,
                                    batch_streams=128, step=eval_step)
dt2 = time.perf_counter() - t0
print(f"batched AP over {T} frames [int8c, cached step]: cold {dt:.1f} s, "
      f"warm {dt2:.1f} s ({T/dt2:.0f} frames/s), ap={res['ap']:.3f}",
      flush=True)

# ---- sequence processor vs step API, T=100 @ B=128
B, TT = 128, 100
scans_seq = jnp.asarray(rng.uniform(0.5, 25.0, (TT, B, num_pts)), jnp.float32)
calib = np.asarray(scans_seq[0][:8])

step = make_serve_step_v3(model, variables, CUT, calib_scans=calib,
                          num_pts=num_pts, precision="int8c")
carry, out = step(None, scans_seq[0])
carry, out = step(carry, scans_seq[1])
float(out["pred_cls"][0, 0, 0])
t0 = time.perf_counter()
for t in range(TT):
    carry, out = step(carry, scans_seq[t])
float(out["pred_cls"][0, 0, 0])
dt_step = time.perf_counter() - t0
print(f"step API: {B*TT/dt_step:.0f} scans/s", flush=True)

proc = make_serve_sequence_processor(
    model, variables, CUT, output_fields=("pred_cls", "pred_reg"),
    calib_scans=calib, num_pts=num_pts, precision="int8c")
carry2, outs = proc(scans_seq[:2])  # compile boot+carry
carry2, outs = proc(scans_seq, carry2)
float(outs["pred_cls"][-1, 0, 0, 0])
t0 = time.perf_counter()
carry2, outs = proc(scans_seq, carry2)
float(outs["pred_cls"][-1, 0, 0, 0])
dt_seq = time.perf_counter() - t0
print(f"sequence processor: {B*TT/dt_seq:.0f} scans/s "
      f"({dt_seq/dt_step:.2f}x step time)", flush=True)
