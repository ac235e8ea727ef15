"""FlowDROW train-step latency: f32 vs bf16 mixed precision (remat) vs the
fused-frozen-detector task (serving kernels inside the train step), the
round-1 BASELINE.md workload (batch 8 x 11 scans x 450 pts)."""
import tempfile, time
import numpy as np
import jax, jax.numpy as jnp
from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import create_train_state, make_optimizer, tasks
from planar_optical_flow_tpu.train.trainer import Trainer
from planar_optical_flow_tpu.utils.logger import RunLogger

B, T, P = 8, 11, 450
model = get_model({"type": "flow_drow", "window_size": 11,
                   "pedestrian_only": True, "remat": True})
rng = np.random.default_rng(0)

CUT = dict(
    fixed=True, centered=True, window_width=1.0, window_depth=0.5,
    num_cutout_pts=56, padding_val=29.99, area_mode=True,
    gather_mode="matmul")
task = tasks.FlowDrowTask(cutout_kwargs=CUT)
fused_task = tasks.FlowDrowFusedTask.for_model(model, cutout_kwargs=CUT)
batch = {
    "scans": jnp.asarray(rng.uniform(0.5, 25.0, (B, T, P)), jnp.float32),
    "target_flow": jnp.asarray(rng.normal(size=(B, P, 2)) * 0.1, jnp.float32),
    "exclude_mask": jnp.zeros((B, P), bool),
}
tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=100)
x0 = jnp.zeros((1, P, 1, 56)); cur0 = jnp.zeros((1, P))

for cd, tk in ((None, task), ("bfloat16", task), ("fused", fused_task)):
    state = create_train_state(model, (x0, cur0), tx,
                               init_kwargs={"train": False})
    with tempfile.TemporaryDirectory() as td:
        logger = RunLogger({"log_dir": td, "tag": "bench"})
        cfg = {"epoch": 1, "ckpt_interval": 1000}
        if cd and cd != "fused":
            cfg["compute_dtype"] = cd
        tr = Trainer(logger, cfg, tk,
                     install_signal_handlers=False)
        tr._build_steps(state)
        key = jax.random.PRNGKey(0)
        state2, _ = tr._train_step(state, batch, key)
        for _ in range(3):
            state2, tb = tr._train_step(state2, batch, key)
        float(tb["loss"])  # hard sync (this backend's block_until_ready
        # is lazy; the loss readback rides the donated-state dep chain)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            state2, tb = tr._train_step(state2, batch, key)
        float(tb["loss"])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"compute_dtype={cd}: {dt:.1f} ms/step "
              f"({B * 1000 / dt:.0f} samples/s)", flush=True)
