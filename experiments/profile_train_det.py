"""jax.profiler trace of the DetectionTask (DR-SPAAM) train step, bf16,
at the dr_spaam.yaml working point (8 x 11 scans). Writes /tmp/det_trace;
summarize with experiments/trace_summary.py."""
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import (create_train_state,
                                           make_optimizer, tasks)
from planar_optical_flow_tpu.train.trainer import Trainer
from planar_optical_flow_tpu.utils.logger import RunLogger

B, T, P, L = 8, 11, 450, 56
rng = np.random.default_rng(0)

CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=L, padding_val=29.99, area_mode=True,
           gather_mode="matmul")
model = get_model({"type": "dr-spaam", "window_size": 11,
                   "pedestrian_only": True})
task = tasks.DetectionTask(cutout_kwargs=CUT, pedestrian_only=True)
batch = {
    "scans": jnp.asarray(rng.uniform(0.5, 25.0, (B, T, P)), jnp.float32),
    "target_cls": jnp.asarray(rng.integers(0, 2, (B, P, 1)), jnp.float32),
    "target_reg": jnp.asarray(rng.normal(size=(B, P, 2)) * 0.1, jnp.float32),
}
tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=100)
x0 = jnp.zeros((1, P, T, L))
state = create_train_state(model, (x0,), tx, init_kwargs={"train": False})

with tempfile.TemporaryDirectory() as td:
    logger = RunLogger({"log_dir": td, "tag": "bench"})
    tr = Trainer(logger, {"epoch": 1, "ckpt_interval": 1000,
                          "compute_dtype": "bfloat16"}, task,
                 install_signal_handlers=False)
    tr._build_steps(state)
    key = jax.random.PRNGKey(0)
    s, tb = tr._train_step(state, batch, key)
    for _ in range(3):
        s, tb = tr._train_step(s, batch, key)
    float(tb["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace("/tmp/det_trace"):
        for _ in range(10):
            s, tb = tr._train_step(s, batch, key)
        float(tb["loss"])
    print(f"traced 10 steps in {(time.perf_counter()-t0)*100:.1f} ms/step",
          flush=True)
