"""DR-SPAAM detector pretraining step latency (stage-1 of the workflow):
full DetectionTask train step vs the cutout encode alone, f32, batch
8 x 11 scans x 450 pts x 56 cutout pts (the dr_spaam.yaml working point).
Quantifies how much of the step the XLA cutout encode costs — the
serving side replaced it with a Pallas kernel; training still runs the
one-hot-matmul XLA path.

Measured (TPU v5e, 1 chip, 2026-08-17): full step 109.6 ms f32 /
109.4 ms bf16 (73 samples/s); cutout encode alone 7.8 ms. bf16 is
neutral at step level even though the isolated components speed up
(probe_train_ablate.py) — see that probe for the decomposition."""
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
                   "pedestrian_only": True, "num_scans": T})
task = tasks.DetectionTask(cutout_kwargs=CUT, pedestrian_only=True)
batch = {
    "scans": jnp.asarray(rng.uniform(0.5, 25.0, (B, T, P)), jnp.float32),
    "target_cls": jnp.asarray(
        rng.integers(0, 2, (B, P, 1)), jnp.float32),
    "target_reg": jnp.asarray(rng.normal(size=(B, P, 2)) * 0.1,
                              jnp.float32),
}
tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=100)
x0 = jnp.zeros((1, P, T, L))
state = create_train_state(model, (x0,), tx, init_kwargs={"train": False})

with tempfile.TemporaryDirectory() as td:
    logger = RunLogger({"log_dir": td, "tag": "bench"})
    tr = Trainer(logger, {"epoch": 1, "ckpt_interval": 1000}, task,
                 install_signal_handlers=False)
    tr._build_steps(state)
    key = jax.random.PRNGKey(0)

    s, tb = tr._train_step(state, batch, key)
    float(tb["loss"])
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        s, tb = tr._train_step(s, batch, key)
    float(tb["loss"])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"DetectionTask train step: {dt:.2f} ms "
          f"({B * 1000 / dt:.0f} samples/s)", flush=True)

# encode alone (same jit boundary)
enc = jax.jit(lambda sc: task._encode(sc))
o = enc(batch["scans"])
np.asarray(o[:1, :1, :1, :1])
t0 = time.perf_counter()
n = 50
for _ in range(n):
    o = enc(batch["scans"])
np.asarray(o[:1, :1, :1, :1])
dt = (time.perf_counter() - t0) / n * 1000
print(f"cutout encode alone (XLA matmul mode, {B}x{T} scans): "
      f"{dt:.2f} ms", flush=True)

# bf16 mixed-precision variant (the Trainer's compute_dtype knob) at the
# reference batch and at larger TPU-friendly batches (fixed per-step costs
# amortize; the conv efficiency rises with more rows)
for b_sz in (8, 32, 64):
    bb = {
        "scans": jnp.asarray(rng.uniform(0.5, 25.0, (b_sz, T, P)),
                             jnp.float32),
        "target_cls": jnp.asarray(
            rng.integers(0, 2, (b_sz, P, 1)), jnp.float32),
        "target_reg": jnp.asarray(rng.normal(size=(b_sz, P, 2)) * 0.1,
                                  jnp.float32),
    }
    state = create_train_state(model, (x0,), tx,
                               init_kwargs={"train": False})
    with tempfile.TemporaryDirectory() as td:
        logger = RunLogger({"log_dir": td, "tag": "bench"})
        tr = Trainer(logger, {"epoch": 1, "ckpt_interval": 1000,
                              "compute_dtype": "bfloat16"}, task,
                     install_signal_handlers=False)
        tr._build_steps(state)
        key = jax.random.PRNGKey(0)
        s, tb = tr._train_step(state, bb, key)
        float(tb["loss"])
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            s, tb = tr._train_step(s, bb, key)
        float(tb["loss"])
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"DetectionTask train step bf16 B={b_sz}: {dt:.2f} ms "
              f"({b_sz * 1000 / dt:.0f} samples/s)", flush=True)
