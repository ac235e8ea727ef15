"""Detector-pretraining throughput vs batch size (bf16 DetectionTask,
11 scans x 450 pts). The reference's working point is batch 8 (dr_spaam
.yaml); on a v5e chip the step is activation-bandwidth bound, so larger
batches amortize fixed per-step costs and fill the MXU better. Reported
next to the B=8 headline in BASELINE.md.

Run: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/probe_train_batch_scaling.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import (create_train_state,
                                           make_optimizer, tasks)

T, P, L = 11, 450, 56
CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=L, padding_val=29.99, area_mode=True,
           gather_mode="matmul")
task = tasks.DetectionTask(cutout_kwargs=CUT, pedestrian_only=True)
rng = np.random.default_rng(0)


def bf16(t):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)


for B in (8, 16, 32, 64):
    model = get_model({"type": "dr-spaam", "window_size": 11,
                       "pedestrian_only": True, "remat": True})
    x0 = jnp.zeros((1, P, 1, L))
    tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=100)
    state = create_train_state(model, (x0,), tx,
                               init_kwargs={"train": False})
    batch = {
        "scans": jnp.asarray(rng.uniform(0.5, 25.0, (B, T, P)), jnp.float32),
        "target_cls": jnp.asarray(rng.integers(0, 2, (B, P, 1)), jnp.float32),
        "target_reg": jnp.asarray(rng.normal(size=(B, P, 2)) * 0.1,
                                  jnp.float32),
    }

    def train_step(state, batch, key):
        def loss_fn(params):
            loss, tb, _, stats = task.loss(
                state.apply_fn,
                {"params": bf16(params),
                 "batch_stats": bf16(state.batch_stats)},
                batch, True, key)
            stats = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, stats)
            return loss.astype(jnp.float32), stats

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, stats), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    for _ in range(4):
        state, loss = step(state, batch, key)
    float(loss)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch, key)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"B={B:3d}: {dt * 1e3:7.2f} ms/step  {B / dt:7.1f} samples/s",
          flush=True)
