"""A/B the DR-SPAAM detection train step with lax convs vs matmul-form
convs (models.blocks impl="taps"; identical params/math).

Motivation: the 58 ms bf16 step spends 23.1 ms in convs at ~45% of the
bf16 MXU bound (STATUS.md round-3 trace); the serving kernels showed the
tap-concat matmul form beats XLA's conv lowering for these skinny
K<=768 shapes. "taps" keeps plain differentiable XLA — no custom vjp.

Run: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/probe_train_conv.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.models.blocks import set_default_conv_impl
from planar_optical_flow_tpu.train import (
    create_train_state, make_optimizer, tasks,
)

B, S, P = 8, 11, 450
CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=56, padding_val=29.99, area_mode=True,
           gather_mode="matmul")

rng = np.random.default_rng(0)
batch = {
    "scans": jnp.asarray(rng.uniform(0.5, 25.0, (B, S, P)), jnp.float32),
    "target_cls": jnp.asarray(
        rng.integers(0, 2, (B, P, 1)), jnp.float32),
    "target_reg": jnp.asarray(
        rng.normal(0, 0.3, (B, P, 2)), jnp.float32),
}
task = tasks.DetectionTask(cutout_kwargs=CUT, pedestrian_only=True)

for impl in ("mm3", "conv"):
    set_default_conv_impl(impl)
    model = get_model({"type": "dr-spaam", "window_size": 11,
                       "pedestrian_only": True, "remat": True})
    x0 = jnp.zeros((1, P, 1, 56))
    tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=100)
    state = create_train_state(model, (x0,), tx,
                               init_kwargs={"train": False})

    def train_step(state, batch, rng_key, _task=task):
        def loss_fn(params):
            p16 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            bs16 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                state.batch_stats)
            loss, tb, _, stats = _task.loss(
                state.apply_fn, {"params": p16, "batch_stats": bs16},
                batch, True, rng_key)
            stats = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, stats)
            return loss.astype(jnp.float32), stats

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, stats), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    state, loss = step(state, batch, key)
    for _ in range(3):
        state, loss = step(state, batch, key)
    print(impl, "warm loss", float(loss), flush=True)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch, key)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"{impl}: {dt * 1000:.2f} ms/step "
          f"({B / dt:.1f} samples/s)", flush=True)
