"""Fused frozen-detector FlowDROW training path (train/fused_frozen.py):
the serving-kernel forward must match the flax module (bf16 tolerance),
gradients must reach ONLY the flow head, and the loss must train."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.train import tasks
from planar_optical_flow_tpu.train.fused_frozen import (
    frozen_detector_forward,
)

NUM_PTS = 64
CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=16, padding_val=29.99, area_mode=True,
           gather_mode="matmul")


def _setup(s_scans=3, b=2):
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, NUM_PTS, 1, 16))
    cur = jnp.zeros((1, NUM_PTS))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    rng = np.random.default_rng(3)
    scans = jnp.asarray(rng.uniform(0.5, 20.0, (b, s_scans, NUM_PTS)),
                        jnp.float32)
    return model, variables, scans


def _module_forward(model, variables, scans, task):
    cutouts = task._encode(scans)
    return model.apply(variables, cutouts, scans[:, -1], train=False)


def test_frozen_forward_matches_module():
    model, variables, scans = _setup()
    task = tasks.FlowDrowTask(cutout_kwargs=CUT, pedestrian_only=True,
                              num_pts=NUM_PTS)
    ref_cls, ref_reg, _ = _module_forward(model, variables, scans, task)

    det_vars = {"params": variables["params"]["dr_spaam"],
                "batch_stats": variables["batch_stats"]["dr_spaam"]}
    cls, reg, sim = frozen_detector_forward(
        det_vars, scans, alpha=0.5, window_size=5, num_classes=1,
        num_pts=NUM_PTS, ct_len=16, window_width=1.0, window_depth=0.5,
        area_mode=True, tile=16, interpret=True)

    for a, b_ in ((cls, ref_cls), (reg, ref_reg)):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        corr = np.corrcoef(a.ravel(), b_.ravel())[0, 1]
        assert corr > 0.99, corr
        assert np.abs(a - b_).max() < 0.05 * max(np.abs(b_).max(), 1.0)
    assert sim.shape == (2, NUM_PTS, 5)


def test_fused_task_grads_only_flow_head():
    model, variables, scans = _setup()
    task = tasks.FlowDrowFusedTask(cutout_kwargs=CUT, pedestrian_only=True,
                                   num_pts=NUM_PTS, alpha=0.5,
                                   window_size=5, interpret=True)
    rng = np.random.default_rng(4)
    batch = {
        "scans": scans,
        "target_flow": jnp.asarray(
            rng.normal(0, 0.1, (2, NUM_PTS, 2)), jnp.float32),
        "exclude_mask": jnp.ones((2, NUM_PTS), bool),
    }

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        loss, tb, rtn, new_stats = task.loss(
            model.apply, v, batch, True, jax.random.PRNGKey(0))
        return loss, (tb, new_stats)

    (loss, (tb, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    # detector grads identically zero; flow-head grads nonzero
    det_norm = sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree_util.tree_leaves(grads["dr_spaam"]))
    flow_norm = sum(float(jnp.sum(jnp.abs(g))) for g in
                    jax.tree_util.tree_leaves(
                        {k: v for k, v in grads.items()
                         if k != "dr_spaam"}))
    assert det_norm == 0.0
    assert flow_norm > 0.0
    # batch-stats merge keeps the full tree (incl. the frozen detector)
    assert set(new_stats.keys()) == set(variables["batch_stats"].keys())


@pytest.mark.slow
def test_fused_task_loss_decreases():
    import optax

    model, variables, scans = _setup(s_scans=3, b=4)
    task = tasks.FlowDrowFusedTask(cutout_kwargs=CUT, pedestrian_only=True,
                                   num_pts=NUM_PTS, alpha=0.5,
                                   window_size=5, interpret=True)
    rng = np.random.default_rng(5)
    scans = jnp.asarray(rng.uniform(0.5, 20.0, (4, 3, NUM_PTS)), jnp.float32)
    batch = {
        "scans": scans,
        "target_flow": jnp.asarray(
            rng.normal(0, 0.1, (4, NUM_PTS, 2)), jnp.float32),
        "exclude_mask": jnp.ones((4, NUM_PTS), bool),
    }
    tx = optax.adam(1e-3)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = tx.init(params)

    def step(params, stats, opt_state):
        def loss_fn(p):
            loss, _, _, new_stats = task.loss(
                model.apply, {"params": p, "batch_stats": stats},
                batch, True, jax.random.PRNGKey(0))
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, \
            opt_state, float(loss)

    losses = []
    for _ in range(8):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(loss)
    assert losses[-1] < losses[0], losses
