"""Workflow tests: pretrained-backbone grafting (FlowDROW), box-regression
training loop, config normalization, detection pipeline overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from planar_optical_flow_tpu.models import SpatialDrow, FlowDrow, get_model
from planar_optical_flow_tpu.train import (
    create_train_state, make_optimizer, tasks,
)
from planar_optical_flow_tpu.train.state import load_pretrained_subtree
from planar_optical_flow_tpu.pipeline import normalize_config

KEY = jax.random.PRNGKey(0)


def test_load_pretrained_subtree_grafts_detector():
    """The FlowDROW workflow: train a SpatialDrow, graft its weights into
    FlowDrow's frozen detector (reference loads ./pre_trained_ckpts/...,
    dr_spaam.py:294-298)."""
    det = SpatialDrow(window_size=5, pedestrian_only=True)
    x = jnp.ones((1, 45, 2, 16)) * 0.3
    det_vars = det.init(KEY, x, train=False)

    joint = FlowDrow(window_size=5, pedestrian_only=True)
    cur = jnp.ones((1, 45))
    tx = optax.identity()
    state = create_train_state(joint, (x, cur), tx,
                               init_kwargs={"train": False})
    state = load_pretrained_subtree(
        state, "dr_spaam", det_vars["params"], det_vars["batch_stats"]
    )

    # detector outputs of the grafted joint model == standalone detector
    cls_d, reg_d, _ = det.apply(det_vars, x, train=False)
    cls_j, reg_j, _ = joint.apply(state.variables, x, cur, train=False)
    np.testing.assert_allclose(np.asarray(cls_j), np.asarray(cls_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(reg_j), np.asarray(reg_d),
                               rtol=1e-5, atol=1e-6)


def test_box_regression_training_and_metrics(rng):
    """Box-reg task: loss decreases on a fixed batch; eval metrics include a
    batched max-IoU vs padded neighbors."""
    model = get_model({"type": "box_reg", "input_dim": 4, "target_dim": 5,
                       "dropout": 0.0})
    task = tasks.BoxRegressionTask(is_3d=True)
    B, N = 16, 32
    batch = {
        "input": rng.normal(size=(B, N, 4)).astype(np.float32),
        "target": rng.normal(size=(B, 5)).astype(np.float32) * 0.3 + 0.8,
        "det_center": rng.normal(size=(B, 3)).astype(np.float32),
        "rot_z": rng.normal(size=(B,)).astype(np.float32) * 0.3,
        "target_neighbor": np.tile(
            np.array([0, 0, 0, 1.0, 0.8, 1.7, 0.2], np.float32), (B, 4, 1)
        ),
        "target_neighbor_valid": np.ones((B, 4), bool),
    }
    tx = make_optimizer(
        {"scheduler_kwargs": {"epoch0": 0, "lr0": 1e-3, "epoch1": 10,
                              "lr1": 1e-3}}, steps_per_epoch=1,
    )
    state = create_train_state(model, (jnp.zeros((B, N, 4)),), tx,
                               init_kwargs={"train": False})

    @jax.jit
    def step(state, batch, rng_key):
        def loss_fn(params):
            loss, _, _, stats = task.loss(
                state.apply_fn,
                {"params": params, "batch_stats": state.batch_stats},
                batch, True, rng_key,
            )
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, stats), loss

    losses = []
    k = KEY
    for _ in range(60):
        k, sk = jax.random.split(k)
        state, loss = step(state, batch, sk)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]

    metrics, _ = jax.jit(
        lambda st, b: task.metrics(st.apply_fn, st.variables, b)
    )(state, batch)
    for key in ("iou", "loss_z", "loss_dim", "loss_ori"):
        assert key in metrics
    assert 0.0 <= float(metrics["iou"]) <= 1.0


def test_normalize_config_flat_to_nested():
    flat = {
        "epochs": 7, "batch_size": 3, "num_scans": 4,
        "pedestrian_only": True, "network": "cutout_spatial",
        "similarity_kwargs": {"alpha": 0.4, "window_size": 9},
        "cutout_kwargs": {"num_cutout_pts": 24},
        "grad_norm_clip": 1.5,
    }
    cfg = normalize_config(flat)
    assert cfg["pipeline"]["Trainer"]["epoch"] == 7
    assert cfg["dataloader"]["batch_size"] == 3
    assert cfg["model"]["type"] == "flow_drow"
    assert cfg["model"]["window_size"] == 9
    assert cfg["dataset"]["cutout_kwargs"]["num_cutout_pts"] == 24
    # nested config passes through untouched
    assert normalize_config(cfg) is cfg


@pytest.mark.slow
def test_detection_task_loss_decreases_on_fixed_batch(rng):
    """Overfit check for the detection path with on-device cutouts."""
    model = get_model({"type": "dr-spaam", "window_size": 5,
                       "pedestrian_only": True})
    task = tasks.DetectionTask(
        cutout_kwargs=dict(fixed=True, centered=True, window_width=1.0,
                           window_depth=0.5, num_cutout_pts=16,
                           padding_val=29.99, area_mode=False),
        pedestrian_only=True,
    )
    B, S, P = 2, 3, 450
    scans = rng.uniform(1.0, 10.0, (B, S, P)).astype(np.float32)
    cls = (rng.uniform(size=(B, P)) > 0.9).astype(np.int32)
    batch = {
        "scans": scans,
        "target_cls": cls,
        "target_reg": rng.normal(size=(B, P, 2)).astype(np.float32) * 0.1,
    }
    x = jnp.zeros((B, P, S, 16))
    tx = make_optimizer(
        {"scheduler_kwargs": {"epoch0": 0, "lr0": 3e-4, "epoch1": 10,
                              "lr1": 3e-4}}, steps_per_epoch=1,
    )
    state = create_train_state(model, (x,), tx, init_kwargs={"train": False})

    @jax.jit
    def step(state, batch, rng_key):
        def loss_fn(params):
            loss, tb, _, stats = task.loss(
                state.apply_fn,
                {"params": params, "batch_stats": state.batch_stats},
                batch, True, rng_key,
            )
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, stats), loss

    losses = []
    k = KEY
    for _ in range(25):
        k, sk = jax.random.split(k)
        state, loss = step(state, batch, sk)
        losses.append(float(loss))
    assert losses[-1] < losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_demo_cli_end_to_end(tmp_path):
    """The showcase workflow script (``bin/demo.py``): synthesize data ->
    train the detector -> graft it into FlowDROW -> train the flow head
    -> streaming joint inference with AP/EPE reporting. Guarded against
    bit-rot — the reference's ``bin/`` entry points rotted exactly this
    way (SURVEY §2.10: stale Trainer signatures, broken imports)."""
    import bin.demo as demo

    rc = demo.main(["--workdir", str(tmp_path / "demo"), "--cpu",
                    "--det-epochs", "1", "--flow-epochs", "1"])
    assert rc == 0
