"""Integration: DR-SPAAM learns detection on synthetic data — streaming AP
after a short training run beats the untrained network."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.data import (
    write_synthetic_drow_split,
    DrowDetectionDataset,
    BatchLoader,
)
from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import (
    create_train_state,
    make_optimizer,
    tasks,
)
from planar_optical_flow_tpu.infer import StreamingRunner
from planar_optical_flow_tpu.eval import evaluate_detection_ap

CUTOUT_KW = dict(fixed=True, centered=True, window_width=1.0,
                 window_depth=0.5, num_cutout_pts=16, padding_val=29.99,
                 area_mode=False)


@pytest.mark.slow
def test_detection_training_improves_ap(tmp_path):
    d = str(tmp_path)
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=40,
                               num_people=3, seed=5)
    ds = DrowDetectionDataset(d, "train", num_scans=2, pedestrian_only=True)
    loader = BatchLoader(ds, batch_size=8, seed=0)

    model = get_model({"type": "dr-spaam", "window_size": 5,
                       "pedestrian_only": True})
    task = tasks.DetectionTask(cutout_kwargs=CUTOUT_KW, pedestrian_only=True)
    tx = make_optimizer(
        {"scheduler_kwargs": {"epoch0": 0, "lr0": 1e-3, "epoch1": 20,
                              "lr1": 1e-3}},
        steps_per_epoch=len(loader),
    )
    x = jnp.zeros((8, 450, 3, 16))
    state = create_train_state(model, (x,), tx, init_kwargs={"train": False})

    def ap_of(state):
        runner = StreamingRunner(model, state.variables, CUTOUT_KW)
        return evaluate_detection_ap(runner, ds, conf_thresh=0.3)["ap"]

    ap_before = ap_of(state)

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

    key = jax.random.PRNGKey(0)
    first = last = None
    for epoch in range(3):
        for batch in loader:
            key, sk = jax.random.split(key)
            state, loss = step(state, batch, sk)
            if first is None:
                first = float(loss)
            last = float(loss)

    assert last < first, (first, last)
    ap_after = ap_of(state)
    assert ap_after > ap_before + 0.05, (ap_before, ap_after)
    assert ap_after > 0.2, ap_after
