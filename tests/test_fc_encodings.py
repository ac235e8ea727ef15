"""fc1d / fc1d_fea / fc2d encodings end-to-end (reference
``dataset_dr_spaam.py:437-460``): encode switch in DetectionTask, the
PolarGridDetector consuming the columns, and the pipeline wiring from a
flat ``network:`` config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import tasks
from planar_optical_flow_tpu.pipeline import normalize_config, _build_task

NUM_PTS = 64
CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=8, padding_val=29.99, area_mode=False)
PG = dict(min_range=0.0, max_range=20.0, range_bin_size=1.0, tsdf_clip=1.0,
          normalize=True)


def _batch(b=2, s=3, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "scans": jnp.asarray(rng.uniform(0.5, 19.0, (b, s, NUM_PTS)),
                             jnp.float32),
        "target_cls": jnp.asarray(
            rng.integers(0, 2, (b, NUM_PTS)), jnp.int32),
        "target_reg": jnp.asarray(
            rng.normal(0, 0.1, (b, NUM_PTS, 2)), jnp.float32),
    }


@pytest.mark.parametrize("enc,r", [("fc1d", 1), ("fc1d_fea", 8),
                                   ("fc2d", 21)])
def test_fc_encoding_shapes_and_loss(enc, r):
    task = tasks.DetectionTask(cutout_kwargs=CUT, pedestrian_only=True,
                               num_pts=NUM_PTS, encoding=enc,
                               polar_grid_kwargs=PG)
    batch = _batch()
    enc_out = task._encode(batch["scans"])
    assert enc_out.shape == (2, 3, r, NUM_PTS), enc_out.shape

    model = get_model({"type": enc, "pedestrian_only": True, "hidden": 32})
    variables = model.init(jax.random.PRNGKey(0), enc_out, train=False)
    loss, tb, rtn, stats = task.loss(model.apply, variables, batch, True,
                                     jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert rtn["pred_cls"].shape == (2, NUM_PTS, 1)
    assert rtn["pred_reg"].shape == (2, NUM_PTS, 2)


def test_fc2d_encode_matches_reference_oracle():
    """Device fc2d grid == the reference's scalar polar-grid loop."""
    from tests.oracles import polar_grid_loop

    rng = np.random.default_rng(1)
    scans = rng.uniform(0.5, 19.0, (3, NUM_PTS)).astype(np.float32)
    task = tasks.DetectionTask(cutout_kwargs=CUT, num_pts=NUM_PTS,
                               encoding="fc2d", polar_grid_kwargs=PG)
    got = np.asarray(task._encode(jnp.asarray(scans[None])))[0]
    exp = polar_grid_loop(scans, **PG)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_fc2d_pipeline_wiring():
    """Flat config `network: fc2d` resolves to the fc2d model + task with
    the polar-grid kwargs threaded through (the round-2 dead knob, wired)."""
    cfg = normalize_config({
        "network": "fc2d", "pedestrian_only": True, "num_scans": 2,
        "polar_grid_kwargs": PG, "cutout_kwargs": CUT,
    })
    assert cfg["model"]["type"] == "fc2d"
    task = _build_task(cfg)
    assert isinstance(task, tasks.DetectionTask)
    assert task.encoding == "fc2d"
    assert task.polar_grid_kwargs["range_bin_size"] == 1.0
    model = get_model(cfg["model"])
    assert type(model).__name__ == "PolarGridDetector"


def test_fc2d_training_learns():
    """Short synthetic training run: fc2d detector's loss decreases."""
    import optax

    task = tasks.DetectionTask(cutout_kwargs=CUT, pedestrian_only=True,
                               num_pts=NUM_PTS, encoding="fc2d",
                               polar_grid_kwargs=PG)
    model = get_model({"type": "fc2d", "pedestrian_only": True,
                       "hidden": 32})
    batch = _batch(b=4)
    enc = task._encode(batch["scans"])
    variables = model.init(jax.random.PRNGKey(0), enc, train=False)
    tx = optax.adam(3e-3)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            loss, _, _, new_stats = task.loss(
                model.apply, {"params": p, "batch_stats": stats},
                batch, True, jax.random.PRNGKey(2))
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                new_stats["batch_stats"] if "batch_stats" in new_stats
                else new_stats, opt_state, loss)

    losses = []
    for _ in range(15):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
