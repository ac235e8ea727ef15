"""Hybrid ICI x DCN mesh surface (SURVEY §2.11 "mesh over ICI
(intra-slice) and DCN (multi-slice)"; round-4 verdict item 4).

``make_mesh_from_config({"dcn": K, ...})`` builds the dcn axis OUTERMOST
over slice-major-ordered devices so every non-dcn collective rides ICI;
``batch_sharding`` spans ``(dcn, data)`` jointly and the gradient psum
lowers hierarchically. Training on ``{dcn: 2, data: 4}`` must produce
the same losses as the flat ``{data: 8}`` mesh — the hybrid layout only
changes placement, not math. The 2-process x 4-device composition is
certified by ``tests/test_multiprocess.py`` (slow tier).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.parallel import (
    batch_sharding,
    make_hybrid_mesh,
    make_mesh_from_config,
    shard_batch,
)
from planar_optical_flow_tpu.train import (
    Trainer,
    create_train_state,
    make_optimizer,
    tasks,
)


def test_hybrid_mesh_dcn_outermost():
    mesh = make_mesh_from_config({"dcn": 2, "data": 4})
    assert mesh.axis_names == ("dcn", "data")
    assert dict(mesh.shape) == {"dcn": 2, "data": 4}
    # dcn outermost regardless of the config mapping's key order
    mesh = make_mesh_from_config({"data": 2, "dcn": 2, "model": 2})
    assert mesh.axis_names == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}


def test_hybrid_mesh_auto_axis():
    mesh = make_mesh_from_config({"dcn": 2, "data": -1})
    assert dict(mesh.shape) == {"dcn": 2, "data": 4}


def test_hybrid_mesh_too_many_devices():
    with pytest.raises(ValueError, match="needs"):
        make_hybrid_mesh(4, {"data": 4})


def test_hybrid_batch_sharding_spans_dcn_and_data(rng):
    mesh = make_mesh_from_config({"dcn": 2, "data": 4})
    batch = {"x": rng.normal(size=(8, 6)).astype(np.float32)}
    placed = shard_batch(batch, mesh)
    sh = placed["x"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), 2)
    # 8 rows over 8 devices: every device holds exactly one row
    assert all(s.data.shape[0] == 1
               for s in placed["x"].addressable_shards)


@pytest.mark.slow
def test_trainer_hybrid_mesh_loss_parity(tmp_path, rng):
    """{dcn: 2, data: 4} training == {data: 8} training, loss for loss
    (hierarchical psum vs flat psum — placement, not math)."""
    from planar_optical_flow_tpu.models import SpatialDrow
    from planar_optical_flow_tpu.utils import RunLogger

    num_pts, n_scans = 48, 2
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=8,
                         padding_val=29.99)
    batches = []
    for _ in range(2):
        batches.append({
            "scans": rng.uniform(0.5, 20.0, (8, n_scans + 1, num_pts))
            .astype(np.float32),
            "target_cls": rng.integers(0, 2, (8, num_pts)).astype(np.int32),
            "target_reg": rng.normal(size=(8, num_pts, 2))
            .astype(np.float32),
        })

    def run(mesh_cfg):
        model = SpatialDrow(window_size=5, pedestrian_only=True)
        task = tasks.DetectionTask(cutout_kwargs=cutout_kwargs,
                                   num_pts=num_pts)
        tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=2)
        x = jnp.zeros((8, num_pts, n_scans + 1, 8))
        state = create_train_state(model, (x,), tx,
                                   init_kwargs={"train": False})
        logger = RunLogger({"log_dir": str(tmp_path), "tag": "hybrid"})
        losses = []
        orig = logger.add_scalar

        def capture(key, value, step=None):
            if key == "TRAIN_loss":
                losses.append(float(value))
            return orig(key, value, step)

        logger.add_scalar = capture
        trainer = Trainer(logger, {"epoch": 1, "ckpt_interval": 0,
                                   "eval_interval": 0}, task,
                          mesh=make_mesh_from_config(mesh_cfg),
                          install_signal_handlers=False, seed=0)
        state, rc = trainer.train(state, batches)
        assert rc == 0
        return losses, float(
            jnp.sum(jnp.abs(state.params["gate"]["embed"]["kernel"])))

    ref_losses, ref_p = run({"data": 8})
    got_losses, got_p = run({"dcn": 2, "data": 4})
    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-5)
    np.testing.assert_allclose(got_p, ref_p, rtol=1e-4)


def test_hybrid_mesh_single_axis_dcn():
    mesh = make_mesh_from_config({"dcn": 8})
    assert mesh.axis_names == ("dcn",)
    assert dict(mesh.shape) == {"dcn": 8}


def test_hybrid_partial_mesh_takes_devices_per_group():
    """A hybrid mesh using a subset of the devices must take each dcn
    group's devices from its own slice-major block, not a flat prefix
    (which would put every group in the first slice and spuriously
    fail the multi-process split check)."""
    mesh = make_mesh_from_config({"dcn": 2, "data": 2})
    devs = list(mesh.devices.ravel())
    all_devs = sorted(jax.devices(), key=lambda d: d.id)
    # group 0 from the first half of the device order, group 1 from
    # the second half
    assert devs[0:2] == all_devs[0:2]
    assert devs[2:4] == all_devs[4:6]


def test_dcn_pipe_combination_rejected(tmp_path):
    from planar_optical_flow_tpu.train import Trainer, tasks
    from planar_optical_flow_tpu.utils import RunLogger

    mesh = make_mesh_from_config({"dcn": 2, "pipe": 2})
    logger = RunLogger({"log_dir": str(tmp_path), "tag": "dcnpipe"})
    trainer = Trainer(logger, {"epoch": 1}, tasks.DetectionTask(),
                      mesh=mesh, install_signal_handlers=False)
    with pytest.raises(ValueError, match="dcn axis cannot combine"):
        trainer._build_steps(None)
