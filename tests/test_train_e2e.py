"""End-to-end slice: synthetic DROW data -> flow U-Net -> jitted train step
-> EPE eval -> checkpoint / sigterm-resume (SURVEY §7 M1)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.models import FlowUNet
from planar_optical_flow_tpu.train import (
    Trainer,
    create_train_state,
    make_optimizer,
    exp_decay_schedule,
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
    tasks,
)
from planar_optical_flow_tpu.data import (
    write_synthetic_drow_split,
    FlowScanPairDataset,
    BatchLoader,
)
from planar_optical_flow_tpu.data.prepare import prepare_split
from planar_optical_flow_tpu.utils.logger import RunLogger


@pytest.fixture(scope="module")
def drow_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drow"))
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=30,
                               num_pts=450)
    write_synthetic_drow_split(d, "val", num_sequences=1, num_frames=10,
                               num_pts=450, seed=7)
    prepare_split(d, "train", verbose=False)
    prepare_split(d, "val", verbose=False)
    return d


def _logger(tmp_path, tag="t"):
    return RunLogger({
        "log_dir": str(tmp_path), "tag": tag, "console": False,
        "tensorboard": False, "backup_list": [],
    })


def test_exp_decay_schedule_matches_reference_semantics():
    s = exp_decay_schedule(epoch0=0, lr0=1e-3, epoch1=100, lr1=1e-6,
                           steps_per_epoch=10)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(100 * 10)), 1e-6, rtol=1e-5)
    np.testing.assert_allclose(float(s(2000 * 10)), 1e-6, rtol=1e-5)
    # geometric midpoint
    np.testing.assert_allclose(float(s(50 * 10)), np.sqrt(1e-3 * 1e-6),
                               rtol=1e-4)


def test_flow_dataset_loads(drow_dir):
    ds = FlowScanPairDataset(drow_dir, "train")
    assert len(ds) > 0
    s = ds[0]
    assert s["scan_pair"].shape == (2, 450, 2)
    assert s["flow_target"].shape == (450, 2)
    b = ds.batch([0, 1])
    assert b["scan_pair"].shape == (2, 2, 450, 2)


def test_flow_unet_overfits_one_sample(drow_dir):
    """Institutionalized `_DEBUG_ONE_SAMPLE` (SURVEY §4): the net must fit a
    single sample nearly perfectly."""
    ds = FlowScanPairDataset(drow_dir, "train")
    batch = ds.batch([0])
    model = FlowUNet(linear_head=True)
    tx = make_optimizer(
        {"scheduler_kwargs": {"epoch0": 0, "lr0": 1e-3, "epoch1": 1000,
                              "lr1": 1e-3}},
        steps_per_epoch=1,
    )
    x = jnp.asarray(batch["scan_pair"][:, 0])
    state = create_train_state(model, (x, x), tx,
                               init_kwargs={"train": False})
    task = tasks.FlowUNetTask()

    @jax.jit
    def step(state, batch):
        def loss_fn(params):
            loss, tb, _, stats = task.loss(
                state.apply_fn,
                {"params": params, "batch_stats": state.batch_stats},
                batch, True,
            )
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, stats), loss

    losses = []
    for _ in range(150):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])
    assert losses[-1] < 0.05, losses[-1]


def test_trainer_full_loop_ckpt_eval(drow_dir, tmp_path):
    train_ds = FlowScanPairDataset(drow_dir, "train")
    val_ds = FlowScanPairDataset(drow_dir, "val")
    train_loader = BatchLoader(train_ds, batch_size=4, seed=1)
    val_loader = BatchLoader(val_ds, batch_size=4, shuffle=False)

    model = FlowUNet(linear_head=True)
    sched_cfg = {"scheduler_kwargs": {"epoch0": 0, "lr0": 1e-3,
                                      "epoch1": 4, "lr1": 1e-4}}
    tx = make_optimizer(sched_cfg, steps_per_epoch=len(train_loader))
    x = jnp.zeros((4, 450, 2))
    state = create_train_state(model, (x, x), tx,
                               init_kwargs={"train": False})

    logger = _logger(tmp_path)
    trainer = Trainer(
        logger,
        {"epoch": 2, "ckpt_interval": 1, "eval_interval": 1},
        tasks.FlowUNetTask(),
        install_signal_handlers=False,
    )
    state, rc = trainer.train(state, train_loader, val_loader)
    assert rc == 0
    assert int(state.epoch) == 2
    assert int(state.step) == 2 * len(train_loader)

    # checkpoints written and restorable
    latest = latest_checkpoint(logger.ckpt_dir)
    assert latest and latest.endswith("ckpt_e2")
    fresh = create_train_state(model, (x, x), tx,
                               init_kwargs={"train": False})
    restored = restore_checkpoint(latest, fresh)
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )

    # inference consumers restore with a template whose optimizer does NOT
    # match the trainer's (bin/infer.py uses optax.identity): the
    # variables-only restore must still load params + counters
    import optax
    from planar_optical_flow_tpu.train.checkpoint import restore_variables

    infer_state = create_train_state(model, (x, x), optax.identity(),
                                     init_kwargs={"train": False})
    inf = restore_variables(latest, infer_state)
    assert int(inf.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(inf.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )

    # scalar stream exists
    scalars = os.path.join(logger.tb_dir, "scalars.jsonl")
    assert os.path.getsize(scalars) > 0

    metrics = trainer.evaluate(restored, val_loader)
    assert "epe" in metrics and metrics["epe"] >= 0


def test_trainer_preemption_and_resume(drow_dir, tmp_path):
    """Fault injection: stop mid-training, sigterm ckpt written, resume
    continues from the stored epoch (SURVEY §5 failure-detection row)."""
    train_ds = FlowScanPairDataset(drow_dir, "train")
    loader = BatchLoader(train_ds, batch_size=4, seed=1)
    model = FlowUNet(linear_head=True)
    tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=len(loader))
    x = jnp.zeros((4, 450, 2))
    state = create_train_state(model, (x, x), tx,
                               init_kwargs={"train": False})

    logger = _logger(tmp_path, tag="pre")
    trainer = Trainer(logger, {"epoch": 50, "ckpt_interval": 100,
                               "eval_interval": 100},
                      tasks.FlowUNetTask(), install_signal_handlers=False)
    trainer.request_stop()  # preempt immediately
    state, rc = trainer.train(state, loader)
    assert rc == 1
    assert os.path.isdir(logger.sigterm_ckpt)

    # resume: restore and continue for 1 epoch
    fresh = create_train_state(model, (x, x), tx,
                               init_kwargs={"train": False})
    resumed = restore_checkpoint(logger.sigterm_ckpt, fresh)
    trainer2 = Trainer(logger, {"epoch": 1, "ckpt_interval": 100,
                                "eval_interval": 100},
                       tasks.FlowUNetTask(), install_signal_handlers=False)
    out, rc2 = trainer2.train(resumed, loader)
    assert rc2 == 0
    assert int(out.epoch) == 1


@pytest.mark.slow
def test_bf16_mixed_precision_training_learns(tmp_path, rng):
    """compute_dtype=bfloat16: forward/backward in bf16 with f32 master
    weights — loss must still decrease and state stays f32."""
    from planar_optical_flow_tpu.models import SpatialDrow
    from planar_optical_flow_tpu.train import (
        Trainer, create_train_state, make_optimizer, tasks,
    )
    from planar_optical_flow_tpu.utils import RunLogger

    num_pts, n_scans = 48, 2
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=8,
                         padding_val=29.99)
    batches = []
    for _ in range(4):
        batches.append({
            "scans": rng.uniform(0.5, 20.0, (8, n_scans + 1, num_pts))
            .astype(np.float32),
            "target_cls": rng.integers(0, 2, (8, num_pts)).astype(np.int32),
            "target_reg": rng.normal(size=(8, num_pts, 2)).astype(np.float32),
        })

    model = SpatialDrow(window_size=5, pedestrian_only=True)
    task = tasks.DetectionTask(cutout_kwargs=cutout_kwargs, num_pts=num_pts)
    tx = make_optimizer({"scheduler_kwargs": {"lr0": 1e-3}},
                        steps_per_epoch=len(batches))
    x = jnp.zeros((8, num_pts, n_scans + 1, 8))
    state = create_train_state(model, (x,), tx, init_kwargs={"train": False})
    logger = RunLogger({"log_dir": str(tmp_path), "tag": "bf16"})
    trainer = Trainer(
        logger, {"epoch": 3, "ckpt_interval": 0, "eval_interval": 0,
                 "compute_dtype": "bfloat16"},
        task, install_signal_handlers=False,
    )
    state, rc = trainer.train(state, batches)
    assert rc == 0
    # master weights stay f32
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(a.dtype == jnp.float32 for a in leaves
               if jnp.issubdtype(a.dtype, jnp.floating))
    assert state.batch_stats is None or all(
        a.dtype == jnp.float32
        for a in jax.tree_util.tree_leaves(state.batch_stats)
        if jnp.issubdtype(a.dtype, jnp.floating))
    # loss decreased over training
    import json as _json
    losses = [
        _json.loads(line)["value"]
        for line in open(os.path.join(logger.tb_dir, "scalars.jsonl"))
        if _json.loads(line)["key"] == "TRAIN_loss"
    ]
    assert len(losses) >= 8
    assert losses[-1] < losses[0]


def test_tasks_cast_model_inputs_to_param_dtype(rng):
    """Mixed precision contract: with bf16 params, every task feeds the
    model bf16 inputs (f32 inputs would silently promote the whole network
    back to f32 via flax promote_dtype — the round-3 perf bug)."""
    from planar_optical_flow_tpu.train import tasks

    recorded = {}

    def fake_apply(variables, *args, **kwargs):
        recorded["dtypes"] = [a.dtype for a in args
                              if hasattr(a, "dtype")
                              and jnp.issubdtype(a.dtype, jnp.floating)]
        b = args[0].shape[0]
        out = (jnp.zeros((b, 450, 1), jnp.bfloat16),
               jnp.zeros((b, 450, 2), jnp.bfloat16))
        if kwargs.get("mutable"):
            return out, {"batch_stats": {}}
        return out

    variables = {"params": {"w": jnp.zeros((3,), jnp.bfloat16)},
                 "batch_stats": None}
    batch = {
        "scans": jnp.asarray(rng.uniform(0.5, 20.0, (2, 3, 450)),
                             jnp.float32),
        "target_cls": jnp.zeros((2, 450, 1), jnp.float32),
        "target_reg": jnp.zeros((2, 450, 2), jnp.float32),
    }
    task = tasks.DetectionTask(
        cutout_kwargs=dict(fixed=True, num_cutout_pts=8), num_pts=450,
        pedestrian_only=True)
    loss, tb, _, _ = task.loss(fake_apply, variables, batch, train=True)
    assert recorded["dtypes"] == [jnp.bfloat16]
    # loss math must come back f32 even from bf16 predictions
    assert loss.dtype == jnp.float32


def test_explicit_pallas_encode_requires_fixed_geometry():
    """encode_impl='pallas' without the kernel-supported geometry must
    raise, not silently fall back to the XLA encode (which would also
    make pallas-vs-xla parity tests compare XLA against itself)."""
    task = tasks.DetectionTask(
        cutout_kwargs={"encode_impl": "pallas", "num_cutout_pts": 16})
    with pytest.raises(ValueError, match="fixed=True"):
        task._encode_cutout(jnp.zeros((1, 2, 16)))
    task = tasks.DetectionTask(
        cutout_kwargs={"encode_impl": "pallas_interpret", "fixed": True,
                       "stride": 2, "num_cutout_pts": 16})
    with pytest.raises(ValueError, match="stride=1"):
        task._encode_cutout(jnp.zeros((1, 2, 16)))
