"""GPipe pipeline parallelism: forward/grad parity vs the sequential chain.

The schedule (parallel/pipeline_parallel.py) runs each microbatch through
the exact sequential stage chain — the only numeric difference vs the
unstaged forward is that XLA may lower the smaller per-microbatch matmuls
differently (1-ulp effects), so parity is tight-tolerance, and exact when
the microbatch equals the batch lowering. Grad parity exercises the
backward wavefront that autodiff derives through the scan + ppermute +
switch.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.parallel import (
    make_mesh_from_config,
    pipeline_apply,
    drow_pipeline_stages,
)


def _mlp_stages(rng, widths=(6, 16, 12, 8, 4)):
    """Heterogeneous dense stages (different in/out widths per stage)."""
    params = []
    for din, dout in zip(widths[:-1], widths[1:]):
        params.append({
            "w": jnp.asarray(rng.normal(0, 0.5, (din, dout)), jnp.float32),
            "b": jnp.asarray(rng.normal(0, 0.1, (dout,)), jnp.float32),
        })

    def stage(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    return [stage] * len(params), params


def _sequential(stage_fns, stage_params, x):
    for fn, p in zip(stage_fns, stage_params):
        x = fn(p, x)
    return x


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_forward_matches_sequential(rng, n_micro):
    fns, params = _mlp_stages(rng)
    mesh = make_mesh_from_config({"pipe": 4})
    x = jnp.asarray(rng.normal(0, 1, (8, 6)), jnp.float32)

    want = _sequential(fns, params, x)
    got = jax.jit(
        functools.partial(pipeline_apply, fns, mesh=mesh,
                          n_microbatches=n_micro)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=1e-6)


def test_pipeline_grads_match_sequential(rng):
    fns, params = _mlp_stages(rng)
    mesh = make_mesh_from_config({"pipe": 4})
    x = jnp.asarray(rng.normal(0, 1, (8, 6)), jnp.float32)
    t = jnp.asarray(rng.normal(0, 1, (8, 4)), jnp.float32)

    def loss_seq(ps):
        return jnp.mean((_sequential(fns, ps, x) - t) ** 2)

    def loss_pp(ps):
        y = pipeline_apply(fns, ps, x, mesh, n_microbatches=8)
        return jnp.mean((y - t) ** 2)

    want_l, want_g = jax.value_and_grad(loss_seq)(params)
    got_l, got_g = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-6)
    for gg, wg in zip(jax.tree_util.tree_leaves(got_g),
                      jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(wg),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_pytree_activations(rng):
    """Stages exchanging tuple activations (the head's (cls, reg) shape)."""
    mesh = make_mesh_from_config({"pipe": 2})
    w = jnp.asarray(rng.normal(0, 0.5, (5, 3)), jnp.float32)

    def s0(p, x):
        return (x @ p, x[:, :2])

    def s1(p, xs):
        a, b = xs
        return {"y": a * p, "z": b}

    x = jnp.asarray(rng.normal(0, 1, (4, 5)), jnp.float32)
    want = s1(2.0, s0(w, x))
    got = pipeline_apply([s0, s1], [w, jnp.asarray(2.0)], x, mesh)
    np.testing.assert_array_equal(np.asarray(got["y"]),
                                  np.asarray(want["y"]))
    np.testing.assert_array_equal(np.asarray(got["z"]),
                                  np.asarray(want["z"]))


def test_pipeline_validates_configuration(rng):
    fns, params = _mlp_stages(rng)
    mesh = make_mesh_from_config({"pipe": 4})
    x = jnp.zeros((8, 6), jnp.float32)
    with pytest.raises(ValueError, match="stages but mesh"):
        pipeline_apply(fns[:2], params[:2], x, mesh)
    with pytest.raises(ValueError, match="param trees"):
        pipeline_apply(fns, params[:2], x, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(fns, params, x, mesh, n_microbatches=3)
    with pytest.raises(ValueError, match="single dtype"):
        pipeline_apply(fns, params, x.astype(jnp.bfloat16), mesh)


def test_drow_detector_pipelined_forward(rng):
    """The real detector forward, staged backbone | head over a 2-device
    pipe axis, matches the single-device ``model.apply`` exactly."""
    from planar_optical_flow_tpu.models import Drow

    model = Drow(pedestrian_only=True)
    b, ct, s, p = 4, 6, 3, 8
    x = jnp.asarray(rng.uniform(-1, 1, (b, ct, s, p)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    want_cls, want_reg = model.apply(variables, x, train=False)

    mesh = make_mesh_from_config({"pipe": 2})
    fns, params = drow_pipeline_stages(model, variables, train=False)
    got_cls, got_reg = jax.jit(
        functools.partial(pipeline_apply, fns, mesh=mesh, n_microbatches=4)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_reg), np.asarray(want_reg),
                               rtol=1e-6, atol=1e-6)


def test_drow_stages_dropout_rng(rng):
    """train=True on a dropout-enabled detector needs an explicit rng;
    with one, the pipelined training forward runs (stages draw
    independent masks)."""
    from planar_optical_flow_tpu.models import Drow
    from planar_optical_flow_tpu.parallel import drow_pipeline_stages

    model = Drow(pedestrian_only=True, dropout=0.3)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 5, 2, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    with pytest.raises(ValueError, match="dropout_rng"):
        drow_pipeline_stages(model, variables, train=True)

    mesh = make_mesh_from_config({"pipe": 2})
    fns, params = drow_pipeline_stages(
        model, variables, train=True, dropout_rng=jax.random.PRNGKey(1))
    cls, reg = pipeline_apply(fns, params, x, mesh, n_microbatches=2)
    assert cls.shape == (4, 5, 1) and reg.shape == (4, 5, 2)
    assert bool(jnp.all(jnp.isfinite(cls)))


@pytest.mark.slow
def test_flow_unet_pipelined_forward_and_grads(rng):
    """The flow U-Net staged encoder+correlation | decoder over a pipe
    mesh: skip connections cross the stage boundary as a pytree
    activation. Forward parity vs model.apply and grad parity through
    the pipelined EPE loss (refactor guard: the setup-based module must
    keep the nn.compact parameter tree)."""
    from planar_optical_flow_tpu.models import FlowUNet
    from planar_optical_flow_tpu.parallel import flow_unet_pipeline_stages

    model = FlowUNet(linear_head=True)
    s1 = jnp.asarray(rng.normal(0, 1, (4, 24, 2)), jnp.float32)
    s2 = jnp.asarray(rng.normal(0, 1, (4, 24, 2)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), s1, s2, train=False)
    # the parameter tree keeps the original names (checkpoints unaffected)
    assert set(variables["params"]) == {
        "encoder_0", "encoder_1", "encoder_2", "decoder_1", "decoder_0",
        "flow_reg_linear"}

    want = model.apply(variables, s1, s2, train=False)
    mesh = make_mesh_from_config({"pipe": 2})
    fns, params = flow_unet_pipeline_stages(model, variables, train=False)
    got = pipeline_apply(fns, params, (s1, s2), mesh, n_microbatches=2)
    # Two-part parity. (a) Schedule correctness: the pipeline runs each
    # microbatch through the exact stage chain, so it must match the
    # *per-microbatch* sequential forward tightly — any drift here is a
    # scheduling bug, not a lowering effect.
    want_micro = jnp.concatenate([
        model.apply(variables, s1[i:i + 2], s2[i:i + 2], train=False)
        for i in range(0, 4, 2)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_micro),
                               rtol=1e-5, atol=1e-6)
    # (b) Full-batch comparison at the documented bound: XLA lowers the
    # smaller per-microbatch convs differently (measured ~6e-5 relative on
    # this fixture), so parity vs the unsplit forward is ~1e-4 relative.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    t = jnp.asarray(rng.normal(0, 1, want.shape), jnp.float32)

    def loss_pp(ps):
        y = pipeline_apply(fns, ps, (s1, s2), mesh, n_microbatches=2)
        return jnp.mean(jnp.linalg.norm(y - t, axis=-1))

    def loss_seq(v):
        y = model.apply(v, s1, s2, train=False)
        return jnp.mean(jnp.linalg.norm(y - t, axis=-1))

    g_pp = jax.grad(loss_pp)(params)
    g_seq = jax.grad(loss_seq)(variables)
    tot = jax.tree_util.tree_map(lambda a, b: a + b, g_pp[0], g_pp[1])
    for gg, wg in zip(jax.tree_util.tree_leaves(tot),
                      jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(wg),
                                   rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# stage-state threading (ghost-batch BN support) and the productized
# pipe-axis training path
# --------------------------------------------------------------------------


def test_pipeline_stage_state_threads_in_microbatch_order(rng):
    """Each stage's state must advance once per microbatch, in order,
    exactly like a sequential loop (the BN running-stat contract)."""
    mesh = make_mesh_from_config({"pipe": 2})

    def s0(p, s, x):
        # state: (count, running sum of inputs) — order-sensitive EMA-ish
        cnt, acc = s
        return x * p, (cnt + 1, 0.5 * acc + jnp.sum(x))

    def s1(p, s, x):
        cnt, acc = s
        return x + p, (cnt + 1, 0.5 * acc + jnp.sum(x))

    x = jnp.asarray(rng.normal(0, 1, (8, 3)), jnp.float32)
    params = [jnp.asarray(2.0), jnp.asarray(1.0)]
    state0 = [(jnp.asarray(0), jnp.asarray(0.0)),
              (jnp.asarray(0), jnp.asarray(0.0))]

    out, new_states = pipeline_apply([s0, s1], params, x, mesh,
                                     n_microbatches=4, stage_state=state0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1,
                               rtol=1e-6)

    # sequential reference for the state chains
    acc0 = acc1 = 0.0
    for i in range(4):
        mbx = np.asarray(x[i * 2:(i + 1) * 2])
        acc0 = 0.5 * acc0 + mbx.sum()
        acc1 = 0.5 * acc1 + (mbx * 2).sum()
    assert int(new_states[0][0]) == 4 and int(new_states[1][0]) == 4
    np.testing.assert_allclose(float(new_states[0][1]), acc0, rtol=1e-5)
    np.testing.assert_allclose(float(new_states[1][1]), acc1, rtol=1e-5)


def _detection_fixture(rng, batch=8, num_pts=48, n_scans=2):
    from planar_optical_flow_tpu.models import Drow
    from planar_optical_flow_tpu.train import tasks

    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=8,
                         padding_val=29.99)
    batch_d = {
        "scans": rng.uniform(0.5, 20.0, (batch, n_scans + 1, num_pts))
        .astype(np.float32),
        "target_cls": rng.integers(0, 2, (batch, num_pts)).astype(np.int32),
        "target_reg": rng.normal(size=(batch, num_pts, 2))
        .astype(np.float32),
    }
    model = Drow(pedestrian_only=True)
    task = tasks.DetectionTask(cutout_kwargs=cutout_kwargs, num_pts=num_pts)
    x = jnp.zeros((batch, num_pts, n_scans + 1, 8))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, task, variables, batch_d


@pytest.mark.slow
def test_detection_loss_pipelined_matches_sequential_ghost_bn(rng):
    """loss_pipelined == a sequential microbatched loop with ghost-batch
    BN (per-microbatch stats, EMA advanced per microbatch in order):
    outputs, loss, grads AND the updated running stats."""
    from planar_optical_flow_tpu.ops import detection_loss

    model, task, variables, batch = _detection_fixture(rng)
    mesh = make_mesh_from_config({"pipe": 2})
    m = 4

    def pp_loss(params):
        loss, tb, rtn, new_stats = task.loss_pipelined(
            model.apply, {"params": params,
                          "batch_stats": variables["batch_stats"]},
            batch, True, None, mesh=mesh, n_microbatches=m)
        return loss, (rtn, new_stats)

    (loss_pp, (rtn_pp, stats_pp)), grads_pp = jax.value_and_grad(
        pp_loss, has_aux=True)(variables["params"])

    # sequential ghost-BN reference (the stated numerics policy)
    encoded = np.asarray(task._encode(batch["scans"]))
    mb = encoded.shape[0] // m

    def seq_loss(params):
        stats = variables["batch_stats"]
        cls_all, reg_all = [], []
        for i in range(m):
            xin = jnp.asarray(encoded[i * mb:(i + 1) * mb])
            (cls, reg), upd = model.apply(
                {"params": params, "batch_stats": stats}, xin, True,
                mutable=["batch_stats"])
            stats = upd["batch_stats"]
            cls_all.append(cls)
            reg_all.append(reg)
        pred_cls = jnp.concatenate(cls_all)
        pred_reg = jnp.concatenate(reg_all)
        c, r, _ = detection_loss(pred_cls, pred_reg, batch["target_cls"],
                                 batch["target_reg"],
                                 pedestrian_only=True)
        return c + r, (pred_cls, pred_reg, stats)

    (loss_seq, (cls_seq, reg_seq, stats_seq)), grads_seq = \
        jax.value_and_grad(seq_loss, has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(loss_pp), float(loss_seq), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rtn_pp["pred_cls"]),
                               np.asarray(cls_seq), rtol=1e-4, atol=1e-5)
    for got, want in zip(jax.tree_util.tree_leaves(stats_pp),
                         jax.tree_util.tree_leaves(stats_seq)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    for got, want in zip(jax.tree_util.tree_leaves(grads_pp),
                         jax.tree_util.tree_leaves(grads_seq)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_trainer_pipe_axis_end_to_end(rng, tmp_path):
    """`pipeline.mesh: {pipe: 2}` trains the detector through the product
    Trainer: optimizer steps, running-stat updates, periodic checkpoint,
    sigterm -> checkpoint -> restore -> continue."""
    import os

    from planar_optical_flow_tpu.train import (
        Trainer, create_train_state, make_optimizer, tasks,
        restore_checkpoint,
    )
    from planar_optical_flow_tpu.utils import RunLogger

    model, task, variables, _ = _detection_fixture(rng)
    batches = []
    for _ in range(4):
        batches.append({
            "scans": rng.uniform(0.5, 20.0, (8, 3, 48)).astype(np.float32),
            "target_cls": rng.integers(0, 2, (8, 48)).astype(np.int32),
            "target_reg": rng.normal(size=(8, 48, 2)).astype(np.float32),
        })
    tx = make_optimizer({"scheduler_kwargs": {"lr0": 1e-3}},
                        steps_per_epoch=len(batches))
    x = jnp.zeros((8, 48, 3, 8))
    state = create_train_state(model, (x,), tx,
                               init_kwargs={"train": False})
    # materialize: the jitted step donates the state, deleting the originals
    stats0 = [np.asarray(l) for l in
              jax.tree_util.tree_leaves(state.batch_stats)]

    mesh = make_mesh_from_config({"pipe": 2})
    logger = RunLogger({"log_dir": str(tmp_path), "tag": "pp"})
    trainer = Trainer(
        logger, {"epoch": 2, "ckpt_interval": 1, "eval_interval": 0,
                 "pp_microbatches": 4},
        task, mesh=mesh, install_signal_handlers=False,
    )
    state, rc = trainer.train(state, batches)
    assert rc == 0 and int(state.step) == 8
    assert os.path.isdir(os.path.join(logger.ckpt_dir, "ckpt_e2"))
    # BN running stats actually advanced through the wavefront
    changed = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(stats0,
                        jax.tree_util.tree_leaves(state.batch_stats))
    ]
    assert any(changed)

    import json as _json

    losses = [
        _json.loads(line)["value"]
        for line in open(os.path.join(logger.tb_dir, "scalars.jsonl"))
        if _json.loads(line)["key"] == "TRAIN_loss"
    ]
    assert len(losses) == 8 and losses[-1] < losses[0]

    # preemption mid-training: sigterm checkpoint written, rc=1, restore
    trainer2 = Trainer(
        logger, {"epoch": 4, "ckpt_interval": 0, "eval_interval": 0,
                 "pp_microbatches": 4},
        task, mesh=mesh, install_signal_handlers=False,
    )
    trainer2.request_stop()
    state2, rc2 = trainer2.train(state, batches)
    assert rc2 == 1 and os.path.isdir(logger.sigterm_ckpt)
    restored = restore_checkpoint(logger.sigterm_ckpt, state2)
    assert int(restored.step) == int(state2.step)


@pytest.mark.slow
def test_ghost_bn_training_converges_like_global_bn(rng, tmp_path):
    """Numerics-policy check for the pipe axis: ghost-batch BN training
    (per-microbatch stats) reaches the same loss neighborhood as the
    global-batch BN single-device step on identical data and seeds."""
    from planar_optical_flow_tpu.train import (
        Trainer, create_train_state, make_optimizer,
    )
    from planar_optical_flow_tpu.utils import RunLogger
    import json as _json
    import os

    model, task, variables, _ = _detection_fixture(rng)
    batches = []
    for _ in range(4):
        batches.append({
            "scans": rng.uniform(0.5, 20.0, (8, 3, 48)).astype(np.float32),
            "target_cls": rng.integers(0, 2, (8, 48)).astype(np.int32),
            "target_reg": rng.normal(size=(8, 48, 2)).astype(np.float32),
        })

    def run(mesh, tag, micro=None):
        tx = make_optimizer({"scheduler_kwargs": {"lr0": 1e-3}},
                            steps_per_epoch=len(batches))
        x = jnp.zeros((8, 48, 3, 8))
        state = create_train_state(model, (x,), tx,
                                   init_kwargs={"train": False})
        logger = RunLogger({"log_dir": str(tmp_path), "tag": tag})
        cfg = {"epoch": 3, "ckpt_interval": 0, "eval_interval": 0}
        if micro:
            cfg["pp_microbatches"] = micro
        tr = Trainer(logger, cfg, task, mesh=mesh,
                     install_signal_handlers=False, seed=0)
        tr.train(state, batches)
        return [
            _json.loads(line)["value"]
            for line in open(os.path.join(logger.tb_dir, "scalars.jsonl"))
            if _json.loads(line)["key"] == "TRAIN_loss"
        ]

    l_pp = run(make_mesh_from_config({"pipe": 2}), "ghost", micro=4)
    l_1d = run(None, "global")
    assert len(l_pp) == len(l_1d) == 12
    # both train; the two BN policies land in the same loss neighborhood
    assert l_pp[-1] < 0.7 * l_pp[0]
    assert l_1d[-1] < 0.7 * l_1d[0]
    final_pp = np.mean(l_pp[-4:])
    final_1d = np.mean(l_1d[-4:])
    assert abs(final_pp - final_1d) / final_1d < 0.25, (final_pp, final_1d)


def test_pipeline_composes_with_data_axis(rng):
    """dp x pp: on a {data, pipe} mesh the microbatch rows shard over
    data while the wavefront runs over pipe — forward output must equal
    the sequential chain (stateless stages; row sharding is pure
    layout)."""
    fns, params = _mlp_stages(rng, widths=(6, 16, 12, 8, 4))
    mesh = make_mesh_from_config({"data": 2, "pipe": 4})
    x = jnp.asarray(rng.normal(0, 1, (16, 6)), jnp.float32)
    want = _sequential(fns, params, x)
    got = jax.jit(
        functools.partial(pipeline_apply, fns, mesh=mesh,
                          n_microbatches=4)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)
    # microbatch rows not divisible by the data axis -> explicit error
    # (batch 12 / 4 microbatches = 3 rows, unsplittable over data=2)
    with pytest.raises(ValueError, match="not divisible by the data"):
        pipeline_apply(fns, params, x[:12], mesh, n_microbatches=4)


@pytest.mark.slow
def test_detection_loss_pipelined_dp_pp_matches_sequential(rng):
    """dp x pp with threaded BN state: per-shard ghost chains, final
    running stats = mean over the data shards — against an explicit
    per-shard sequential reference (loss, outputs, grads, stats)."""
    from planar_optical_flow_tpu.ops import detection_loss

    model, task, variables, batch = _detection_fixture(rng, batch=8)
    mesh = make_mesh_from_config({"data": 2, "pipe": 2})
    m, d_sh = 2, 2

    def pp_loss(params):
        loss, tb, rtn, new_stats = task.loss_pipelined(
            model.apply, {"params": params,
                          "batch_stats": variables["batch_stats"]},
            batch, True, None, mesh=mesh, n_microbatches=m)
        return loss, (rtn, new_stats)

    (loss_pp, (rtn_pp, stats_pp)), grads_pp = jax.value_and_grad(
        pp_loss, has_aux=True)(variables["params"])

    encoded = np.asarray(task._encode(batch["scans"]))
    mb = encoded.shape[0] // m          # rows per microbatch
    rows = mb // d_sh                   # rows per (microbatch, shard)

    def seq_loss(params):
        cls_all = [None] * m
        reg_all = [None] * m
        shard_stats = []
        for s in range(d_sh):
            stats = variables["batch_stats"]
            for i in range(m):
                lo = i * mb + s * rows
                xin = jnp.asarray(encoded[lo:lo + rows])
                (cls, reg), upd = model.apply(
                    {"params": params, "batch_stats": stats}, xin, True,
                    mutable=["batch_stats"])
                stats = upd["batch_stats"]
                cls_all[i] = (cls if cls_all[i] is None
                              else jnp.concatenate([cls_all[i], cls]))
                reg_all[i] = (reg if reg_all[i] is None
                              else jnp.concatenate([reg_all[i], reg]))
            shard_stats.append(stats)
        final_stats = jax.tree_util.tree_map(
            lambda *ls: jnp.mean(jnp.stack(ls), axis=0), *shard_stats)
        pred_cls = jnp.concatenate(cls_all)
        pred_reg = jnp.concatenate(reg_all)
        c, r, _ = detection_loss(pred_cls, pred_reg, batch["target_cls"],
                                 batch["target_reg"],
                                 pedestrian_only=True)
        return c + r, (pred_cls, pred_reg, final_stats)

    (loss_seq, (cls_seq, reg_seq, stats_seq)), grads_seq = \
        jax.value_and_grad(seq_loss, has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(loss_pp), float(loss_seq), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rtn_pp["pred_cls"]),
                               np.asarray(cls_seq), rtol=2e-4, atol=1e-5)
    for got, want in zip(jax.tree_util.tree_leaves(stats_pp),
                         jax.tree_util.tree_leaves(stats_seq)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    for got, want in zip(jax.tree_util.tree_leaves(grads_pp),
                         jax.tree_util.tree_leaves(grads_seq)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=2e-5)


@pytest.mark.slow
def test_drow_train_stages_dropout_varies_per_microbatch(rng):
    """Review fix: the dropout key must fold in the microbatch tick —
    a stage-only fold hands every microbatch the same bernoulli mask.
    Identical rows fed to two microbatches must come out DIFFERENT
    (independent masks), and the whole forward must be deterministic."""
    from planar_optical_flow_tpu.models import Drow
    from planar_optical_flow_tpu.parallel.pipeline_parallel import (
        drow_pipeline_train_stages,
    )

    model = Drow(pedestrian_only=True, dropout=0.5)
    row = rng.uniform(-1, 1, (2, 6, 2, 8)).astype(np.float32)
    x = jnp.asarray(np.concatenate([row, row]))  # mb0 rows == mb1 rows
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    mesh = make_mesh_from_config({"pipe": 2})
    fns, split_p, split_s, combine = drow_pipeline_train_stages(
        model, dropout_rng=jax.random.PRNGKey(3))

    def run():
        (cls, reg), states = pipeline_apply(
            fns, split_p(variables["params"]), x, mesh,
            n_microbatches=2,
            stage_state=split_s(variables["batch_stats"]))
        return cls, states

    cls1, states1 = run()
    cls2, _ = run()
    # deterministic across calls
    np.testing.assert_array_equal(np.asarray(cls1), np.asarray(cls2))
    # different masks across microbatches (same input rows)
    a, b = np.asarray(cls1[:2]), np.asarray(cls1[2:])
    assert not np.allclose(a, b), "identical dropout mask reused"
    # the tick counter advanced once per microbatch and stayed integer
    assert int(states1[0][1]) == 2 and int(states1[1][1]) == 2
    assert np.asarray(states1[0][1]).dtype == np.int32


def test_pipeline_int_state_survives_dp_pp(rng):
    """Review fix: non-floating state leaves must keep their dtype under
    dp x pp (pmean would silently promote to f32 and break the next
    step's carry); they replicate shard 0's value instead."""
    mesh = make_mesh_from_config({"data": 2, "pipe": 2})

    def s0(p, s, x):
        return x * p, (s[0] + 1, 0.5 * s[1] + jnp.sum(x))

    def s1(p, s, x):
        return x + p, (s[0] + 1, 0.5 * s[1] + jnp.sum(x))

    params = [jnp.asarray(2.0), jnp.asarray(1.0)]
    state0 = [(jnp.int32(0), jnp.asarray(0.0)),
              (jnp.int32(0), jnp.asarray(0.0))]
    x = jnp.asarray(rng.normal(0, 1, (8, 3)), jnp.float32)
    out, states = pipeline_apply([s0, s1], params, x, mesh,
                                 n_microbatches=2, stage_state=state0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1,
                               rtol=1e-6)
    for i in range(2):
        cnt = states[i][0]
        assert cnt.dtype == jnp.int32, cnt.dtype
        assert int(cnt) == 2
        # the float leaf pmean-s over shards and stays f32
        assert states[i][1].dtype == jnp.float32
    # re-feeding the returned state must trace cleanly (dtype stability)
    out2, states2 = pipeline_apply([s0, s1], params, x, mesh,
                                   n_microbatches=2, stage_state=states)
    assert int(states2[0][0]) == 4


def test_loss_pipelined_guards(rng):
    """Non-stageable models and pipe-less tasks fail loudly: SpatialDROW
    (gate between the stages) raises from loss_pipelined, and a Trainer
    given a pipe mesh with a task lacking loss_pipelined raises at step
    build instead of silently destaging."""
    from planar_optical_flow_tpu.models import SpatialDrow
    from planar_optical_flow_tpu.train import (Trainer, tasks,
                                               create_train_state,
                                               make_optimizer)
    from planar_optical_flow_tpu.utils import RunLogger

    mesh = make_mesh_from_config({"pipe": 2})
    task = tasks.DetectionTask(
        cutout_kwargs=dict(fixed=True, centered=True, window_width=1.0,
                           window_depth=0.5, num_cutout_pts=8,
                           padding_val=29.99), num_pts=48)
    model = SpatialDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((4, 48, 3, 8))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    batch = {
        "scans": rng.uniform(0.5, 20.0, (4, 3, 48)).astype(np.float32),
        "target_cls": rng.integers(0, 2, (4, 48)).astype(np.int32),
        "target_reg": rng.normal(size=(4, 48, 2)).astype(np.float32),
    }
    with pytest.raises(ValueError, match="plain DROW"):
        task.loss_pipelined(model.apply, variables, batch, True, None,
                            mesh=mesh, n_microbatches=2)

    # a task without loss_pipelined on a pipe mesh -> explicit error
    class NoPipeline:
        def loss(self, *a, **k):
            raise AssertionError("unreachable")

    tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=1)
    state = create_train_state(model, (x,), tx,
                               init_kwargs={"train": False})
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        tr = Trainer(RunLogger({"log_dir": td, "tag": "g"}),
                     {"epoch": 1}, NoPipeline(), mesh=mesh,
                     install_signal_handlers=False)
        with pytest.raises(ValueError, match="no loss_pipelined"):
            tr._build_steps(state)
