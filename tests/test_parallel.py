"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.parallel import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from planar_optical_flow_tpu.models import FlowUNet, get_model
from planar_optical_flow_tpu.train import (
    Trainer,
    create_train_state,
    make_optimizer,
    tasks,
)


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_mesh_2d_axes():
    mesh = make_mesh(("data", "model"), (4, 2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis(rng):
    mesh = make_mesh()
    batch = {"x": rng.normal(size=(16, 5)).astype(np.float32)}
    placed = shard_batch(batch, mesh)
    sh = placed["x"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), 2)
    # each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in placed["x"].addressable_shards}
    assert shard_shapes == {(2, 5)}


def test_sharded_train_step_matches_single_device(rng):
    """Data-parallel gradient step == single-device step on the same batch."""
    model = FlowUNet(linear_head=True)
    task = tasks.FlowUNetTask()
    tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=1)
    x = jnp.zeros((8, 450, 2))
    state = create_train_state(model, (x, x), tx,
                               init_kwargs={"train": False})

    batch = {
        "scan_pair": rng.normal(size=(8, 2, 450, 2)).astype(np.float32),
        "flow_target": rng.normal(size=(8, 450, 2)).astype(np.float32),
    }
    rng_key = jax.random.PRNGKey(0)

    def grad_step(state, batch, rng_key):
        def loss_fn(params):
            loss, tb, _, stats = task.loss(
                state.apply_fn,
                {"params": params, "batch_stats": state.batch_stats},
                batch, True, rng_key,
            )
            return loss, stats

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return loss, grads

    # single device
    loss1, g1 = jax.jit(grad_step)(state, batch, rng_key)

    # 8-device mesh (XLA inserts the cross-shard grad all-reduce)
    mesh = make_mesh()
    bs = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    step = jax.jit(grad_step, in_shardings=(rep, bs, rep),
                   out_shardings=(rep, rep))
    loss8, g8 = step(jax.device_put(state, rep), shard_batch(batch, mesh),
                     jax.device_put(rng_key, rep))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    # gradients agree up to cross-shard reduction-order float noise
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        denom = max(np.abs(a).max(), 1e-6)
        assert err < 1e-7 or err / denom < 5e-3, (err, denom)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_jit_vs_eager_consistency(rng):
    """SURVEY §5: in place of data-race detection, assert jit and eager
    execution agree on the flagship forward path."""
    from planar_optical_flow_tpu.models import SpatialDrow

    model = SpatialDrow(window_size=5, pedestrian_only=True)
    x = jnp.asarray(rng.normal(size=(1, 45, 3, 16)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    eager = model.apply(v, x, train=False)
    jitted = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    for a, b in zip(eager, jitted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
