"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import pytest
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


@pytest.mark.slow
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


def test_mesh_from_config_and_auto():
    from planar_optical_flow_tpu.parallel import make_mesh_from_config

    mesh = make_mesh_from_config({"data": 4, "model": 2})
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh_from_config({"data": -1, "model": 2})
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh_from_config(None)
    assert dict(mesh.shape) == {"data": 8}


@pytest.mark.slow
def test_trainer_2d_mesh_loss_parity(tmp_path, rng):
    """The same SpatialDrow training runs on a 1-D data mesh and a 2-D
    (data, model) mesh (tensor-sharded embed + head convs) must produce the
    same losses — the partition rule only changes placement, not math."""
    from planar_optical_flow_tpu.parallel import (
        make_mesh_from_config, state_shardings,
    )
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
            "target_reg": rng.normal(size=(8, num_pts, 2)).astype(np.float32),
        })

    def run(mesh_cfg, sharding_fn):
        model = SpatialDrow(window_size=5, pedestrian_only=True)
        task = tasks.DetectionTask(cutout_kwargs=cutout_kwargs,
                                   num_pts=num_pts)
        tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=2)
        x = jnp.zeros((8, num_pts, n_scans + 1, 8))
        state = create_train_state(model, (x,), tx,
                                   init_kwargs={"train": False})
        logger = RunLogger({"log_dir": str(tmp_path), "tag": "mesh"})
        trainer = Trainer(logger, {"epoch": 1, "ckpt_interval": 0,
                                   "eval_interval": 0}, task,
                          mesh=make_mesh_from_config(mesh_cfg),
                          state_sharding_fn=sharding_fn,
                          install_signal_handlers=False, seed=0)
        state, rc = trainer.train(state, batches)
        assert rc == 0
        return float(jnp.sum(jnp.abs(state.params["gate"]["embed"]["kernel"])))

    ref = run({"data": 8}, None)
    got = run({"data": 4, "model": 2}, state_shardings)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_sharded_serve_step_matches_single_device(rng):
    """serve-v3 shard_mapped over the data mesh == single-device serving
    (streams are independent; zero collectives)."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    num_pts = 64
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    mesh = make_mesh()
    b = mesh.devices.size * 2
    kw = dict(num_pts=num_pts, with_nms=True, precision="bf16", tile=16,
              interpret=True)
    single = make_serve_step_v3(model, variables, cutout_kwargs, **kw)
    sharded = make_serve_step_v3(model, variables, cutout_kwargs,
                                 mesh=mesh, **kw)
    carry_s, carry_m = None, None
    for i in range(2):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (b, num_pts)),
                          jnp.float32)
        carry_s, out_s = single(carry_s, scan)
        carry_m, out_m = sharded(carry_m, scan)
        # per-shard bf16 compute fuses differently than the full batch —
        # bf16-epsilon noise only
        for k in ("pred_cls", "pred_flow"):
            np.testing.assert_allclose(
                np.asarray(out_m[k], np.float32),
                np.asarray(out_s[k], np.float32), rtol=2e-2, atol=2e-2,
                err_msg=f"step {i} key {k}")
        keep_match = (np.asarray(out_m["det_keep"])
                      == np.asarray(out_s["det_keep"])).mean()
        assert keep_match > 0.95, keep_match
    np.testing.assert_allclose(
        np.asarray(carry_m["template"], np.float32),
        np.asarray(carry_s["template"], np.float32), rtol=2e-2, atol=2e-2)


def test_sharded_serve_step_int8c_matches_single_device(rng):
    """The flagship int8c engine shard_mapped over the data mesh == the
    same engine single-device: the pm carry rows are stream-major
    contiguous, so the per-shard Pallas kernels see whole streams and the
    int8 math is bit-identical across the split."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    num_pts = 64
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    mesh = make_mesh()
    b = mesh.devices.size * 2
    calib = np.asarray(
        rng.uniform(0.5, 20.0, (4, num_pts)), np.float32)
    kw = dict(num_pts=num_pts, with_nms=True, precision="int8c",
              pm_tile=32, calib_scans=calib, interpret=True)
    single = make_serve_step_v3(model, variables, cutout_kwargs, **kw)
    sharded = make_serve_step_v3(model, variables, cutout_kwargs,
                                 mesh=mesh, **kw)
    carry_s, carry_m = None, None
    for i in range(2):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (b, num_pts)),
                           jnp.float32)
        carry_s, out_s = single(carry_s, scan)
        carry_m, out_m = sharded(carry_m, scan)
        # int8 template carry must agree exactly; the f32 outputs only up
        # to cross-shard fusion noise
        np.testing.assert_array_equal(
            np.asarray(carry_m["template"]),
            np.asarray(carry_s["template"]), err_msg=f"step {i}")
        for k in ("pred_cls", "pred_flow"):
            np.testing.assert_allclose(
                np.asarray(out_m[k], np.float32),
                np.asarray(out_s[k], np.float32), rtol=2e-2, atol=2e-2,
                err_msg=f"step {i} key {k}")
        keep_match = (np.asarray(out_m["det_keep"])
                      == np.asarray(out_s["det_keep"])).mean()
        assert keep_match > 0.95, keep_match


def test_trainer_mesh_resolves_auto_encode_to_xla(tmp_path):
    """Under a mesh, encode_impl='auto' must resolve to the XLA cutout
    encode (pallas_call has no SPMD rule — it would replicate per chip);
    an explicit 'pallas' and the no-mesh path are left untouched."""
    from planar_optical_flow_tpu.train import tasks
    from planar_optical_flow_tpu.train.trainer import Trainer
    from planar_optical_flow_tpu.utils.logger import RunLogger

    logger = RunLogger({"log_dir": str(tmp_path), "tag": "t"})
    auto_task = tasks.DetectionTask(
        cutout_kwargs={"fixed": True, "encode_impl": "auto"})
    tr = Trainer(logger, {"epoch": 1}, auto_task, mesh=make_mesh(),
                 install_signal_handlers=False)
    assert tr._task.cutout_kwargs["encode_impl"] == "xla"

    explicit = tasks.DetectionTask(
        cutout_kwargs={"fixed": True, "encode_impl": "pallas"})
    tr = Trainer(logger, {"epoch": 1}, explicit, mesh=make_mesh(),
                 install_signal_handlers=False)
    assert tr._task.cutout_kwargs["encode_impl"] == "pallas"

    tr = Trainer(logger, {"epoch": 1}, auto_task,
                 install_signal_handlers=False)
    assert tr._task.cutout_kwargs["encode_impl"] == "auto"


@pytest.mark.slow
def test_context_parallel_gate_matches_dense(rng):
    """Banded-attention gate with the CUTOUT axis sharded over 8 devices
    (ppermute halo exchange) == the dense single-device gate: template,
    z carry and the edge-clamped sim_band all agree (SURVEY §2.11 SP/CP
    row, built)."""
    import numpy as np
    from planar_optical_flow_tpu.infer import fast_gate as fg
    from planar_optical_flow_tpu.parallel import (
        gate_step_context_parallel,
    )

    b, ct, d, z = 2, 64, 96, 16
    window = 11  # hw=5 <= shard size 8
    kernel = rng.normal(0, 0.1, (d, z)).astype(np.float32)
    params = fg.GateParams(
        w=jnp.asarray(kernel), b=jnp.asarray(rng.normal(0, 0.1, z),
                                             jnp.float32),
        alpha=0.4, window_size=window,
    )
    x = jnp.asarray(rng.normal(0, 1, (b, ct, d)), jnp.float32)
    template = jnp.asarray(rng.normal(0, 1, (b, ct, d)), jnp.float32)
    z_t = fg.embed(params, template)

    ref_t, ref_z, ref_sim = fg.gate_step(params, x, template, z_t,
                                         use_pallas=False)
    mesh = make_mesh()
    cp_t, cp_z, cp_sim = gate_step_context_parallel(
        params, x, template, z_t, mesh, axis="data")

    np.testing.assert_allclose(np.asarray(cp_t), np.asarray(ref_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp_z), np.asarray(ref_z),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp_sim), np.asarray(ref_sim),
                               rtol=1e-5, atol=1e-5)

    # shard-size guard: a window too wide for the shard raises
    import pytest as _pytest
    wide = fg.GateParams(w=params.w, b=params.b, alpha=0.4, window_size=19)
    with _pytest.raises(ValueError, match="halo"):
        gate_step_context_parallel(wide, x, template, z_t, mesh,
                                   axis="data")
