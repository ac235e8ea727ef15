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
