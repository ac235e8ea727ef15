"""Shape/structure smoke tests across the model zoo (cheap, no training)."""

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import (
    FlowUNet,
    FlowUNetAdditive,
    Drow,
    SpatialDrow,
    FlowDrow,
    BoundingBoxRegressor,
    TNet,
    get_model,
    MODEL_REGISTRY,
)

KEY = jax.random.PRNGKey(0)


def test_flow_unet_shapes():
    m = FlowUNet()
    x = jnp.zeros((2, 450, 2))
    v = m.init(KEY, x, x, train=False)
    out = m.apply(v, x, x, train=False)
    assert out.shape == (2, 450, 2)
    # scan2 defaults to scan1
    out1 = m.apply(v, x, train=False)
    assert out1.shape == (2, 450, 2)


def test_flow_unet_additive_shapes():
    m = FlowUNetAdditive()
    x = jnp.zeros((2, 450, 2))
    v = m.init(KEY, x, x, train=False)
    assert m.apply(v, x, x, train=False).shape == (2, 450, 2)


def test_flow_unet_odd_lengths():
    """Encoder/decoder must handle non-power-of-two lengths like 450."""
    m = FlowUNet()
    for p in (450, 225, 100):
        x = jnp.zeros((1, p, 2))
        v = m.init(KEY, x, x, train=False)
        assert m.apply(v, x, x, train=False).shape == (1, p, 2)


def test_drow_shapes():
    m = Drow(pedestrian_only=False)
    x = jnp.zeros((2, 45, 4, 24))
    v = m.init(KEY, x, train=False)
    cls, reg = m.apply(v, x, train=False)
    assert cls.shape == (2, 45, 4)
    assert reg.shape == (2, 45, 2)


def test_spatial_drow_shapes_and_stream_consistency():
    m = SpatialDrow(window_size=5, pedestrian_only=True, alpha=0.5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 45, 3, 24)).astype(np.float32))
    v = m.init(KEY, x, train=False)
    cls, reg, sim = m.apply(v, x, train=False)
    assert cls.shape == (1, 45, 1) and reg.shape == (1, 45, 2)
    assert sim.shape == (1, 45, 5)

    # streaming over the scan axis reproduces the training-mode output
    template = None
    for s in range(x.shape[2]):
        cls_s, reg_s, template, sim_s = m.apply(
            v, x[:, :, s], template, method="stream_step"
        )
    np.testing.assert_allclose(np.asarray(cls_s), np.asarray(cls),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_s), np.asarray(reg),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim_s), np.asarray(sim),
                               rtol=1e-3, atol=1e-4)


def test_flow_drow_shapes_and_frozen_gradients():
    m = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.ones((1, 45, 3, 24)) * 0.1
    cur = jnp.ones((1, 45))
    v = m.init(KEY, x, cur, train=False)
    cls, reg, flow = m.apply(v, x, cur, train=False)
    assert flow.shape == (1, 45, 2)

    def loss(params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, cur, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out[2] ** 2)

    grads = jax.grad(loss)(v["params"])
    det = jax.tree_util.tree_leaves(grads["dr_spaam"])
    head = jax.tree_util.tree_leaves(
        {k: g for k, g in grads.items() if k != "dr_spaam"}
    )
    assert all(float(jnp.abs(g).max()) == 0.0 for g in det), \
        "frozen detector received gradient"
    assert any(float(jnp.abs(g).max()) > 0.0 for g in head), \
        "flow head got no gradient"


def test_bbox_regressor_shapes():
    for in_dim, tgt_dim in ((4, 5), (3, 3)):
        m = BoundingBoxRegressor(input_dim=in_dim, target_dim=tgt_dim)
        x = jnp.zeros((4, 32, in_dim))
        v = m.init(KEY, x, train=False)
        assert m.apply(v, x, train=False).shape == (4, tgt_dim)


def test_tnet_shapes():
    m = TNet(input_dim=3)
    x = jnp.zeros((2, 16, 3))
    v = m.init(KEY, x, train=False)
    assert m.apply(v, x, train=False).shape == (2, 3, 3)


def test_registry_builds_all():
    cfgs = {
        "box_reg": {"type": "box_reg", "input_dim": 4, "target_dim": 5},
        "flow_unet": {"type": "flow_unet"},
        "prototype": {"type": "prototype"},
        "prototype_test": {"type": "prototype_test"},
        "drow": {"type": "drow"},
        "dr-spaam": {"type": "dr-spaam", "window_size": 7},
        "spatial_drow": {"type": "spatial_drow"},
        "flow_drow": {"type": "flow_drow"},
        "fc1d": {"type": "fc1d", "pedestrian_only": True},
        "fc1d_fea": {"type": "fc1d_fea"},
        "fc2d": {"type": "fc2d", "hidden": 64},
    }
    assert set(cfgs) == set(MODEL_REGISTRY)
    for cfg in cfgs.values():
        assert get_model(cfg) is not None

    try:
        get_model({"type": "nope"})
        raise AssertionError("should have raised")
    except NotImplementedError:
        pass


def test_banded_gate_matches_dense():
    """Block-banded attention is numerically the dense masked attention."""
    from planar_optical_flow_tpu.models.spatial_drow import (
        SpatialAttentionGate,
    )

    rng = np.random.default_rng(0)
    b, ct, d = 2, 450, 64
    x = jnp.asarray(rng.normal(size=(b, ct, d)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(b, ct, d)).astype(np.float32))
    dense = SpatialAttentionGate(window_size=11)
    banded = SpatialAttentionGate(window_size=11, banded_chunk=50)
    v = dense.init(KEY, x, t, train=False)
    o1, s1 = dense.apply(v, x, t, train=False)
    o2, s2 = banded.apply(v, x, t, train=False)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-4, atol=1e-4)


def test_banded_gate_full_model_parity(rng):
    """SpatialDrow with banded_chunk produces the same detections."""
    dense_m = SpatialDrow(window_size=5, pedestrian_only=True)
    band_m = SpatialDrow(window_size=5, pedestrian_only=True,
                         banded_chunk=45)
    x = jnp.asarray(rng.normal(size=(1, 450, 2, 16)).astype(np.float32))
    v = dense_m.init(KEY, x, train=False)
    c1, r1, s1 = dense_m.apply(v, x, train=False)
    c2, r2, s2 = band_m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-4, atol=1e-4)


import pytest


@pytest.mark.parametrize("alt_impl", ["taps", "mm3"])
def test_taps_conv_matches_lax_conv(alt_impl):
    """ConvBlock impl="taps" (tap-concat matmul) / "mm3" (per-tap shifted
    matmuls) are numerically the lax convolution with the SAME param
    tree: init under one impl, apply under the other, forward and grads
    agree."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from planar_optical_flow_tpu.models.blocks import ConvBlock

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 56, 16)), jnp.float32)
    conv = ConvBlock(32, 3, impl="conv")
    taps = ConvBlock(32, 3, impl=alt_impl)
    variables = conv.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                taps.init(jax.random.PRNGKey(0), x, train=False)))

    y_conv = conv.apply(variables, x, train=False)
    y_taps = taps.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_taps),
                               rtol=2e-5, atol=2e-5)

    def loss(mod):
        def f(params):
            v = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}
            y, _ = mod.apply(v, x, train=True, mutable=["batch_stats"])
            return jnp.sum(y ** 2)
        return jax.grad(f)(variables["params"])

    g_conv = loss(conv)
    g_taps = loss(taps)
    for a, b in zip(jax.tree_util.tree_leaves(g_conv),
                    jax.tree_util.tree_leaves(g_taps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

    # stride/1x1 blocks fall back to the lax conv under the alt impls
    strided = ConvBlock(32, 3, stride=2, impl=alt_impl)
    v2 = strided.init(jax.random.PRNGKey(1), x, train=False)
    ref = ConvBlock(32, 3, stride=2, impl="conv")
    np.testing.assert_allclose(
        np.asarray(strided.apply(v2, x, train=False)),
        np.asarray(ref.apply(v2, x, train=False)), rtol=1e-6, atol=1e-6)


def test_taps_impl_model_level_parity():
    """Process-default conv_impl="taps" leaves whole-model outputs
    unchanged (FlowUNet mixes stride-2 encoders, stride-1 decoders and
    1x1 heads — covers every ConvBlock fallback branch)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from planar_optical_flow_tpu.models import FlowUNet
    from planar_optical_flow_tpu.models.blocks import set_default_conv_impl

    rng = np.random.default_rng(1)
    s1 = jnp.asarray(rng.uniform(1, 10, (2, 64, 2)), jnp.float32)
    s2 = jnp.asarray(rng.uniform(1, 10, (2, 64, 2)), jnp.float32)
    try:
        set_default_conv_impl("conv")
        model = FlowUNet()
        variables = model.init(jax.random.PRNGKey(0), s1, s2, train=False)
        y_conv = model.apply(variables, s1, s2, train=False)
        set_default_conv_impl("taps")
        y_taps = model.apply(variables, s1, s2, train=False)
    finally:
        set_default_conv_impl("conv")
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_taps),
                               rtol=2e-4, atol=2e-4)
