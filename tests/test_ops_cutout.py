import numpy as np
import jax

import planar_optical_flow_tpu.ops as ops
from planar_optical_flow_tpu.ops.cutout import area_s_for
from tests import oracles


def _scans(rng, num_scans=3, num_pts=450):
    # smooth-ish range profile with jumps, plus some out-of-range returns
    base = 5.0 + 3.0 * np.sin(np.linspace(0, 6, num_pts))
    scans = base[None, :] + rng.normal(scale=0.1, size=(num_scans, num_pts))
    scans[:, 100:110] = 29.99
    scans[:, 200:205] = 0.4  # very close -> wide window, exercises area mode
    return scans.astype(np.float32)


def test_cutout_matches_oracle_point_mode(rng):
    scans = _scans(rng)
    phi = oracles.laser_phi()
    got = np.asarray(ops.scans_to_cutout(scans, phi, num_cutout_pts=24))
    want, _ = oracles.cutout_loop(scans, phi, num_cutout_pts=24)
    assert got.shape == (450, 3, 24)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cutout_matches_oracle_area_mode(rng):
    scans = _scans(rng)
    phi = oracles.laser_phi()
    want, s_area = oracles.cutout_loop(
        scans, phi, num_cutout_pts=24, area_mode=True,
        window_width=1.0, window_depth=0.5,
    )
    assert s_area > 1, "test data must trigger area mode"
    got = np.asarray(
        ops.scans_to_cutout(
            scans, phi, num_cutout_pts=24, area_mode=True,
            window_width=1.0, window_depth=0.5, area_s=s_area,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cutout_fixed_and_uncentered(rng):
    scans = _scans(rng)
    phi = oracles.laser_phi()
    got = np.asarray(
        ops.scans_to_cutout(scans, phi, fixed=True, centered=False,
                            num_cutout_pts=16)
    )
    want, _ = oracles.cutout_loop(scans, phi, fixed=True, centered=False,
                                  num_cutout_pts=16)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cutout_stride(rng):
    scans = _scans(rng)
    phi = oracles.laser_phi()
    got = np.asarray(ops.scans_to_cutout(scans, phi, stride=2,
                                         num_cutout_pts=16))
    want, _ = oracles.cutout_loop(scans, phi, stride=2, num_cutout_pts=16)
    assert got.shape == (225, 3, 16)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_cutout_batched_and_jitted(rng):
    scans = np.stack([_scans(rng), _scans(rng)])  # (2, 3, 450)
    phi = oracles.laser_phi()

    fn = jax.jit(
        lambda s: ops.scans_to_cutout(s, phi, num_cutout_pts=24,
                                      area_mode=True, window_width=1.0,
                                      window_depth=0.5, area_s=4)
    )
    got = np.asarray(fn(scans))
    assert got.shape == (2, 450, 3, 24)
    single = np.asarray(
        ops.scans_to_cutout(scans[1], phi, num_cutout_pts=24, area_mode=True,
                            window_width=1.0, window_depth=0.5, area_s=4)
    )
    # jit fusion reorders the f32 index math slightly vs the eager path
    np.testing.assert_allclose(got[1], single, rtol=1e-3, atol=1e-3)


def test_area_s_bound_covers_drow_configs():
    # dr_spaam.yaml: window_width 1.0, 56 cutout pts
    assert area_s_for(1.0, 56) >= 1
    # worst case must be >= any data-driven factor for in-range scans
    assert area_s_for(1.66, 48) <= 10


def test_cutout_normalized_range():
    """Centered cutouts are confined to [-1, 1] by the depth clamp."""
    rng = np.random.default_rng(3)
    scans = _scans(rng)
    phi = oracles.laser_phi()
    ct = np.asarray(ops.scans_to_cutout(scans, phi))
    assert ct.min() >= -1.0 - 1e-5 and ct.max() <= 1.0 + 1e-5


def test_cutout_area_fast_close_to_exact(rng):
    """The cumsum box-filter area mode tracks the reference oversampling
    within interpolation tolerance on realistic scans."""
    scans = _scans(rng)
    phi = oracles.laser_phi()
    kw = dict(num_cutout_pts=24, window_width=1.0, window_depth=0.5)
    exact = np.asarray(
        ops.scans_to_cutout(scans, phi, area_mode=True, area_s=9, **kw)
    )
    fast = np.asarray(
        ops.scans_to_cutout(scans, phi, area_mode=True, area_fast=True, **kw)
    )
    # identical where area mode is inactive; close where active
    diff = np.abs(exact - fast)
    assert np.median(diff) < 1e-3
    assert np.mean(diff) < 0.05
    assert np.quantile(diff, 0.95) < 0.35


def test_cutout_bf16_model_path(rng):
    """Streaming with compute_dtype=bfloat16 produces outputs close to f32."""
    import jax.numpy as jnp
    from planar_optical_flow_tpu.models import SpatialDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_stream_step, cast_variables,
    )

    model = SpatialDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    ck = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
              num_cutout_pts=16, padding_val=29.99, area_mode=False)
    scan = jnp.asarray(np.random.default_rng(0).uniform(0.5, 20.0, (1, 450)),
                       dtype=jnp.float32)

    step32 = make_stream_step(model, ck, donate_template=False)
    _, out32 = step32(v, None, scan)
    step16 = make_stream_step(model, ck, donate_template=False,
                              compute_dtype=jnp.bfloat16)
    _, out16 = step16(cast_variables(v, jnp.bfloat16), None, scan)
    assert out16["pred_cls"].dtype == jnp.float32
    d = np.abs(np.asarray(out32["pred_cls"]) - np.asarray(out16["pred_cls"]))
    assert d.mean() < 0.05


def test_cutout_matmul_mode_parity(rng):
    """The MXU one-hot sampling path matches the gather path to f32
    tolerance, in both interp and area modes."""
    scans = _scans(rng)
    phi = oracles.laser_phi()
    kw = dict(num_cutout_pts=24, window_width=1.0, window_depth=0.5)
    g = np.asarray(ops.scans_to_cutout(scans, phi, **kw))
    m = np.asarray(ops.scans_to_cutout(scans, phi, gather_mode="matmul", **kw))
    np.testing.assert_allclose(m, g, atol=2e-3)

    ga = np.asarray(
        ops.scans_to_cutout(scans, phi, area_mode=True, area_fast=True, **kw)
    )
    ma = np.asarray(
        ops.scans_to_cutout(scans, phi, area_mode=True, gather_mode="matmul",
                            **kw)
    )
    np.testing.assert_allclose(ma, ga, atol=2e-3)


def test_cutout_matmul_mode_with_stride(rng):
    scans = _scans(rng)
    phi = oracles.laser_phi()
    kw = dict(num_cutout_pts=16, window_width=1.0, window_depth=0.5, stride=2)
    g = np.asarray(ops.scans_to_cutout(scans, phi, **kw))
    m = np.asarray(ops.scans_to_cutout(scans, phi, gather_mode="matmul", **kw))
    assert m.shape == (225, 3, 16)
    np.testing.assert_allclose(m, g, atol=2e-3)
