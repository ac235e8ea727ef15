"""Parity: pallas cutout kernel vs ops.cutout.scans_to_cutout."""

import numpy as np
import pytest
import jax.numpy as jnp

from planar_optical_flow_tpu.ops.cutout import scans_to_cutout, area_s_for
from planar_optical_flow_tpu.ops.geometry import get_laser_phi
from planar_optical_flow_tpu.ops.pallas.cutout_kernel import cutout_fused


@pytest.mark.parametrize("area_mode", [False, True])
def test_cutout_fused_matches_matmul_path(rng, area_mode):
    num_pts, c = 64, 16
    phi = get_laser_phi(num_pts=num_pts)
    scans = jnp.asarray(rng.uniform(0.3, 28.0, (3, num_pts)), jnp.float32)
    kw = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
              num_cutout_pts=c, padding_val=29.99)
    if area_mode:
        kw.update(area_mode=True,
                  area_s=area_s_for(1.0, c))
    ref = scans_to_cutout(scans[:, None, :], phi, gather_mode="matmul",
                          **kw)[:, :, 0, :]
    got = cutout_fused(scans, num_cutout_pts=c, window_width=1.0,
                       window_depth=0.5, padding_val=29.99, centered=True,
                       area_mode=area_mode, interpret=True)
    got = got.reshape(3, num_pts, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("area_mode", [False, True])
def test_detection_task_pallas_encode_matches_xla(rng, area_mode):
    """DetectionTask cutout encode: encode_impl="pallas_interpret" must
    match the XLA matmul path over a temporal scan stack, including the
    non-8-aligned beam count (pad + p_valid)."""
    from planar_optical_flow_tpu.train import tasks

    num_pts, c, b, s = 60, 16, 2, 3  # 60 % 8 != 0 exercises the padding
    kw = dict(fixed=True, centered=True, window_width=1.0,
              window_depth=0.5, num_cutout_pts=c, padding_val=29.99,
              area_mode=area_mode, gather_mode="matmul")
    scans = jnp.asarray(rng.uniform(0.3, 28.0, (b, s, num_pts)),
                        jnp.float32)
    t_xla = tasks.DetectionTask(
        cutout_kwargs=dict(kw, encode_impl="xla"), num_pts=num_pts)
    t_pl = tasks.DetectionTask(
        cutout_kwargs=dict(kw, encode_impl="pallas_interpret"),
        num_pts=num_pts)
    ref = t_xla._encode(scans)
    got = t_pl._encode(scans)
    assert got.shape == ref.shape == (b, num_pts, s, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_detection_task_auto_encode_falls_back_on_cpu(rng):
    """encode_impl="auto" on the CPU backend must take the XLA path (the
    kernel only runs compiled on accelerators)."""
    from planar_optical_flow_tpu.train import tasks

    kw = dict(fixed=True, centered=True, window_width=1.0,
              window_depth=0.5, num_cutout_pts=8, padding_val=29.99)
    scans = jnp.asarray(rng.uniform(0.3, 28.0, (2, 2, 48)), jnp.float32)
    t_auto = tasks.DetectionTask(cutout_kwargs=dict(kw), num_pts=48)
    t_xla = tasks.DetectionTask(cutout_kwargs=dict(kw, encode_impl="xla"),
                                num_pts=48)
    np.testing.assert_array_equal(np.asarray(t_auto._encode(scans)),
                                  np.asarray(t_xla._encode(scans)))
