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
