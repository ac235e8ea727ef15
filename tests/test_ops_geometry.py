import numpy as np
import jax.numpy as jnp

import planar_optical_flow_tpu.ops as ops
from tests import oracles


def test_laser_phi_matches_drow_geometry():
    phi = ops.get_laser_phi()
    assert phi.shape == (450,)
    np.testing.assert_allclose(phi[-1] - phi[0], np.radians(224.5), rtol=1e-6)
    np.testing.assert_allclose(phi[1] - phi[0], np.radians(0.5), rtol=1e-6)
    np.testing.assert_allclose(phi[0], -phi[-1])


def test_polar_cartesian_roundtrip(rng):
    r = rng.uniform(0.1, 30.0, size=100)
    phi = rng.uniform(-np.pi, np.pi, size=100)
    x, y = ops.rphi_to_xy(r, phi)
    r2, phi2 = ops.xy_to_rphi(x, y)
    np.testing.assert_allclose(np.asarray(r2), r, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(phi2), phi, rtol=1e-5, atol=1e-6)


def test_canonical_roundtrip(rng):
    scan = rng.uniform(0.5, 20.0, size=50)
    phi = oracles.laser_phi()[:50]
    # detections near their beam (the real regime: targets within <1 m of a
    # point) — the polar parametrization wraps for points far behind the beam
    det_r = scan * rng.uniform(0.8, 1.2, size=50)
    det_phi = phi + rng.uniform(-0.3, 0.3, size=50)
    dx, dy = ops.global_to_canonical(scan, phi, det_r, det_phi)
    r2, phi2 = ops.canonical_to_global(scan, phi, dx, dy)
    np.testing.assert_allclose(np.asarray(r2), det_r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(phi2), det_phi, rtol=1e-5, atol=1e-6)
    # scalar spec cross-check
    ex, ey = oracles.canonical_offset(scan[7], phi[7], det_r[7], det_phi[7])
    np.testing.assert_allclose([float(dx[7]), float(dy[7])], [ex, ey], rtol=1e-6)


def test_flow_rotations_match_oracle_and_invert(rng):
    flow = rng.normal(size=(450, 2)).astype(np.float32)
    phi = oracles.laser_phi()
    got = np.asarray(ops.global_to_canonical_flow(flow, phi))
    want = oracles.rotate_flow_to_canonical(flow, phi)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    back = np.asarray(ops.canonical_to_global_flow(got, phi))
    np.testing.assert_allclose(back, flow, rtol=1e-4, atol=1e-6)
    want_back = oracles.rotate_flow_to_global(got, phi)
    np.testing.assert_allclose(back, want_back, rtol=1e-5, atol=1e-6)


def test_flow_rotation_batched(rng):
    flow = rng.normal(size=(3, 450, 2)).astype(np.float32)
    phi = oracles.laser_phi()
    got = np.asarray(ops.global_to_canonical_flow(jnp.asarray(flow), phi))
    for b in range(3):
        np.testing.assert_allclose(
            got[b], oracles.rotate_flow_to_canonical(flow[b], phi),
            rtol=1e-5, atol=1e-6,
        )


def test_phi_rotation_matrix(rng):
    a = 0.37
    m = np.asarray(ops.phi_rotation_matrix(a))
    np.testing.assert_allclose(
        m, [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], rtol=1e-6
    )
    m3 = np.asarray(ops.phi_rotation_matrix(a, is_3d=True))
    assert m3.shape == (3, 3)
    np.testing.assert_allclose(m3[:2, :2], m, rtol=1e-6)
    np.testing.assert_allclose(m3[2], [0, 0, 1], atol=1e-7)
    # batched
    mb = np.asarray(ops.phi_rotation_matrix(np.array([a, -a])))
    assert mb.shape == (2, 2, 2)
    np.testing.assert_allclose(mb[0], m, rtol=1e-6)
