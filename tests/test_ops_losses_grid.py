import numpy as np
import jax
import jax.numpy as jnp

import planar_optical_flow_tpu.ops as ops
from tests import oracles


def test_polar_grid_matches_oracle(rng):
    scans = rng.uniform(0.0, 35.0, size=(2, 30)).astype(np.float32)
    kwargs = dict(min_range=0.0, max_range=30.0, range_bin_size=1.0,
                  tsdf_clip=1.0, normalize=True)
    got = np.asarray(ops.scans_to_polar_grid(scans, **kwargs))
    want = oracles.polar_grid_loop(scans, **kwargs)
    assert got.shape == want.shape == (2, 31, 30)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_polar_grid_no_tsdf_unnormalized(rng):
    scans = rng.uniform(0.0, 30.0, size=(1, 20)).astype(np.float32)
    kwargs = dict(range_bin_size=0.5, tsdf_clip=0.0, normalize=False)
    got = np.asarray(ops.scans_to_polar_grid(scans, **kwargs))
    want = oracles.polar_grid_loop(scans, **kwargs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_epe_loss_basic(rng):
    pred = rng.normal(size=(4, 450, 2)).astype(np.float32)
    tgt = rng.normal(size=(4, 450, 2)).astype(np.float32)
    got = float(ops.epe_loss(pred, tgt))
    want = np.mean(np.linalg.norm(pred - tgt, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_epe_loss_masked(rng):
    pred = rng.normal(size=(2, 450, 2)).astype(np.float32)
    tgt = rng.normal(size=(2, 450, 2)).astype(np.float32)
    mask = (rng.uniform(size=(2, 450)) > 0.5).astype(np.float32)
    got = float(ops.epe_loss(pred, tgt, mask))
    err = np.linalg.norm(pred - tgt, axis=-1)
    want = err[mask == 1.0].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_epe_aae_metric(rng):
    pred = rng.normal(size=(3, 450, 2)).astype(np.float32)
    tgt = rng.normal(size=(3, 450, 2)).astype(np.float32)
    epe, aae = ops.epe_aae(pred, tgt)
    want_epe = np.mean(np.linalg.norm(pred - tgt, axis=-1), axis=-1)
    want_aae = np.mean(
        np.abs(np.arctan2(pred[..., 0], pred[..., 1])
               - np.arctan2(tgt[..., 0], tgt[..., 1])), axis=-1
    ) * 180 / np.pi
    np.testing.assert_allclose(np.asarray(epe), want_epe, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aae), want_aae, rtol=1e-5)


def test_focal_loss_gamma0_is_cross_entropy(rng):
    logits = rng.normal(size=(64, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=64)
    got = float(ops.focal_loss(logits, jnp.asarray(labels), gamma=0.0))
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    want = -np.mean(np.asarray(logp)[np.arange(64), labels])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_loss_gamma_downweights_easy(rng):
    logits = np.zeros((8, 4), dtype=np.float32)
    logits[:, 0] = 5.0  # very confident class 0
    labels = np.zeros(8, dtype=np.int32)
    easy0 = float(ops.focal_loss(logits, jnp.asarray(labels), gamma=0.0))
    easy2 = float(ops.focal_loss(logits, jnp.asarray(labels), gamma=2.0))
    assert easy2 < easy0 * 0.1


def test_binary_focal_gamma0_is_bce(rng):
    p = rng.uniform(0.05, 0.95, size=128).astype(np.float32)
    t = (rng.uniform(size=128) > 0.5).astype(np.float32)
    got = float(ops.binary_focal_loss(p, t, gamma=0.0, alpha=-1.0))
    want = -np.mean(t * np.log(p) + (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_box_regression_loss_values(rng):
    pred = rng.normal(size=(16, 5)).astype(np.float32)
    tgt = rng.normal(size=(16, 5)).astype(np.float32)
    got = float(ops.box_regression_loss(pred, tgt, alpha=0.5))
    lz = np.mean(np.abs(pred[:, 0] - tgt[:, 0]))
    ld = np.mean(np.sum(np.abs(pred[:, 1:-1] - tgt[:, 1:-1]), axis=1))
    lo = np.mean(np.abs(pred[:, -1] - tgt[:, -1]))
    np.testing.assert_allclose(got, lz + ld + 0.5 * lo, rtol=1e-5)

    pred3 = pred[:, :3]
    tgt3 = tgt[:, :3]
    got3 = float(ops.box_regression_loss(pred3, tgt3, alpha=0.5))
    ld3 = np.mean(np.sum(np.abs(pred3[:, :-1] - tgt3[:, :-1]), axis=1))
    lo3 = np.mean(np.abs(pred3[:, -1] - tgt3[:, -1]))
    np.testing.assert_allclose(got3, ld3 + 0.5 * lo3, rtol=1e-5)


def test_detection_loss_components(rng):
    P = 450
    pred_cls = rng.normal(size=(2, P, 1)).astype(np.float32)
    pred_reg = rng.normal(size=(2, P, 2)).astype(np.float32)
    tgt_cls = (rng.uniform(size=(2, P)) > 0.9).astype(np.int32)
    tgt_reg = rng.normal(size=(2, P, 2)).astype(np.float32)
    cls_l, reg_l, fg = ops.detection_loss(pred_cls, pred_reg, tgt_cls, tgt_reg,
                                          pedestrian_only=True)
    np.testing.assert_allclose(float(fg), tgt_cls.mean(), rtol=1e-5)
    err = np.linalg.norm(pred_reg - tgt_reg, axis=-1)
    want_reg = err[tgt_cls == 1].mean()
    np.testing.assert_allclose(float(reg_l), want_reg, rtol=1e-5)
    assert float(cls_l) > 0


def test_focal_loss_alpha_weighting(rng):
    logits = rng.normal(size=(32, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=32)
    alpha = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    got = float(ops.focal_loss(logits, jnp.asarray(labels), gamma=0.0,
                               alpha=alpha))
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    want = -np.mean(alpha[labels] * logp[np.arange(32), labels])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_binary_focal_alpha(rng):
    p = rng.uniform(0.05, 0.95, size=64).astype(np.float32)
    t = (rng.uniform(size=64) > 0.5).astype(np.float32)
    got = float(ops.binary_focal_loss(p, t, gamma=0.0, alpha=0.25))
    want = -np.mean(0.25 * t * np.log(p) + 0.75 * (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_aae_wrapped_variant():
    """Legacy AAE reproduces the reference's unwrapped-angle behavior
    (eval_utils.py:131: ~360 deg across the branch cut); the wrapped
    variant reports the true small error."""
    from planar_optical_flow_tpu.ops.losses import epe_aae

    # two nearly identical flows straddling the atan2 branch cut
    pred = jnp.asarray([[[1e-3, -1.0]]])    # angle ~ pi (just below)
    target = jnp.asarray([[[-1e-3, -1.0]]])  # angle ~ -pi (just above)
    _, aae_legacy = epe_aae(pred, target)
    _, aae_wrapped = epe_aae(pred, target, wrap_angles=True)
    assert float(aae_legacy[0]) > 350.0   # parity-faithful bug
    assert float(aae_wrapped[0]) < 1.0    # fixed variant
