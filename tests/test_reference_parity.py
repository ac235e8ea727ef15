"""DIRECT numerical parity against the reference implementation.

These tests import the actual reference code (numpy ops, torch models on
CPU) from ``/root/reference`` and compare it against this framework — ops on
identical inputs, models with this repo's parameters mapped into the
reference's torch modules. They are the executable version of PARITY.md:
"same math" is asserted, not argued. All tests skip cleanly when the
reference checkout is absent (see ``tests/reference_loader.py``).

Reference citations: ops ``src/utils/utils.py``, models
``src/depracted/model/{prototype,dr_spaam,loss_utils}.py`` and
``src/model/box_regression.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.reference_loader import (
    reference_available,
    load_reference,
    conv_block_from_seq,
    conv1d_to_dense,
    dense_block_from_fc,
    randomize_bn_stats,
    merge_tree,
    t2n,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


def _jnp():
    import jax.numpy as jnp

    return jnp


def _torch():
    import torch

    return torch


# ==========================================================================
# ops: numpy reference functions vs this repo's jnp ops
# ==========================================================================


def test_geometry_ops_match_reference(rng):
    ref = load_reference("src.utils.utils")
    from planar_optical_flow_tpu import ops

    np.testing.assert_allclose(
        np.asarray(ops.get_laser_phi()), ref.get_laser_phi(), rtol=1e-6)

    r = rng.uniform(0.5, 25.0, 450).astype(np.float32)
    phi = ref.get_laser_phi().astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(ops.rphi_to_xy(r, phi)), ref.rphi_to_xy(r, phi), rtol=1e-5)

    x, y = ref.rphi_to_xy(r, phi)
    np.testing.assert_allclose(
        np.asarray(ops.xy_to_rphi(x, y)), ref.xy_to_rphi(x, y),
        rtol=1e-5, atol=1e-6)

    dx = rng.normal(0, 0.3, 450).astype(np.float32)
    dy = rng.normal(0, 0.3, 450).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.canonical_to_global(r, phi, dx, dy)),
        ref.canonical_to_global(r, phi, dx, dy), rtol=1e-5, atol=1e-6)

    det_r = rng.uniform(1.0, 20.0, 450).astype(np.float32)
    det_phi = (phi + rng.normal(0, 0.05, 450)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.global_to_canonical(r, phi, det_r, det_phi)),
        ref.global_to_canonical(r, phi, det_r, det_phi),
        rtol=1e-4, atol=1e-5)

    flow = rng.normal(0, 1.0, (450, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.global_to_canonical_flow(flow, phi)),
        ref.global_to_canonical_flow(flow, phi), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ops.canonical_to_global_flow(flow, phi)),
        ref.canonical_to_global_flow(flow, phi), rtol=1e-5, atol=1e-6)


def test_regression_targets_match_reference(rng):
    ref = load_reference("src.utils.utils")
    from planar_optical_flow_tpu import ops

    phi = ref.get_laser_phi().astype(np.float32)
    scan = rng.uniform(0.5, 25.0, 450).astype(np.float32)

    def rphi_at(i, dr):
        return np.array([scan[i] + dr, phi[i]], dtype=np.float32)

    wcs = [rphi_at(40, 0.05), rphi_at(300, -0.1)]
    was = [rphi_at(120, 0.02)]
    wps = [rphi_at(200, 0.0), rphi_at(430, 0.08)]

    ref_cls, ref_reg = ref.get_regression_target(scan, phi, wcs, was, wps)

    dets = np.stack(wcs + was + wps)
    radius = np.array([0.6, 0.6, 0.4, 0.35, 0.35], dtype=np.float32)
    label = np.array([1, 1, 2, 3, 3], dtype=np.int32)
    got_cls, got_reg = ops.regression_targets(scan, phi, dets, radius, label)

    np.testing.assert_array_equal(np.asarray(got_cls), ref_cls)
    np.testing.assert_allclose(np.asarray(got_reg), ref_reg,
                               rtol=1e-4, atol=1e-5)

    # pedestrian-only variant (binary labels)
    ref_cls_p, ref_reg_p = ref.get_regression_target(
        scan, phi, wcs, was, wps, pedestrian_only=True)
    dets_p = np.stack(wps)
    got_cls_p, got_reg_p = ops.regression_targets(
        scan, phi, dets_p,
        np.full(len(wps), 0.35, np.float32),
        np.ones(len(wps), np.int32))
    np.testing.assert_array_equal(np.asarray(got_cls_p), ref_cls_p)
    np.testing.assert_allclose(np.asarray(got_reg_p), ref_reg_p,
                               rtol=1e-4, atol=1e-5)


def test_flow_targets_and_odometry_match_reference(rng):
    ref = load_reference("src.utils.utils")
    from planar_optical_flow_tpu import ops

    phi = ref.get_laser_phi().astype(np.float32)
    scan = rng.uniform(0.5, 25.0, 450).astype(np.float32)
    odom0 = np.array([1.0, -2.0, 0.3], dtype=np.float32)
    odom1 = np.array([1.2, -1.9, 0.35], dtype=np.float32)

    for canon in (False, True):
        np.testing.assert_allclose(
            np.asarray(ops.flow_from_pose_pair(scan, phi, odom0, odom1,
                                               to_canonical=canon)),
            ref.get_flow_target(scan, phi, odom0, odom1, to_canonical=canon),
            rtol=1e-4, atol=1e-5)

    xy = np.stack(ref.rphi_to_xy(scan, phi), axis=1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.displacement_from_odometry(xy, odom0, odom1)),
        ref.get_displacement_from_odometry(xy, odom0, odom1),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ops.velocity_from_odometry(xy, odom0, odom1)),
        ref.get_velocity_from_odometry(xy, odom0, odom1),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
             num_cutout_pts=56, area_mode=True),
        dict(stride=2, centered=False),
        dict(num_cutout_pts=24, window_width=2.0),
    ],
    ids=["default", "drspaam-area", "stride2-uncentered", "wide24"],
)
def test_scans_to_cutout_matches_reference(rng, kwargs):
    # Tolerance note: the reference multiplies f32 ``half_alpha`` by an
    # int64 ``arange``, promoting its interpolation indices to float64;
    # this op computes them in f32 (the on-device dtype). The index jitter
    # moves lerp weights by ~1 ulp-of-450, worth up to ~2e-3 on normalized
    # cutout values at steep range edges — precision, not semantics.
    ref = load_reference("src.utils.utils")
    from planar_optical_flow_tpu import ops

    phi = ref.get_laser_phi().astype(np.float32)
    scans = rng.uniform(0.5, 29.0, (3, 450)).astype(np.float32)

    ours_kwargs = dict(kwargs)
    if kwargs.get("area_mode"):
        # The reference picks its area oversampling factor from the DATA
        # (``s_area = ceil(max-window-beams / num_cutout_pts)``,
        # ``utils.py:303-308``) — the same point's cutout changes with
        # batch composition. This op's default is the static geometric
        # worst case (jit requires static shapes; also batch-invariant).
        # For exact parity, hand it the reference's realized factor.
        import math

        half_alpha = np.arctan(
            0.5 * kwargs["window_width"] / np.maximum(scans, 1e-2))
        span = 2.0 * half_alpha / (phi[1] - phi[0])
        ours_kwargs["area_s"] = int(
            math.ceil(span.max() / kwargs["num_cutout_pts"]))

    want = ref.scans_to_cutout(scans, phi, **kwargs)
    got = np.asarray(ops.scans_to_cutout(scans, phi, **ours_kwargs))
    np.testing.assert_allclose(got, want, atol=2e-3)

    # the MXU one-hot sampling path against the same oracle
    got_mm = np.asarray(
        ops.scans_to_cutout(scans, phi, gather_mode="matmul", **ours_kwargs))
    if kwargs.get("area_mode"):
        # matmul area mode is the documented box-filter form (a one-hot
        # BAND summed on the MXU) rather than the reference's s-times
        # rint-oversampled mean — identical taps except where the band's
        # rint boundary disagrees with the oversample set (a handful of
        # taps at window-width transitions)
        diff = np.abs(got_mm - want)
        assert (diff > 2e-3).mean() < 1e-3, (diff > 2e-3).mean()
        assert np.quantile(diff, 0.999) < 2e-3
    else:
        np.testing.assert_allclose(got_mm, want, atol=2e-3)


def test_polar_grid_matches_reference(rng):
    ref = load_reference("src.utils.utils")
    from planar_optical_flow_tpu import ops

    scans = rng.uniform(0.5, 29.0, (2, 64)).astype(np.float32)
    for kw in (dict(), dict(tsdf_clip=0.0), dict(normalize=False),
               dict(range_bin_size=0.5, tsdf_clip=2.0)):
        np.testing.assert_allclose(
            np.asarray(ops.scans_to_polar_grid(scans, **kw)),
            ref.scans_to_polar_grid(scans, **kw), rtol=1e-5, atol=1e-6)


def test_nms_matches_reference(rng):
    ref = load_reference("src.utils.utils")
    from planar_optical_flow_tpu import ops

    phi = ref.get_laser_phi().astype(np.float32)
    scan = rng.uniform(0.5, 25.0, 450).astype(np.float32)
    pred_cls = rng.uniform(0.0, 1.0, (450, 1)).astype(np.float32)
    pred_reg = rng.normal(0, 0.3, (450, 2)).astype(np.float32)

    want_xys, want_cls, want_inst = ref.nms_predicted_center(
        scan, phi, pred_cls, pred_reg)

    for method in ("fori", "while"):
        xys, cls_sorted, keep, inst = ops.nms_predicted_center(
            scan, phi, pred_cls, pred_reg, method=method)
        keep = np.asarray(keep)
        np.testing.assert_allclose(np.asarray(xys)[keep], want_xys,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cls_sorted)[keep], want_cls,
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(inst), want_inst)


def test_losses_match_reference(rng):
    torch = _torch()
    loss_utils = load_reference("src.depracted.model.loss_utils")
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    prototype_mod = load_reference("src.depracted.model.prototype")
    box_reg_mod = load_reference("src.model.box_regression")
    from planar_optical_flow_tpu import ops

    # multi-class focal (and its gamma=0 == cross-entropy case)
    logits = rng.normal(0, 2.0, (64, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 64)
    for gamma in (0.0, 0.5, 2.0):
        want = loss_utils.FocalLoss(gamma=gamma)(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()
        got = float(ops.focal_loss(logits, labels, gamma=gamma))
        assert abs(got - want) < 1e-5, (gamma, got, want)

    # binary focal on probabilities
    probs = rng.uniform(0.02, 0.98, 128).astype(np.float32)
    targets = (rng.uniform(size=128) < 0.3).astype(np.float32)
    for gamma, alpha in ((2.0, -1.0), (1.0, 0.25), (0.0, -1.0)):
        want = loss_utils.binary_focal_loss(
            torch.from_numpy(probs), torch.from_numpy(targets),
            gamma=gamma, alpha=alpha).item()
        got = float(ops.binary_focal_loss(probs, targets, gamma=gamma,
                                          alpha=alpha))
        assert abs(got - want) < 1e-5, (gamma, alpha, got, want)

    # flow losses: prototype (plain mean EPE) and dr-spaam (masked)
    pred = rng.normal(0, 1.0, (4, 45, 2)).astype(np.float32)
    target = rng.normal(0, 1.0, (4, 45, 2)).astype(np.float32)
    mask = (rng.uniform(size=(4, 45)) < 0.5).astype(np.float32)

    want, _ = prototype_mod.flow_loss(torch.from_numpy(pred),
                                      torch.from_numpy(target))
    assert abs(float(ops.epe_loss(pred, target)) - want.item()) < 1e-5

    want = dr_spaam_mod.flow_loss(torch.from_numpy(pred),
                                  torch.from_numpy(target),
                                  mask=torch.from_numpy(mask))
    got = float(ops.epe_loss(pred, target, mask=mask))
    assert abs(got - want.item()) < 1e-5

    # box regression L1 (3- and 5-dim)
    for d in (3, 5):
        p = rng.normal(0, 1.0, (16, d)).astype(np.float32)
        t = rng.normal(0, 1.0, (16, d)).astype(np.float32)
        want = box_reg_mod.regression_loss2(
            torch.from_numpy(p), torch.from_numpy(t)).item()
        got = float(ops.box_regression_loss(p, t))
        assert abs(got - want) < 1e-5, (d, got, want)


# ==========================================================================
# models: this repo's params mapped into the reference torch modules
# ==========================================================================


def _apply_eval(model, variables, *args, **kwargs):
    out = model.apply(variables, *args, train=False, **kwargs)
    return out


def _init_vars(model, *args, **kwargs):
    """init as a plain nested dict of numpy arrays (mutable for mapping)."""
    import jax
    import flax

    variables = model.init(jax.random.PRNGKey(0), *args, train=False,
                           **kwargs)
    return flax.core.unfreeze(jax.tree_util.tree_map(np.asarray, variables))


def _fill_conv_stack(params, stats, base_path, torch_blocks):
    """Map a reference nn.Sequential of _conv3x3 sub-Sequentials onto a
    ConvStack (``ConvBlock_i`` children)."""
    for i, seq in enumerate(torch_blocks):
        p, s = conv_block_from_seq(seq)
        merge_tree(params, base_path + (f"ConvBlock_{i}", "Conv_0"),
                   p["Conv_0"])
        merge_tree(params, base_path + (f"ConvBlock_{i}", "BatchNorm_0"),
                   p["BatchNorm_0"])
        merge_tree(stats, base_path + (f"ConvBlock_{i}", "BatchNorm_0"),
                   s["BatchNorm_0"])


def _map_drow_params(ref_model, variables):
    """Fill a Drow/SpatialDrow variable tree from a reference (Spatial)DROW."""
    params = variables["params"]
    stats = variables["batch_stats"]

    _fill_conv_stack(params, stats, ("backbone", "block1"),
                     list(ref_model.conv_block_1))
    _fill_conv_stack(params, stats, ("backbone", "block2"),
                     list(ref_model.conv_block_2))
    _fill_conv_stack(params, stats, ("head", "block3"),
                     list(ref_model.conv_block_3))
    _fill_conv_stack(params, stats, ("head", "block4"),
                     list(ref_model.conv_block_4))
    merge_tree(params, ("head", "cls"), conv1d_to_dense(ref_model.conv_cls))
    merge_tree(params, ("head", "reg"), conv1d_to_dense(ref_model.conv_reg))

    if hasattr(ref_model, "gate"):
        # full-width conv (128, 256, n_pts) == dense over the flat (L*C)
        # feature in (l, c) row order
        p, s = conv_block_from_seq(list(ref_model.gate.conv))
        w = p["Conv_0"]["kernel"]  # (n_pts, 256, 128)
        merge_tree(params, ("gate", "embed"),
                   {"kernel": w.reshape(-1, w.shape[-1]),
                    "bias": p["Conv_0"]["bias"]})
        merge_tree(params, ("gate", "embed_bn"), p["BatchNorm_0"])
        merge_tree(stats, ("gate", "embed_bn"), s["BatchNorm_0"])
    return variables


def test_drow_matches_reference(rng):
    torch = _torch()
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    import jax
    from planar_optical_flow_tpu.models import Drow

    torch.manual_seed(0)
    ref_model = dr_spaam_mod.DROW(num_pts=48).eval()
    randomize_bn_stats(ref_model)

    x = rng.uniform(-1.0, 1.0, (2, 8, 2, 48)).astype(np.float32)
    with torch.no_grad():
        want_cls, want_reg = ref_model(torch.from_numpy(x))

    model = Drow()
    variables = _map_drow_params(ref_model,
                                 _init_vars(model, _jnp().asarray(x)))

    got_cls, got_reg = _apply_eval(model, variables, _jnp().asarray(x))
    np.testing.assert_allclose(np.asarray(got_cls), t2n(want_cls),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_reg), t2n(want_reg),
                               rtol=1e-3, atol=1e-3)


def test_spatial_drow_matches_reference(rng):
    torch = _torch()
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    import jax
    from planar_optical_flow_tpu.models import SpatialDrow

    torch.manual_seed(1)
    ref_model = dr_spaam_mod.SpatialDROW(
        num_pts=48, alpha=0.5, window_size=7).eval()
    randomize_bn_stats(ref_model, seed=1)

    x = rng.uniform(-1.0, 1.0, (2, 12, 3, 48)).astype(np.float32)
    with torch.no_grad():
        want_cls, want_reg, want_sim = ref_model(torch.from_numpy(x))

    model = SpatialDrow(alpha=0.5, window_size=7)
    variables = _map_drow_params(ref_model,
                                 _init_vars(model, _jnp().asarray(x)))

    got_cls, got_reg, got_sim = _apply_eval(model, variables,
                                            _jnp().asarray(x))
    np.testing.assert_allclose(np.asarray(got_cls), t2n(want_cls),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_reg), t2n(want_reg),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_sim), t2n(want_sim),
                               rtol=1e-3, atol=2e-3)


def test_spatial_drow_streaming_matches_reference_testing_branch(rng):
    """The stateful streaming step (template carried between calls) against
    the reference ``testing=True`` branch (``dr_spaam.py:239-250``)."""
    torch = _torch()
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    import jax
    from planar_optical_flow_tpu.models import SpatialDrow

    torch.manual_seed(2)
    ref_model = dr_spaam_mod.SpatialDROW(
        num_pts=48, alpha=0.5, window_size=7).eval()
    randomize_bn_stats(ref_model, seed=2)

    scans = rng.uniform(-1.0, 1.0, (3, 1, 12, 48)).astype(np.float32)

    model = SpatialDrow(alpha=0.5, window_size=7)
    jnp = _jnp()
    variables = _map_drow_params(
        ref_model, _init_vars(model, jnp.asarray(scans[0][:, :, None, :])))

    fea_template = None
    template = None
    for t in range(scans.shape[0]):
        x_t = torch.from_numpy(scans[t][:, :, None, :])
        with torch.no_grad():
            want_cls, want_reg, fea_template, want_sim = ref_model(
                x_t, testing=True, fea_template=fea_template)

        got_cls, got_reg, template, got_sim = model.apply(
            variables, jnp.asarray(scans[t]), template,
            method=SpatialDrow.stream_step)
        np.testing.assert_allclose(np.asarray(got_cls), t2n(want_cls),
                                   rtol=1e-3, atol=1e-3, err_msg=f"step {t}")
        np.testing.assert_allclose(np.asarray(got_reg), t2n(want_reg),
                                   rtol=1e-3, atol=1e-3, err_msg=f"step {t}")
        np.testing.assert_allclose(np.asarray(got_sim), t2n(want_sim),
                                   rtol=1e-3, atol=2e-3, err_msg=f"step {t}")


def _map_flow_unet_params(ref_model, variables):
    params = variables["params"]
    stats = variables["batch_stats"]
    for name in ("encoder_0", "encoder_1", "encoder_2",
                 "decoder_1", "decoder_0", "flow_reg"):
        seq = getattr(ref_model, name)
        p, s = conv_block_from_seq(list(seq))
        merge_tree(params, (name,), p)
        merge_tree(stats, (name,), s)
    return variables


def test_flow_unet_matches_prototype(rng):
    torch = _torch()
    prototype_mod = load_reference("src.depracted.model.prototype")
    import jax
    from planar_optical_flow_tpu.models import FlowUNet

    torch.manual_seed(3)
    ref_model = prototype_mod.Prototype(
        in_channel=2, max_displacement=5).eval()
    randomize_bn_stats(ref_model, seed=3)

    scan1 = rng.normal(0, 1.0, (2, 64, 2)).astype(np.float32)
    scan2 = rng.normal(0, 1.0, (2, 64, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(scan1), torch.from_numpy(scan2))

    model = FlowUNet(in_channels=2, max_displacement=5)
    jnp = _jnp()
    variables = _map_flow_unet_params(
        ref_model, _init_vars(model, jnp.asarray(scan1), jnp.asarray(scan2)))

    got = _apply_eval(model, variables, jnp.asarray(scan1),
                      jnp.asarray(scan2))
    np.testing.assert_allclose(np.asarray(got), t2n(want),
                               rtol=1e-3, atol=1e-3)


def _map_bbox_params(ref_model, variables):
    params = variables["params"]
    stats = variables["batch_stats"]
    convs = [ref_model.backbone.conv1, ref_model.backbone.conv2,
             ref_model.backbone.conv3, ref_model.backbone.conv4]
    for i, seq in enumerate(convs):
        p, s = dense_block_from_fc(seq)
        merge_tree(params, ("backbone", f"DenseBlock_{i}"), p)
        merge_tree(stats, ("backbone", f"DenseBlock_{i}"), s)
    for name in ("fc1", "fc2"):
        p, s = dense_block_from_fc(getattr(ref_model, name))
        merge_tree(params, (name,), p)
        merge_tree(stats, (name,), s)
    p, _ = dense_block_from_fc(ref_model.fc3, has_bn=False)
    merge_tree(params, ("fc3",), p)
    return variables


def test_box_regressor_matches_reference(rng):
    torch = _torch()
    box_reg_mod = load_reference("src.model.box_regression")
    import jax
    from planar_optical_flow_tpu.models import BoundingBoxRegressor

    torch.manual_seed(4)
    ref_model = box_reg_mod.BoundingBoxRegressor(
        {"input_dim": 4, "target_dim": 5, "dropout": 0.0}).eval()
    randomize_bn_stats(ref_model, seed=4)

    x = rng.normal(0, 1.0, (4, 32, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x))

    model = BoundingBoxRegressor(input_dim=4, target_dim=5, dropout=0.0)
    jnp = _jnp()
    variables = _map_bbox_params(ref_model, _init_vars(model, jnp.asarray(x)))

    got = _apply_eval(model, variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), t2n(want),
                               rtol=1e-3, atol=1e-3)
