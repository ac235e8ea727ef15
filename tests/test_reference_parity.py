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
    randomize_bn_stats,
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


def _map_drow_params(ref_model, variables):
    """Fill a Drow/SpatialDrow variable tree from a reference (Spatial)DROW
    through the PRODUCT importer (``interop.torch_ckpt``) — every model
    parity test below therefore also validates the checkpoint-migration
    path end to end."""
    from planar_optical_flow_tpu.interop import import_state_dict

    mtype = "dr-spaam" if hasattr(ref_model, "gate") else "drow"
    return import_state_dict(variables, ref_model.state_dict(), mtype)


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
    from planar_optical_flow_tpu.interop import import_state_dict

    return import_state_dict(variables, ref_model.state_dict(), "flow_unet")


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
    from planar_optical_flow_tpu.interop import import_state_dict

    return import_state_dict(variables, ref_model.state_dict(), "box_reg")


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


# ==========================================================================
# checkpoint migration: reference .pth -> orbax, through the product CLI
# ==========================================================================


def test_import_checkpoint_cli_end_to_end(rng, tmp_path):
    """Full migration path: a reference-format ``.pth`` (envelope per
    ``train_utils.py:8-22``) -> ``bin/import_checkpoint.py`` -> orbax ->
    ``restore_variables`` -> streaming step runs; weights and counters
    survive the trip bit-exactly."""
    torch = _torch()
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    import yaml
    import jax
    import optax

    import bin.import_checkpoint as cli
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.pipeline import (_example_inputs,
                                                  normalize_config)
    from planar_optical_flow_tpu.train.checkpoint import restore_variables
    from planar_optical_flow_tpu.train.state import create_train_state
    from planar_optical_flow_tpu.interop import import_state_dict

    torch.manual_seed(5)
    ref_model = dr_spaam_mod.SpatialDROW(
        num_pts=48, alpha=0.5, window_size=7).eval()
    randomize_bn_stats(ref_model, seed=5)
    pth = tmp_path / "dr_spaam_e40.pth"
    torch.save({"epoch": 40, "it": 1234.5,
                "model_state": ref_model.state_dict(),
                "optimizer_state": None}, pth)

    cfg_flat = {
        "network": "cutout_gating", "num_scans": 2,
        "similarity_kwargs": {"alpha": 0.5, "window_size": 7},
        "cutout_kwargs": {"num_cutout_pts": 48},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_flat))
    out = tmp_path / "imported"
    assert cli.main(["--pth", str(pth), "--cfg", str(cfg_path),
                     "--out", str(out), "--cpu"]) == 0

    cfg = normalize_config(cfg_flat)
    model = get_model(cfg["model"])
    state = create_train_state(model, _example_inputs(cfg, 1),
                               optax.identity(),
                               init_kwargs={"train": False})
    restored = restore_variables(str(out), state)
    assert int(restored.epoch) == 40 and int(restored.step) == 1234

    want = import_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats},
        ref_model.state_dict(), "dr-spaam")
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, restored.params, want["params"])
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, restored.batch_stats,
        want["batch_stats"])

    # the restored model runs a streaming step
    from planar_optical_flow_tpu.models import SpatialDrow

    scan = _jnp().asarray(rng.uniform(-1, 1, (1, 12, 48)).astype(np.float32))
    cls, reg, template, sim = model.apply(
        restored.variables, scan, None, method=SpatialDrow.stream_step)
    assert cls.shape[:2] == (1, 12)


def test_flow_drow_import_grafts_detector_and_skips_broken_head(rng):
    """A pre-trained SpatialDROW .pth grafts into FlowDrow's ``dr_spaam``
    subtree; a FlowDROW_pretrained state_dict additionally warns that the
    reference's (broken, shape-incompatible) flow head is skipped and keeps
    the fresh head initialization."""
    torch = _torch()
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    import warnings as _warnings

    from planar_optical_flow_tpu.interop import import_state_dict
    from planar_optical_flow_tpu.models import FlowDrow

    torch.manual_seed(6)
    ref_det = dr_spaam_mod.SpatialDROW(
        num_pts=48, alpha=0.5, window_size=7, pedestrian_only=True).eval()
    randomize_bn_stats(ref_det, seed=6)

    jnp = _jnp()
    model = FlowDrow(alpha=0.5, window_size=7, pedestrian_only=True)
    x = jnp.zeros((1, 12, 3, 48))
    variables = _init_vars(model, x, jnp.zeros((1, 12)))

    got = import_state_dict(variables, ref_det.state_dict(), "flow_drow")
    np.testing.assert_array_equal(
        got["params"]["dr_spaam"]["head"]["cls"]["bias"],
        t2n(ref_det.conv_cls.bias))
    # flow head untouched (fresh init)
    np.testing.assert_array_equal(
        got["params"]["flow_conv1"]["Conv_0"]["bias"],
        variables["params"]["flow_conv1"]["Conv_0"]["bias"])

    # FlowDROW-style state_dict (detector under dr_spaam., head at root)
    sd = {f"dr_spaam.{k}": v for k, v in ref_det.state_dict().items()}
    sd["conv1.0.weight"] = torch.zeros(128, 7, 3)  # broken reference head
    sd["conv1.0.bias"] = torch.zeros(128)
    with pytest.warns(UserWarning, match="flow-head weights"):
        got2 = import_state_dict(variables, sd, "flow_drow")
    np.testing.assert_array_equal(
        got2["params"]["dr_spaam"]["head"]["cls"]["bias"],
        t2n(ref_det.conv_cls.bias))


def test_import_mismatch_raises(rng):
    """Config/checkpoint mismatches fail with readable errors instead of
    silently mis-importing."""
    torch = _torch()
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    from planar_optical_flow_tpu.interop import import_state_dict
    from planar_optical_flow_tpu.models import Drow, SpatialDrow

    torch.manual_seed(7)
    ref_spatial = dr_spaam_mod.SpatialDROW(num_pts=48, window_size=7).eval()

    jnp = _jnp()
    # gate-less model fed a SpatialDROW checkpoint
    drow_vars = _init_vars(Drow(), jnp.zeros((1, 12, 3, 48)))
    with pytest.raises(ValueError, match="attention gate"):
        import_state_dict(drow_vars, ref_spatial.state_dict(), "drow")

    # wrong class count: pedestrian-only model, 4-class checkpoint
    ped_vars = _init_vars(SpatialDrow(window_size=7, pedestrian_only=True),
                          jnp.zeros((1, 12, 3, 48)))
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(ped_vars, ref_spatial.state_dict(), "dr-spaam")


def test_import_envelope_variants(rng, tmp_path):
    """Envelope handling: new-generation "step" key, bare state_dicts, and
    DataParallel "module." prefixes all normalize to the same import."""
    torch = _torch()
    prototype_mod = load_reference("src.depracted.model.prototype")
    from planar_optical_flow_tpu.interop import load_reference_checkpoint

    torch.manual_seed(8)
    ref = prototype_mod.Prototype(in_channel=2, max_displacement=5).eval()
    sd = ref.state_dict()

    # new-generation envelope (pipeline/logger.py:171-177 uses "step")
    p1 = tmp_path / "new.pth"
    torch.save({"epoch": 3, "step": 77, "model_state": sd,
                "optimizer_state": None}, p1)
    sd1, meta1 = load_reference_checkpoint(str(p1))
    assert meta1 == {"epoch": 3, "step": 77}

    # bare state_dict (no envelope)
    p2 = tmp_path / "bare.pth"
    torch.save(sd, p2)
    sd2, meta2 = load_reference_checkpoint(str(p2))
    assert meta2 == {"epoch": 0, "step": 0}

    # DataParallel-wrapped keys
    p3 = tmp_path / "dp.pth"
    torch.save({"epoch": 1, "it": 5,
                "model_state": {f"module.{k}": v for k, v in sd.items()},
                "optimizer_state": None}, p3)
    sd3, _ = load_reference_checkpoint(str(p3))

    assert sorted(sd1) == sorted(sd2) == sorted(sd3)
    for k in sd1:
        np.testing.assert_array_equal(sd1[k], sd3[k])


def test_migration_to_deployment_composition(rng, tmp_path):
    """The full migration-to-production user story, composed end to end:
    a reference-format ``.pth`` checkpoint -> ``bin/import_checkpoint``
    (orbax) -> ``bin/export_serving`` (AOT artifact from the imported
    weights) -> the loaded artifact serves bit-identically to the live
    v3 step built from the same imported weights. Each stage is covered
    individually elsewhere; this guards the seams between them."""
    torch = _torch()
    dr_spaam_mod = load_reference("src.depracted.model.dr_spaam")
    import yaml
    import jax
    import optax

    import bin.import_checkpoint as import_cli
    import bin.export_serving as export_cli
    from planar_optical_flow_tpu.infer import load_serving_engine
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.pipeline import (_example_inputs,
                                                  normalize_config)
    from planar_optical_flow_tpu.train.checkpoint import restore_variables
    from planar_optical_flow_tpu.train.state import create_train_state

    torch.manual_seed(11)
    ref_model = dr_spaam_mod.SpatialDROW(
        num_pts=16, alpha=0.5, window_size=5).eval()
    randomize_bn_stats(ref_model, seed=11)
    pth = tmp_path / "dr_spaam_e40.pth"
    torch.save({"epoch": 40, "it": 100.0,
                "model_state": ref_model.state_dict(),
                "optimizer_state": None}, pth)

    cfg_flat = {
        "network": "cutout_gating", "num_scans": 2,
        "similarity_kwargs": {"alpha": 0.5, "window_size": 5},
        "cutout_kwargs": {"fixed": True, "centered": True,
                          "window_width": 1.0, "window_depth": 0.5,
                          "num_cutout_pts": 16, "padding_val": 29.99,
                          "area_mode": True, "gather_mode": "matmul"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_flat))
    ckpt_dir = tmp_path / "imported"
    assert import_cli.main(["--pth", str(pth), "--cfg", str(cfg_path),
                            "--out", str(ckpt_dir), "--cpu"]) == 0

    num_pts, batch = 64, 2
    engine_dir = tmp_path / "engine"
    assert export_cli.main(["--cfg", str(cfg_path), "--ckpt",
                            str(ckpt_dir), "--out", str(engine_dir),
                            "--batch", str(batch), "--num-pts",
                            str(num_pts), "--tile", "16", "--engine",
                            "bf16", "--cpu"]) == 0
    engine = load_serving_engine(str(engine_dir))
    assert engine.meta["ckpt"] == str(ckpt_dir.resolve())

    # live v3 step from the SAME imported weights
    cfg = normalize_config(cfg_flat)
    model = get_model(cfg["model"])
    state = create_train_state(model, _example_inputs(cfg, 1),
                               optax.identity(),
                               init_kwargs={"train": False})
    restored = restore_variables(str(ckpt_dir), state)
    live = make_serve_step_v3(model, restored.variables,
                              cfg_flat["cutout_kwargs"], num_pts=num_pts,
                              precision="bf16", tile=16, interpret=True)

    jnp = _jnp()
    carry_l = carry_a = None
    for i in range(3):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (batch, num_pts)),
                           jnp.float32)
        carry_l, want = live(carry_l, scan)
        carry_a, got = engine(carry_a, scan)
        for a, b in zip(jax.tree_util.tree_leaves(want),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"step {i}")
