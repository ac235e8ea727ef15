"""Pallas fused-kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.models import FlowDrow, SpatialDrow
from planar_optical_flow_tpu.ops.pallas import fused_drow as fd
from planar_optical_flow_tpu.infer.streaming import (
    make_stream_step,
    make_fused_stream_step,
)

KEY = jax.random.PRNGKey(0)


def test_fold_conv_bn_math(rng):
    """Folded conv == conv + eval-mode BN."""
    w = rng.normal(size=(3, 8, 16)).astype(np.float32)
    b = rng.normal(size=16).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    beta = rng.normal(size=16).astype(np.float32)
    mean = rng.normal(size=16).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    wf, bf_ = fd.fold_conv_bn(
        {"kernel": w, "bias": b}, {"scale": gamma, "bias": beta},
        {"mean": mean, "var": var},
    )
    z = rng.normal(size=(5, 3, 8)).astype(np.float32)  # one conv tap each
    raw = np.einsum("nkc,kco->no", z, w) + b
    want = (raw - mean) / np.sqrt(var + 1e-5) * gamma + beta
    got = np.einsum("nkc,kco->no", z, wf) + bf_
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_fused_backbone_matches_flax(rng):
    bb = DrowBackbone()
    x = jnp.asarray(rng.normal(size=(70, 24, 1)).astype(np.float32))
    v = bb.init(KEY, x, train=False)
    ref = bb.apply(v, x, train=False)
    got = fd.fused_backbone(x[..., 0], fd.backbone_weights(v), tile=32,
                            compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_fused_head_matches_flax(rng):
    hd = DrowHead(num_classes=4)
    x = jnp.asarray(rng.normal(size=(48, 6, 256)).astype(np.float32))
    v = hd.init(KEY, x, train=False)
    cls_ref, reg_ref = hd.apply(v, x, train=False)
    cls, reg = fd.fused_head(x, fd.head_weights(v), num_classes=4, tile=16,
                             compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(cls_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), np.asarray(reg_ref),
                               rtol=1e-3, atol=1e-4)


def test_fused_stream_step_matches_reference(rng):
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    cur = jnp.zeros((1, 450))
    v = model.init(KEY, x, cur, train=False)
    ck = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
              num_cutout_pts=16, padding_val=29.99, area_mode=False)
    scan = jnp.asarray(rng.uniform(0.5, 20.0, (1, 450)).astype(np.float32))

    ref_step = make_stream_step(model, ck, donate_template=False)
    t, out_r = ref_step(v, None, scan)
    t, out_r = ref_step(v, t, scan)

    fused = make_fused_stream_step(model, v, ck, interpret=True)
    tf_, out_f = fused(None, scan)
    tf_, out_f = fused(tf_, scan)

    for k in ("pred_cls", "pred_reg", "pred_flow"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_r[k]), atol=3e-3,
        )
    # NMS agrees except where ~1e-4 confidence noise flips the greedy order
    agree = (np.asarray(out_f["det_keep"]) == np.asarray(out_r["det_keep"]))
    assert agree.mean() > 0.98, agree.mean()
