"""int8 serving path: quantization math + parity with the f32 stacks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.ops.pallas import fused_drow as fd
from planar_optical_flow_tpu.ops import quantized_drow as qd
from planar_optical_flow_tpu.infer.streaming import (
    make_stream_step,
    make_quantized_stream_step,
)

KEY = jax.random.PRNGKey(0)


def test_quantize_weight_roundtrip(rng):
    w = rng.normal(size=(3, 8, 16)).astype(np.float32)
    q, s = qd.quantize_weight(w)
    assert q.dtype == np.int8 and s.shape == (16,)
    back = q.astype(np.float32) * s
    err = np.abs(back - w.reshape(-1, 16))
    assert err.max() <= (np.abs(w).max() / 127) * 0.51 + 1e-6


def test_quantized_backbone_close_to_f32(rng):
    bb = DrowBackbone()
    x = jnp.asarray(rng.normal(size=(128, 24, 1)).astype(np.float32))
    v = bb.init(KEY, x, train=False)
    ref = np.asarray(bb.apply(v, x, train=False))
    stack = qd.build_quantized_backbone(
        fd.backbone_weights(v), np.asarray(x[..., 0][:64])
    )
    got = np.asarray(stack(stack.quantize_input(np.asarray(x))))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.1, rel


def test_quantized_head_close_to_f32(rng):
    hd = DrowHead(num_classes=1)
    x = jnp.asarray(rng.normal(size=(64, 6, 256)).astype(np.float32))
    v = hd.init(KEY, x, train=False)
    cls_ref, reg_ref = (np.asarray(a) for a in hd.apply(v, x, train=False))
    stack, heads = qd.build_quantized_head_convs(
        fd.head_weights(v), np.asarray(x[:32])
    )
    cls, reg = (np.asarray(a) for a in qd.quantized_head_apply(
        stack, heads, stack.quantize_input(np.asarray(x))
    ))
    assert np.abs(cls - cls_ref).mean() < 0.15 * (cls_ref.std() + 1e-6) + 0.02
    assert np.abs(reg - reg_ref).mean() < 0.15 * (reg_ref.std() + 1e-6) + 0.02


@pytest.mark.slow
def test_quantized_stream_step_runs(rng):
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, 450, 1, 16))
    v = model.init(KEY, x, jnp.zeros((1, 450)), train=False)
    ck = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
              num_cutout_pts=16, padding_val=29.99, area_mode=False)
    scans = rng.uniform(0.5, 20.0, (2, 450)).astype(np.float32)
    q = make_quantized_stream_step(model, v, ck, scans)
    t, out = q(None, jnp.asarray(scans))
    t, out = q(t, jnp.asarray(scans))
    assert np.asarray(out["pred_cls"]).shape == (2, 450, 1)
    assert np.asarray(out["pred_flow"]).shape == (2, 450, 2)
    # outputs in the same ballpark as the f32 reference
    ref = make_stream_step(model, ck, donate_template=False)
    tr, o_ref = ref(v, None, jnp.asarray(scans))
    tr, o_ref = ref(v, tr, jnp.asarray(scans))
    d = np.abs(np.asarray(out["pred_cls"]) - np.asarray(o_ref["pred_cls"]))
    assert d.mean() < 0.05


def test_calibrate_percentile_clips_outliers(rng):
    """Percentile calibration: scales shrink vs abs-max when the sample has
    rare spikes, quantization of the bulk gets finer, and p=100 degrades to
    exact abs-max."""
    w = rng.normal(size=(3, 8, 8)).astype(np.float32) * 0.2
    b = np.zeros(8, np.float32)
    layers = [(w, b), (w, b)]
    x = rng.normal(size=(4, 16, 8)).astype(np.float32)
    x[0, 0, 0] = 500.0  # one spike, ~1e-4 of the sample

    s_in_max, s_max = qd.calibrate(layers, set(), x)
    s_in_p, s_p = qd.calibrate(layers, set(), x, percentile=99.9)
    s_in_100, s_100 = qd.calibrate(layers, set(), x, percentile=100.0)

    assert s_in_p < s_in_max  # the spike no longer sets the input scale
    assert all(a <= b + 1e-12 for a, b in zip(s_p, s_max))
    assert s_in_100 == s_in_max and s_100 == s_max

    for bad in (0.0, -1.0, 100.5):
        with pytest.raises(ValueError, match="percentile"):
            qd.calibrate(layers, set(), x, percentile=bad)

    # finer input resolution for the bulk: quantize/dequantize error on the
    # non-spike values drops with the clipped scale
    bulk = x.ravel()[1:]
    def rt_err(scale):
        q = np.clip(np.rint(bulk / scale), -127, 127)
        return np.abs(q * scale - bulk).mean()
    assert rt_err(s_in_p) < rt_err(s_in_max)
