"""int8 serving path for the DROW conv stacks.

The backbone/head conv stacks are activation-bandwidth bound on v5e
(BASELINE.md); int8 activations halve their traffic and double the MXU rate
— measured 2.07x on a conv-chain probe. This module provides a functional
quantized evaluator over the BN-folded weights of
:mod:`planar_optical_flow_tpu.ops.pallas.fused_drow`:

* weights: symmetric int8, per-output-channel scales,
* activations: symmetric int8, per-layer scales from a calibration batch,
* conv: int8 x int8 -> int32 matmul, dequantize + bias + leaky-relu in f32,
  requantize to the next layer's scale,
* max-pool runs directly on int8 (monotonic); the head's average pool and
  dense output layers stay in f32.

Everything is jittable; quantization parameters are baked as constants.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_LEAKY = 0.1
_QMAX = 127.0


def quantize_weight(w: np.ndarray):
    """(3, Cin, Cout) f32 -> (w_int8 (3Cin, Cout), scale (Cout,))."""
    w = np.asarray(w, np.float32).reshape(-1, w.shape[-1])
    scale = np.abs(w).max(axis=0) / _QMAX
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _f32_reference_chain(x, layers, pools):
    """Folded-f32 evaluation, returning per-layer pre-quant activations
    (used for calibration)."""
    acts = []
    for i, (w, b) in enumerate(layers):
        t, l, cin = x.shape
        left = np.concatenate([np.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        right = np.concatenate([x[:, 1:], np.zeros_like(x[:, :1])], axis=1)
        xc = np.concatenate([left, x, right], axis=-1)
        y = xc.reshape(t * l, -1) @ np.asarray(w, np.float32).reshape(
            -1, w.shape[-1]
        ) + np.asarray(b, np.float32)
        y = np.where(y > 0, y, _LEAKY * y).reshape(t, l, -1)
        if i in pools:
            tt, ll, cc = y.shape
            y = y.reshape(tt, ll // 2, 2, cc).max(axis=2)
        acts.append(y)
        x = y
    return acts


def _amax_scale(a, percentile=None):
    """abs-max (or abs-percentile, for outlier-robust clipping) -> int8
    scale. ``percentile`` in (0, 100]; None means exact abs-max."""
    if percentile is not None and not 0.0 < percentile <= 100.0:
        raise ValueError(
            f"calib percentile must be in (0, 100], got {percentile}")
    a = np.abs(np.asarray(a, np.float32))
    if percentile is None or percentile >= 100.0:
        m = float(a.max())
    else:
        m = float(np.percentile(a, percentile))
    return max(m, 1e-6) / _QMAX


def calibrate(layers, pools, sample, in_scale=None, percentile=None):
    """Per-layer activation scales from a representative f32 sample
    ``(T, L, Cin)``. Returns (in_scale, act_scales list).

    ``percentile``: clip calibration at the given abs-percentile instead
    of the exact abs-max — rare activation spikes otherwise inflate the
    scale and waste int8 resolution on the bulk of the distribution
    (values above the clip saturate at ±127, which the int8 kernels
    already do)."""
    sample = np.asarray(sample, np.float32)
    if in_scale is None:
        in_scale = _amax_scale(sample, percentile)
    acts = _f32_reference_chain(sample, layers, pools)
    scales = [_amax_scale(a, percentile) for a in acts]
    return float(in_scale), scales


class QuantizedConvStack:
    """Baked int8 evaluator for a pooled conv stack.

    Args:
      layers: list of folded (w (3, Cin, Cout), b (Cout,)) f32 pairs.
      pools: indices of layers followed by a 2x max pool.
      in_scale, act_scales: from :func:`calibrate`.
      dequant_last: return the final activation in f32 (True) or int8 with
        its scale exposed as ``out_scale``.
    """

    def __init__(self, layers, pools, in_scale, act_scales,
                 dequant_last=True):
        self.pools = tuple(pools)
        self.in_scale = float(in_scale)
        self.act_scales = [float(s) for s in act_scales]
        self.dequant_last = dequant_last
        self.out_scale = self.act_scales[-1]
        self.wq, self.wscale, self.bias = [], [], []
        for w, b in layers:
            q, s = quantize_weight(np.asarray(w))
            self.wq.append(jnp.asarray(q))
            self.wscale.append(jnp.asarray(s))
            self.bias.append(jnp.asarray(np.asarray(b, np.float32)))

    def quantize_input(self, x):
        """f32 ``(T, L, Cin)`` -> int8 at the calibrated input scale."""
        return jnp.clip(
            jnp.rint(x / self.in_scale), -127, 127
        ).astype(jnp.int8)

    def __call__(self, x_q):
        """int8 ``(T, L, Cin)`` -> f32 (or int8) ``(T, L', Cout)``."""
        s_in = self.in_scale
        for i, (wq, ws, b) in enumerate(zip(self.wq, self.wscale, self.bias)):
            t, l, cin = x_q.shape
            zeros = jnp.zeros_like(x_q[:, :1])
            left = jnp.concatenate([zeros, x_q[:, :-1]], axis=1)
            right = jnp.concatenate([x_q[:, 1:], zeros], axis=1)
            xc = jnp.concatenate([left, x_q, right], axis=-1)
            y32 = jax.lax.dot_general(
                xc.reshape(t * l, 3 * cin), wq,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(t, l, -1)
            y = y32.astype(jnp.float32) * (s_in * ws) + b
            y = jnp.where(y > 0, y, _LEAKY * y)
            if i in self.pools:
                tt, ll, cc = y.shape
                y = jnp.max(y.reshape(tt, ll // 2, 2, cc), axis=2)
            last = i == len(self.wq) - 1
            s_in = self.act_scales[i]
            if last and self.dequant_last:
                return y
            x_q = jnp.clip(jnp.rint(y / s_in), -127, 127).astype(jnp.int8)
        return x_q


def build_quantized_backbone(folded_weights, calib_cutouts):
    """``folded_weights``: flat [w, b, ...] from ``fused_drow.backbone_weights``;
    ``calib_cutouts``: f32 (N, L) representative cutouts."""
    layers = [(np.asarray(folded_weights[i]), np.asarray(folded_weights[i + 1]))
              for i in range(0, 12, 2)]
    pools = (2, 5)
    sample = np.asarray(calib_cutouts, np.float32)[..., None]
    in_scale, act_scales = calibrate(layers, pools, sample)
    return QuantizedConvStack(layers, pools, in_scale, act_scales)


def build_quantized_head_convs(folded_weights, calib_feats):
    """Quantized block3+block4 of the head (conv part only; the avg pool and
    dense cls/reg heads run in f32 on the dequantized output).

    ``folded_weights``: flat list from ``fused_drow.head_weights`` (10 conv
    entries + cls w/b + reg w/b). Returns (stack, (wc, bc, wr, br))."""
    layers = [(np.asarray(folded_weights[i]), np.asarray(folded_weights[i + 1]))
              for i in range(0, 10, 2)]
    pools = (2,)
    in_scale, act_scales = calibrate(layers, pools,
                                     np.asarray(calib_feats, np.float32))
    stack = QuantizedConvStack(layers, pools, in_scale, act_scales)
    heads = tuple(jnp.asarray(np.asarray(w)) for w in folded_weights[10:14])
    return stack, heads


def quantized_head_apply(stack, heads, feats_q):
    """int8 head: conv stack -> f32 -> avg pool -> dense cls/reg."""
    wc, bc, wr, br = heads
    y = stack(feats_q)  # (N, L4/2, 128) f32
    y = jnp.mean(y, axis=1)
    return y @ wc + bc, y @ wr + br
