"""Parity tests for the layout-native fused conv-stack kernels (v2).

Interpreter mode on CPU against the flax DrowBackbone/DrowHead eval path;
both conv modes (lane-concat single matmul and 3 tap matmuls) must agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("conv_mode", ["concat", "3mm"])
def test_backbone_v2_matches_flax(rng, conv_mode):
    bb = DrowBackbone()
    n, l = 70, 24
    x = jnp.asarray(rng.normal(size=(n, l, 1)).astype(np.float32))
    v = bb.init(KEY, x, train=False)
    ref = bb.apply(v, x, train=False)
    layer1, wtail = cs.backbone_stack_weights(v)
    act1 = cs.backbone_layer1(x[..., 0], layer1, compute_dtype=jnp.float32)
    got = cs.fused_backbone_v2(act1, wtail, l=l, tile=32,
                               compute_dtype=jnp.float32,
                               conv_mode=conv_mode, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("conv_mode", ["concat", "3mm"])
def test_head_v2_matches_flax(rng, conv_mode):
    hd = DrowHead(num_classes=4)
    n, l4 = 48, 6
    x = jnp.asarray(rng.normal(size=(n, l4, 256)).astype(np.float32))
    v = hd.init(KEY, x, train=False)
    cls_ref, reg_ref = hd.apply(v, x, train=False)
    conv_w, head_w = cs.head_stack_weights(v)
    cls, reg = cs.fused_head_v2(x.reshape(n * l4, 256), conv_w, head_w,
                                num_classes=4, l4=l4, tile=16,
                                compute_dtype=jnp.float32,
                                conv_mode=conv_mode, interpret=True)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(cls_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(reg), np.asarray(reg_ref),
                               rtol=1e-3, atol=1e-4)


def test_backbone_v2_pad_and_bf16(rng):
    """Non-tile-multiple N and bf16 compute still work and stay close."""
    bb = DrowBackbone()
    n, l = 37, 24
    x = jnp.asarray(rng.normal(size=(n, l, 1)).astype(np.float32))
    v = bb.init(KEY, x, train=False)
    ref = bb.apply(v, x, train=False)
    layer1, wtail = cs.backbone_stack_weights(v)
    act1 = cs.backbone_layer1(x[..., 0], layer1)
    got = cs.fused_backbone_v2(act1, wtail, l=l, tile=16, interpret=True)
    assert got.shape == (n, l // 4, 256)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)
