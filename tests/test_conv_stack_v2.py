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


# ---------------------------------------------------------------- int8


def _quantize_inputs(x, scale):
    return np.clip(np.rint(np.asarray(x) / scale), -127, 127).astype(np.int8)


def test_backbone_int8_close_to_f32(rng):
    from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

    bb = DrowBackbone()
    n, l = 64, 24
    x = jnp.asarray(rng.normal(size=(n, l, 1)).astype(np.float32))
    v = bb.init(KEY, x, train=False)
    ref = np.asarray(bb.apply(v, x, train=False)).reshape(n * (l // 4), 256)

    layer1, _ = cs.backbone_stack_weights(v)
    act1 = np.asarray(
        cs.backbone_layer1(x[..., 0], layer1, compute_dtype=jnp.float32)
    )
    blocks = (_block_params(v, "block1", 3) + _block_params(v, "block2", 3))
    wq, in_scale, _ = cs.quantize_stack_int8(
        blocks[1:], act1.reshape(n, l, 64), l, pool_after={1, 4},
    )
    act1_q = jnp.asarray(_quantize_inputs(act1, in_scale))
    got = np.asarray(cs.fused_backbone_int8(act1_q, wq, l=l, tile=16,
                                            out_dtype=jnp.float32,
                                            interpret=True))
    assert got.shape == ref.shape
    # int8 quantization noise: compare at coarse tolerance + correlation
    denom = np.abs(ref).max()
    rel_err = np.abs(got - ref).max() / denom
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert rel_err < 0.15, rel_err
    assert corr > 0.99, corr


def test_backbone_int8_cat_matches_3mm(rng):
    """conv_mode="cat" (int8 row shifts via int32 bitcast byte-shifts +
    single concat-tap matmul) is bit-identical to the 3-matmul taps."""
    from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

    bb = DrowBackbone()
    n, l = 64, 24
    x = jnp.asarray(rng.normal(size=(n, l, 1)).astype(np.float32))
    v = bb.init(KEY, x, train=False)
    layer1, _ = cs.backbone_stack_weights(v)
    blocks = (_block_params(v, "block1", 3) + _block_params(v, "block2", 3))
    act1 = np.asarray(
        cs.backbone_layer1(x[..., 0], layer1, compute_dtype=jnp.float32)
    )
    kw = dict(pool_after={1, 4})
    wq3, in_scale, _ = cs.quantize_stack_int8(
        blocks[1:], act1.reshape(n, l, 64), l, **kw)
    wqc, _, _ = cs.quantize_stack_int8(
        blocks[1:], act1.reshape(n, l, 64), l, concat_taps=True, **kw)
    # layer1's folded requant path must agree with quantizing its f32 out
    act1_q = cs.backbone_layer1(x[..., 0], layer1, out_scale=in_scale)
    np.testing.assert_array_equal(np.asarray(act1_q),
                                  _quantize_inputs(act1, in_scale))
    o3 = cs.fused_backbone_int8(act1_q, wq3, l=l, tile=16,
                                out_dtype=jnp.float32, interpret=True)
    oc = cs.fused_backbone_int8(act1_q, wqc, l=l, tile=16,
                                out_dtype=jnp.float32, conv_mode="cat",
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(oc))


def test_head_int8_cat_matches_3mm(rng):
    from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

    hd = DrowHead(num_classes=1)
    n, l4 = 48, 6
    x = rng.normal(size=(n, l4, 256)).astype(np.float32)
    v = hd.init(KEY, jnp.asarray(x), train=False)
    blocks = (_block_params(v, "block3", 3) + _block_params(v, "block4", 2))
    wq3, in_scale, _ = cs.quantize_stack_int8(blocks, x, l4, pool_after={2})
    wqc, _, _ = cs.quantize_stack_int8(blocks, x, l4, pool_after={2},
                                       concat_taps=True)
    _, head_w = cs.head_stack_weights(v)
    xq = jnp.asarray(_quantize_inputs(x, in_scale)).reshape(n * l4, 256)
    c3, r3 = cs.fused_head_int8(xq, wq3, head_w, num_classes=1, l4=l4,
                                tile=16, compute_dtype=jnp.float32,
                                interpret=True)
    cc, rc = cs.fused_head_int8(xq, wqc, head_w, num_classes=1, l4=l4,
                                tile=16, compute_dtype=jnp.float32,
                                conv_mode="cat", interpret=True)
    np.testing.assert_array_equal(np.asarray(c3), np.asarray(cc))
    np.testing.assert_array_equal(np.asarray(r3), np.asarray(rc))


def test_head_int8_close_to_f32(rng):
    from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

    hd = DrowHead(num_classes=1)
    n, l4 = 48, 6
    x = jnp.asarray(rng.normal(size=(n, l4, 256)).astype(np.float32))
    v = hd.init(KEY, x, train=False)
    cls_ref, reg_ref = (np.asarray(a) for a in hd.apply(v, x, train=False))

    blocks = (_block_params(v, "block3", 3) + _block_params(v, "block4", 2))
    wq, in_scale, _ = cs.quantize_stack_int8(
        blocks, np.asarray(x), l4, pool_after={2},
    )
    conv_w, head_w = cs.head_stack_weights(v)
    xq = jnp.asarray(_quantize_inputs(x, in_scale)).reshape(n * l4, 256)
    cls, reg = cs.fused_head_int8(xq, wq, head_w, num_classes=1, l4=l4,
                                  tile=16, compute_dtype=jnp.float32,
                                  interpret=True)
    for got, ref in ((np.asarray(cls), cls_ref), (np.asarray(reg), reg_ref)):
        corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert corr > 0.98, corr
        assert np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6) < 0.25


# ------------------------------------------------------- position-major

def _cm_to_pm_act(x_cm, n, l, c):
    """cm rows (n, l) -> pm rows (pos, cutout) for a single tile block."""
    return jnp.asarray(x_cm).reshape(n, l, c).transpose(1, 0, 2).reshape(
        n * l, c)


def test_backbone_int8_pm_matches_cm(rng):
    """Position-major backbone kernel is bit-identical to the cutout-major
    concat-tap kernel (same int8 math, rows reordered)."""
    from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

    bb = DrowBackbone()
    n, l = 32, 24  # one pm tile block (tile % 32 == 0)
    x = jnp.asarray(rng.normal(size=(n, l, 1)).astype(np.float32))
    v = bb.init(KEY, x, train=False)
    layer1, _ = cs.backbone_stack_weights(v)
    blocks = (_block_params(v, "block1", 3) + _block_params(v, "block2", 3))
    act1 = np.asarray(
        cs.backbone_layer1(x[..., 0], layer1, compute_dtype=jnp.float32)
    )
    wq, in_scale, _ = cs.quantize_stack_int8(
        blocks[1:], act1.reshape(n, l, 64), l, pool_after={1, 4},
        concat_taps=True,
    )
    act1_q = cs.backbone_layer1(x[..., 0], layer1, out_scale=in_scale)
    # synthetic embed weights exercise the zx epilogue on both layouts
    ew = (jnp.asarray(rng.normal(size=((l // 4) * 256, 128)) * 0.05,
                      jnp.float32),
          jnp.asarray(rng.normal(size=(128,)) * 0.05, jnp.float32))
    cm, zx_cm = cs.fused_backbone_int8(
        act1_q, wq, l=l, tile=n, out_dtype=jnp.int8, conv_mode="cat",
        embed_weights=ew, interpret=True)
    pm, zx_pm = cs.fused_backbone_int8_pm(
        _cm_to_pm_act(act1_q, n, l, 64), wq, l=l, tile=n,
        out_dtype=jnp.int8, embed_weights=ew, interpret=True)
    l4 = l // 4
    pm_as_cm = np.asarray(pm).reshape(l4, n, 256).transpose(1, 0, 2)
    np.testing.assert_array_equal(
        pm_as_cm.reshape(n * l4, 256), np.asarray(cm))
    np.testing.assert_allclose(np.asarray(zx_pm, np.float32),
                               np.asarray(zx_cm, np.float32),
                               rtol=0.05, atol=0.05)


def test_head_int8_pm_matches_cm(rng):
    from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

    hd = DrowHead(num_classes=1)
    n, l4 = 32, 6
    x = rng.normal(size=(n, l4, 256)).astype(np.float32)
    v = hd.init(KEY, jnp.asarray(x), train=False)
    blocks = (_block_params(v, "block3", 3) + _block_params(v, "block4", 2))
    wq, in_scale, _ = cs.quantize_stack_int8(blocks, x, l4, pool_after={2},
                                             concat_taps=True)
    _, head_w = cs.head_stack_weights(v)
    xq = _quantize_inputs(x, in_scale)
    c_cm, r_cm = cs.fused_head_int8(
        jnp.asarray(xq).reshape(n * l4, 256), wq, head_w, num_classes=1,
        l4=l4, tile=n, compute_dtype=jnp.float32, conv_mode="cat",
        interpret=True)
    c_pm, r_pm = cs.fused_head_int8_pm(
        _cm_to_pm_act(xq.reshape(n * l4, 256), n, l4, 256), wq, head_w,
        num_classes=1, l4=l4, tile=n, compute_dtype=jnp.float32,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(c_pm), np.asarray(c_cm))
    np.testing.assert_array_equal(np.asarray(r_pm), np.asarray(r_cm))


import pytest


@pytest.mark.parametrize("l1_mode", ["repack", "blend", "mm"])
def test_backbone_int8_p2_matches_pm(l1_mode):
    """Pack-2 first stage matches the pm backbone: BIT-IDENTICAL for the
    per-position layer-1 constructions ("repack"/"blend" — the packed
    weights only add zero blocks to the int32 accumulation); the "mm"
    selection-matmul layer 1 may flip rint-boundary int8 counts (f32
    matmul summation order), bounded to 1 LSB at low rate."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    l, tile, nb = 8, 32, 2
    CH = [(64, 64), (64, 128), (128, 128), (128, 128), (128, 256)]
    bb_q = []
    for ci, co in CH:
        bb_q += [
            jnp.asarray(rng.integers(-127, 128, (3 * ci, co)), jnp.int8),
            jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32),
            jnp.asarray(rng.normal(size=(co,)) * 0.1, jnp.float32),
        ]
    l1w = (jnp.asarray(rng.normal(size=(3, 64)) * 0.3, jnp.float32),
           jnp.asarray(rng.normal(size=(1, 64)) * 0.1, jnp.float32))
    embed_w = (
        jnp.asarray(rng.normal(size=(l // 4 * 256, 128)) * 0.01, jnp.float32),
        jnp.asarray(rng.normal(size=(128,)) * 0.01, jnp.float32),
    )
    cut = jnp.asarray(rng.uniform(-1, 1, (nb * tile, l)), jnp.float32)

    f_pm, z_pm = cs.fused_backbone_int8_pm(
        cut, bb_q, l=l, tile=tile, out_dtype=jnp.int8,
        embed_weights=embed_w, layer1_weights=l1w, in_scale=0.01,
        interpret=True)
    f_p2, z_p2 = cs.fused_backbone_int8_p2(
        cut, cs.pack2_backbone_weights(bb_q), l1w, l=l, tile=tile,
        out_dtype=jnp.int8, embed_weights=embed_w, in_scale=0.01,
        l1_mode=l1_mode, interpret=True)
    if l1_mode == "mm":
        # act1's rint-boundary flips propagate through the int8 stacks;
        # require sparse, small deviations rather than bit equality
        a = np.asarray(f_pm, np.int32)
        b = np.asarray(f_p2, np.int32)
        frac = (a != b).mean()
        assert frac < 0.02, frac
        assert np.abs(a - b).max() <= 4
        np.testing.assert_allclose(np.asarray(z_pm, np.float32),
                                   np.asarray(z_p2, np.float32),
                                   rtol=5e-2, atol=5e-2)
    else:
        np.testing.assert_array_equal(np.asarray(f_pm), np.asarray(f_p2))
        np.testing.assert_allclose(np.asarray(z_pm, np.float32),
                                   np.asarray(z_p2, np.float32),
                                   rtol=1e-2, atol=1e-2)
