"""Pallas TPU kernels: fused DROW backbone / head inference.

Why: profiled on v5e, the per-cutout conv stacks are pure HBM-bandwidth
bound — every conv layer round-trips ~400-800 MB of activations
(28,800 rows x 56 taps x 64-512 channels at inference batch 64). These
kernels run the whole stack per row-tile with all intermediate activations
resident in VMEM, writing only the final features — an order of magnitude
less HBM traffic than the XLA layer-by-layer lowering.

Inference-only: BatchNorm is folded into the conv weights/biases
(:func:`fold_conv_bn`), exactly equivalent in eval mode.

Layout: weights are prepared as ``(3, Cin, Cout)`` conv kernels (tap-major);
convs are evaluated as three shifted matmuls accumulated in f32, with
operands cast to ``compute_dtype`` (bf16 by default) — MXU-friendly row
counts of tile*56.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAKY_SLOPE = 0.1


def fold_conv_bn(conv_params, bn_params, bn_stats, eps: float = 1e-5):
    """Fold an eval-mode BatchNorm into conv weight/bias.

    conv_params: {kernel (K, Cin, Cout), bias (Cout,)}
    bn_params:   {scale (Cout,), bias (Cout,)}
    bn_stats:    {mean (Cout,), var (Cout,)}
    """
    w = np.asarray(conv_params["kernel"], np.float32)
    b = np.asarray(conv_params.get("bias", np.zeros(w.shape[-1])), np.float32)
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return w * scale, (b - mean) * scale + beta


def _block_params(variables, block_name, n_layers):
    """Folded (w, b) list for one ConvStack block of the flax model."""
    params = variables["params"][block_name]
    stats = variables["batch_stats"][block_name]
    out = []
    for i in range(n_layers):
        conv_name = f"ConvBlock_{i}"
        w, b = fold_conv_bn(
            params[conv_name]["Conv_0"],
            params[conv_name]["BatchNorm_0"],
            stats[conv_name]["BatchNorm_0"],
        )
        out.append((w, b))
    return out


def backbone_weights(variables):
    """Folded weights of :class:`DrowBackbone` (blocks 1-2), flat list."""
    flat = []
    for name in ("block1", "block2"):
        for w, b in _block_params(variables, name, 3):
            flat += [jnp.asarray(w), jnp.asarray(b)]
    return flat


def head_weights(variables):
    """Folded weights of :class:`DrowHead` (block3-4 + dense heads)."""
    flat = []
    for name, n in (("block3", 3), ("block4", 2)):
        for w, b in _block_params(variables, name, n):
            flat += [jnp.asarray(w), jnp.asarray(b)]
    p = variables["params"]
    flat += [jnp.asarray(p["cls"]["kernel"]), jnp.asarray(p["cls"]["bias"])]
    flat += [jnp.asarray(p["reg"]["kernel"]), jnp.asarray(p["reg"]["bias"])]
    return flat


def _conv3(x, w, b, compute_dtype):
    """k=3 SAME conv as one K-stacked matmul with f32 accumulation; the
    activation is returned in ``compute_dtype`` to keep VMEM pressure low.

    x: (T, L, Cin); w: (3, Cin, Cout); b: (Cout,).
    """
    t, l, cin = x.shape
    cout = w.shape[-1]
    xz = x.astype(compute_dtype)
    left = jnp.concatenate([jnp.zeros_like(xz[:, :1]), xz[:, :-1]], axis=1)
    right = jnp.concatenate([xz[:, 1:], jnp.zeros_like(xz[:, :1])], axis=1)
    xcat = jnp.concatenate([left, xz, right], axis=-1)  # (T, L, 3*Cin)
    wflat = w.reshape(3 * cin, cout).astype(compute_dtype)
    acc = jax.lax.dot_general(
        xcat.reshape(t * l, 3 * cin), wflat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(t, l, cout) + b
    out = jnp.where(acc > 0, acc, _LEAKY_SLOPE * acc)
    return out.astype(compute_dtype)


def _pool2(x):
    t, l, c = x.shape
    return jnp.max(x.reshape(t, l // 2, 2, c), axis=2)


def _backbone_kernel(x_ref, *refs, compute_dtype):
    out_ref = refs[-1]
    ws = refs[:-1]
    x = x_ref[:][..., None]  # (T, L, 1)
    i = 0
    for block in range(2):
        for layer in range(3):
            x = _conv3(x, ws[i][:], ws[i + 1][:], compute_dtype)
            i += 2
        x = _pool2(x)
    out_ref[:] = x.astype(out_ref.dtype)


def _head_kernel(x_ref, *refs, num_classes, compute_dtype):
    cls_ref, reg_ref = refs[-2], refs[-1]
    ws = refs[:-2]
    x = x_ref[:].astype(jnp.float32)
    i = 0
    for _ in range(3):  # block3
        x = _conv3(x, ws[i][:], ws[i + 1][:], compute_dtype)
        i += 2
    x = _pool2(x)
    for _ in range(2):  # block4 (no pool)
        x = _conv3(x, ws[i][:], ws[i + 1][:], compute_dtype)
        i += 2
    x = jnp.mean(x, axis=1)  # (T, 128)
    wc, bc = ws[i][:], ws[i + 1][:]
    wr, br = ws[i + 2][:], ws[i + 3][:]
    xc = x.astype(compute_dtype)
    cls_ref[:] = (
        jax.lax.dot_general(xc, wc.astype(compute_dtype),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bc
    ).astype(cls_ref.dtype)
    reg_ref[:] = (
        jax.lax.dot_general(xc, wr.astype(compute_dtype),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + br
    ).astype(reg_ref.dtype)


def _pad_rows(n, tile):
    return ((n + tile - 1) // tile) * tile


@functools.partial(
    jax.jit,
    static_argnames=("tile", "compute_dtype", "interpret"),
)
def fused_backbone(cutouts, weights, tile: int = 64,
                   compute_dtype=jnp.bfloat16, interpret: bool = False):
    """(N, L) cutouts -> (N, L//4, 256) features, one fused kernel.

    ``weights``: flat list from :func:`backbone_weights`.
    """
    n, l = cutouts.shape
    n_pad = _pad_rows(n, tile)
    x = jnp.pad(cutouts, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // tile,)
    out = pl.pallas_call(
        functools.partial(_backbone_kernel, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((n_pad, l // 4, 256), cutouts.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=pl.BlockSpec((tile, l // 4, 256), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *weights)
    return out[:n]


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "tile", "compute_dtype", "interpret"),
)
def fused_head(feats, weights, num_classes: int = 1, tile: int = 64,
               compute_dtype=jnp.bfloat16, interpret: bool = False):
    """(N, L4, 256) fused features -> (cls (N, num_classes), reg (N, 2))."""
    n, l4, c = feats.shape
    n_pad = _pad_rows(n, tile)
    x = jnp.pad(feats, ((0, n_pad - n), (0, 0), (0, 0)))
    grid = (n_pad // tile,)
    cls, reg = pl.pallas_call(
        functools.partial(_head_kernel, num_classes=num_classes,
                          compute_dtype=compute_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, num_classes), feats.dtype),
            jax.ShapeDtypeStruct((n_pad, 2), feats.dtype),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, l4, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=(
            pl.BlockSpec((tile, num_classes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, *weights)
    return cls[:n], reg[:n]
