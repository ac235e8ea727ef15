"""Pallas TPU kernels v2: fused DROW conv stacks, layout-native.

Round-1's fused kernels (``fused_drow.py``) kept activations as 3-D
``(tile, L, C)`` blocks and built k=3 taps by concatenating shifted copies
along C + reshaping to 2-D — every layer paid Mosaic relayouts at L=56/14
sublane shapes and the kernel LOST to XLA's conv lowering (17 ms vs 8.3 ms
on the B=64 probe).

This version never changes layout inside the kernel:

* activations are 2-D ``(rows, C)`` with rows = cutouts x positions
  (position-major within each cutout) and C in lanes (64..512, aligned),
* the k=3 taps are two sublane ``pltpu.roll``s of the f32 activation
  (Mosaic's rotate is 32-bit only) with static cutout-boundary masks —
  wrapped rows are zeroed, exactly SAME padding,
* per-layer the taps feed the MXU either as three (rows, Cin) matmuls
  accumulated in f32 (``conv_mode="3mm"``) or lane-concatenated into one
  (rows, 3*Cin) @ (3*Cin, Cout) matmul (``conv_mode="concat"`` — 3x the
  contraction depth, better MXU utilization at Cin=64/128),
* layer 1 of the backbone (Cin=1) either runs in XLA via
  :func:`backbone_layer1` (bf16/f32 paths) or — on the position-major int8
  path — INSIDE the kernel as per-position VPU broadcasts
  (``layer1_weights=`` on :func:`fused_backbone_int8_pm`), so the
  ``(N*L, 64)`` activation never exists in HBM,
* max-pool/2 and the head's temporal mean use the row-major identity
  ``(R, C) -> (R/k, k*C)`` (one reshape, then a lane-slice max/sum),
* BatchNorm is pre-folded (inference).

The backbone tail (reference ``dr_spaam.py:79-97``: blocks 1-2) and head
(``dr_spaam.py:102-114``: blocks 3-4 + cls/reg) each run as ONE pallas
program: HBM traffic is the input + final output only, vs ~12 full
activation round-trips in the layer-by-layer XLA lowering.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planar_optical_flow_tpu.ops.pallas.fused_drow import (
    fold_conv_bn,
    _block_params,
)

_LEAKY_SLOPE = 0.1

# conv transients (xcat + f32 acc) exceed the 16 MB default scoped-VMEM
# budget at large tiles (whole-stream blocks); v5e has far more VMEM
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# static plans: ("conv",) / ("pool",) / ("mean",); layer-1 of the backbone
# is NOT in the plan (see backbone_layer1)
_BACKBONE_PLAN = (
    ("conv",), ("conv",), ("pool",),
    ("conv",), ("conv",), ("conv",), ("pool",),
)
_HEAD_PLAN = (
    ("conv",), ("conv",), ("conv",), ("pool",),
    ("conv",), ("conv",), ("mean",),
)


def prepare_stack_weights(block_param_list):
    """Folded conv (w (3, Cin, Cout), b) list -> flat [wcat (3*Cin, Cout),
    b (Cout,), ...] with taps stacked on the contraction axis
    (tap-major: rows [0:Cin] = left tap)."""
    flat = []
    for w, b in block_param_list:
        w = np.asarray(w, np.float32)
        k, cin, cout = w.shape
        flat += [jnp.asarray(w.reshape(k * cin, cout)),
                 jnp.asarray(np.asarray(b, np.float32))]
    return flat


def backbone_stack_weights(variables):
    """DrowBackbone variables -> (layer-1 (w (3,1,64), b), flat tap-stacked
    weights for layers 2..6), f32, BN folded."""
    blocks = (_block_params(variables, "block1", 3)
              + _block_params(variables, "block2", 3))
    w1, b1 = blocks[0]
    layer1 = (jnp.asarray(np.asarray(w1, np.float32)),
              jnp.asarray(np.asarray(b1, np.float32)))
    return layer1, prepare_stack_weights(blocks[1:])


def head_stack_weights(variables):
    """DrowHead variables -> (conv tap list, (wc, bc, wr, br)) f32 folded."""
    blocks = (_block_params(variables, "block3", 3)
              + _block_params(variables, "block4", 2))
    p = variables["params"]
    heads = (jnp.asarray(p["cls"]["kernel"]), jnp.asarray(p["cls"]["bias"]),
             jnp.asarray(p["reg"]["kernel"]), jnp.asarray(p["reg"]["bias"]))
    return prepare_stack_weights(blocks), heads


def backbone_layer1(cutouts, layer1_weights, compute_dtype=jnp.bfloat16,
                    out_scale=None):
    """Backbone layer 1 in XLA: (N, L) cutouts -> (N*L, 64) flat activation.

    Cin=1 has no MXU-friendly in-kernel form; this broadcast-FMA + flatten
    costs one (N*L, 64) write and fuses with the cutout producer.

    With ``out_scale`` the requant for the int8 stack is folded into the
    same producer (int8 output, one third/quarter the HBM write of
    bf16/f32 and no separate quantize pass).
    """
    n, l = cutouts.shape
    w, b = layer1_weights  # (3, 1, 64), (64,)
    x = cutouts.astype(jnp.float32)
    z = jnp.zeros_like(x[:, :1])
    left = jnp.concatenate([z, x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], z], axis=1)
    wc = w[:, 0, :]  # (3, 64)
    acc = (left[..., None] * wc[0] + x[..., None] * wc[1]
           + right[..., None] * wc[2]) + b
    act = jnp.where(acc > 0, acc, _LEAKY_SLOPE * acc)
    flat = act.reshape(n * l, 64)
    if out_scale is not None:
        return jnp.clip(jnp.rint(flat / out_scale), -127, 127
                        ).astype(jnp.int8)
    return flat.astype(compute_dtype)


def _leaky(x):
    return jnp.where(x > 0, x, _LEAKY_SLOPE * x)


def _row_masks(rows, l):
    """(rows, 1) masks: first position / last position of each cutout."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    pos = jax.lax.rem(r, l)
    return pos == 0, pos == (l - 1)


def _conv_rolled(x, wcat, b, l, compute_dtype, conv_mode,
                 act_dtype=jnp.float32):
    """k=3 SAME conv on (rows, Cin) f32 activations, position-major rows of
    length-l cutouts; returns (rows, Cout) f32, post-leaky.

    Rolls run on the f32 activation (Mosaic's sublane rotate is 32-bit
    only); operands are cast to ``compute_dtype`` just for the MXU matmuls,
    which accumulate in f32. ``wcat``: (3*Cin, Cout) tap-stacked.
    """
    rows, cin = x.shape
    first, last = _row_masks(rows, l)
    dn = (((1,), (0,)), ((), ()))
    w = wcat.astype(compute_dtype)
    if x.dtype != jnp.float32 and conv_mode != "notap":
        x = x.astype(jnp.float32)  # Mosaic sublane rotate is 32-bit only
    if conv_mode == "notap":  # DEBUG ONLY: center tap x3 (wrong math)
        acc = 3.0 * jax.lax.dot_general(
            x.astype(compute_dtype), w[cin:2 * cin], dn,
            preferred_element_type=jnp.float32)
        return _leaky(acc + b).astype(act_dtype)
    # left[r] = x[r-1]: roll down by 1; invalid on each cutout's first row
    left = jnp.where(first, 0.0, pltpu.roll(x, 1, axis=0))
    # right[r] = x[r+1]: roll up by 1 (= down by rows-1)
    right = jnp.where(last, 0.0, pltpu.roll(x, rows - 1, axis=0))
    if conv_mode == "concat":
        xcat = jnp.concatenate([left, x, right], axis=1).astype(compute_dtype)
        # reorder rows of w to [left|center|right] tap blocks? prepare_stack
        # stores tap-major already: [0:cin]=left, [cin:2cin]=center
        acc = jax.lax.dot_general(xcat, w, dn,
                                  preferred_element_type=jnp.float32)
    else:  # "3mm"
        acc = jax.lax.dot_general(x.astype(compute_dtype), w[cin:2 * cin],
                                  dn, preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(left.astype(compute_dtype), w[:cin], dn,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(right.astype(compute_dtype),
                                   w[2 * cin:], dn,
                                   preferred_element_type=jnp.float32)
    return _leaky(acc + b).astype(act_dtype)


def _pool2(x):
    """Max-pool/2 over rows via the row-major (R, C) -> (R/2, 2C) identity."""
    rows, c = x.shape
    y = x.reshape(rows // 2, 2 * c)
    return jnp.maximum(y[:, :c], y[:, c:])


def _mean_rows(x, k):
    """Mean over groups of k consecutive rows: (R, C) -> (R/k, C)."""
    rows, c = x.shape
    y = x.reshape(rows // k, k * c)
    acc = y[:, :c]
    for i in range(1, k):
        acc = acc + y[:, i * c:(i + 1) * c]
    return acc / k


def _run_plan(x, ws, plan, l0, compute_dtype, conv_mode,
              act_dtype=jnp.float32):
    """Kernel body: x (rows, Cin), static plan."""
    l = l0
    wi = 0
    for op in plan:
        if op[0] == "conv":
            x = _conv_rolled(x, ws[wi][:], ws[wi + 1][:], l, compute_dtype,
                             conv_mode, act_dtype)
            wi += 2
        elif op[0] == "pool":
            x = _pool2(x)
            l //= 2
        elif op[0] == "mean":
            x = _mean_rows(x, l)
            l = 1
    return x


def _embed_epilogue(out, ws_embed, z_ref, compute_dtype):
    """Fused gate-embed: z = feats_flat @ W + b per cutout row.

    ``out``: (tile*l4, 256) f32 block -> row-major merge to (tile, l4*256)
    -> one MXU matmul. Saves the standalone embed pass + a full feature
    re-read from HBM (infer/fast_gate.py)."""
    we, be = ws_embed
    rows, c = out.shape
    tile = rows * c // we.shape[0]
    e_in = out.reshape(tile, we.shape[0]).astype(compute_dtype)
    z = jax.lax.dot_general(
        e_in, we[:].astype(compute_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + be[:]
    z_ref[:] = z.astype(z_ref.dtype)


def _backbone_kernel(x_ref, *refs, l0, compute_dtype, conv_mode,
                     act_dtype=jnp.float32, with_embed=False):
    if with_embed:
        out_ref, z_ref = refs[-2], refs[-1]
        ws = refs[:-4]
        ws_embed = refs[-4:-2]
    else:
        out_ref = refs[-1]
        ws = refs[:-1]
    out = _run_plan(x_ref[:].astype(act_dtype), ws, _BACKBONE_PLAN, l0,
                    compute_dtype, conv_mode, act_dtype)
    out_ref[:] = out.astype(out_ref.dtype)
    if with_embed:
        _embed_epilogue(out.astype(jnp.float32), ws_embed, z_ref,
                        compute_dtype)


def _head_kernel(x_ref, *refs, l0, compute_dtype, conv_mode):
    cls_ref, reg_ref = refs[-2], refs[-1]
    ws = refs[:-6]
    wc, bc, wr, br = (r[:] for r in refs[-6:-2])
    x = _run_plan(x_ref[:].astype(jnp.float32), ws, _HEAD_PLAN, l0,
                  compute_dtype, conv_mode)
    cls, reg = _head_cls_reg(x, wc, bc, wr, br, compute_dtype)
    cls_ref[:] = cls.astype(cls_ref.dtype)
    reg_ref[:] = reg.astype(reg_ref.dtype)


def _pad_rows(n, tile):
    return ((n + tile - 1) // tile) * tile


@functools.partial(jax.jit, static_argnames=("l", "tile", "compute_dtype",
                                             "conv_mode", "act_dtype",
                                             "interpret"))
def fused_backbone_v2(act1, weights, l: int = 56, tile: int = 64,
                      compute_dtype=jnp.bfloat16, conv_mode: str = "concat",
                      act_dtype=jnp.float32, embed_weights=None,
                      interpret: bool = False):
    """Flat layer-1 activation (N*L, 64) -> (N, L//4, 256) features.

    ``act1`` from :func:`backbone_layer1`; ``weights`` the second element of
    :func:`backbone_stack_weights`. With ``embed_weights`` (W (l4*256, 128),
    b (128,)) the kernel also emits the gate's pre-activation embedding
    zx (N, 128) from the epilogue; returns (feats, zx).
    """
    nl, c1 = act1.shape
    n = nl // l
    n_pad = _pad_rows(n, tile)
    x = jnp.pad(act1, ((0, (n_pad - n) * l), (0, 0)))
    grid = (n_pad // tile,)
    l4 = l // 4
    with_embed = embed_weights is not None
    kernel = functools.partial(_backbone_kernel, l0=l,
                               compute_dtype=compute_dtype,
                               conv_mode=conv_mode, act_dtype=act_dtype,
                               with_embed=with_embed)
    weights = list(weights) + (list(embed_weights) if with_embed else [])
    out_shape = jax.ShapeDtypeStruct((n_pad * l4, 256), compute_dtype)
    out_spec = pl.BlockSpec((tile * l4, 256), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if with_embed:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n_pad, 128), compute_dtype))
        out_spec = (out_spec,
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec((tile * l, c1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=out_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, *weights)
    if with_embed:
        out, zx = res
        return out[:n * l4].reshape(n, l4, 256), zx[:n]
    return res[:n * l4].reshape(n, l4, 256)


@functools.partial(jax.jit, static_argnames=("num_classes", "l4", "tile",
                                             "compute_dtype", "conv_mode",
                                             "interpret"))
def fused_head_v2(feats_flat, conv_weights, head_weights,
                  num_classes: int = 1, l4: int = 14, tile: int = 64,
                  compute_dtype=jnp.bfloat16, conv_mode: str = "concat",
                  interpret: bool = False):
    """Flat (N*L4, 256) features -> (cls (N, num_classes), reg (N, 2)).

    ``conv_weights``/``head_weights`` from :func:`head_stack_weights`.
    """
    nl, c = feats_flat.shape
    n = nl // l4
    n_pad = _pad_rows(n, tile)
    x = jnp.pad(feats_flat, ((0, (n_pad - n) * l4), (0, 0)))
    grid = (n_pad // tile,)
    weights = list(conv_weights) + list(head_weights)
    kernel = functools.partial(_head_kernel, l0=l4,
                               compute_dtype=compute_dtype,
                               conv_mode=conv_mode)
    cls, reg = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, num_classes), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((tile * l4, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=(
            pl.BlockSpec((tile, num_classes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, *weights)
    return cls[:n], reg[:n]


# ---------------------------------------------------------------------------
# int8 kernels: weights per-channel int8, activations per-layer int8; ONE
# requant chain per layer fused in the epilogue (leaky commutes with the
# positive output scale, so dequant->leaky->requant folds to
# clip(rint(leaky(acc * s_eff + b_eff)))). The k=3 taps shift the int32
# ACCUMULATORS (Mosaic rotate is 32-bit only; int8 activations cannot be
# rolled, and re-quantizing shifted copies would triple the epilogue).
# ---------------------------------------------------------------------------


def stack_act_scales(block_param_list, sample, pool_after, in_scale=None,
                     percentile=None):
    """Calibrate a conv stack: representative f32 ``sample`` (N, L, Cin) ->
    (in_scale, per-layer activation scales). The scales are plain floats —
    persist them (see ``infer/calibration.py``) to rebuild the int8 kernels
    without re-running calibration data. ``percentile`` clips calibration
    at that abs-percentile instead of the exact abs-max (outlier-robust;
    see ``quantized_drow.calibrate``)."""
    from planar_optical_flow_tpu.ops import quantized_drow as qd

    sample = np.asarray(sample, np.float32)
    if in_scale is None:
        in_scale = qd._amax_scale(sample, percentile)
    return qd.calibrate(block_param_list, set(pool_after), sample,
                        in_scale=in_scale, percentile=percentile)


def quantize_stack_int8(block_param_list, sample, l0, pool_after,
                        in_scale=None, dequant_last=True,
                        concat_taps=False, act_scales=None):
    """Folded f32 (w (3,Cin,Cout), b) list -> int8 kernel weights.

    ``sample``: (N, L, Cin) f32 representative input of the stack (POST
    layer-1 for the backbone). Returns (flat weight list [w0,w1,w2,seff,beff]
    per layer — or [wcat,seff,beff] with ``concat_taps`` for the
    single-matmul ``conv_mode="cat"`` kernels — in_scale,
    out_scale-or-None).

    With ``in_scale`` AND ``act_scales`` (e.g. restored from a persisted
    :class:`infer.calibration.ServeCalibration`) no sample is needed.

    Per layer i: q_{i+1} = clip(rint(leaky(acc_i32 * s_eff + b_eff))) with
    s_eff = s_in * w_scale / s_out and b_eff = b / s_out; the last layer
    dequantizes (s_eff = s_in * w_scale, b_eff = b) when ``dequant_last``.
    """
    from planar_optical_flow_tpu.ops import quantized_drow as qd

    if act_scales is None:
        in_scale, act_scales = stack_act_scales(
            block_param_list, sample, pool_after, in_scale=in_scale)
    elif in_scale is None:
        raise ValueError("act_scales requires an explicit in_scale")
    flat = []
    s_in = in_scale
    n = len(block_param_list)
    for i, (w, b) in enumerate(block_param_list):
        w = np.asarray(w, np.float32)
        b = np.asarray(b, np.float32)
        wq, ws = qd.quantize_weight(w)  # (3Cin, Cout) int8, (Cout,) f32
        cin = w.shape[1]
        last = i == n - 1
        s_out = act_scales[i]
        if last and dequant_last:
            s_eff = s_in * ws
            b_eff = b
        else:
            s_eff = s_in * ws / s_out
            b_eff = b / s_out
        if concat_taps:
            flat += [jnp.asarray(wq)]
        else:
            flat += [jnp.asarray(wq[:cin]), jnp.asarray(wq[cin:2 * cin]),
                     jnp.asarray(wq[2 * cin:])]
        flat += [
            jnp.asarray(s_eff.astype(np.float32)),
            jnp.asarray(b_eff.astype(np.float32)),
        ]
        s_in = s_out
    out_scale = None if dequant_last else act_scales[-1]
    return flat, float(in_scale), out_scale


def quantize_int8(x, scale):
    """f32 -> int8 at ``scale`` (symmetric)."""
    return jnp.clip(jnp.rint(x / scale), -127, 127).astype(jnp.int8)


def _conv_int8(xq, wm, w0, wp, s_eff, b_eff, l):
    """k=3 SAME conv on int8 (rows, Cin): 3 unshifted int8 matmuls, taps
    realized by rolling the int32 accumulators, fused f32 epilogue
    (dequant + bias + leaky, with the next layer's requant scale already
    folded in). Returns f32; the caller requantizes AFTER any pooling —
    Mosaic has no vector int max, and max commutes with rint/clip."""
    rows = xq.shape[0]
    first, last = _row_masks(rows, l)
    dn = (((1,), (0,)), ((), ()))
    y0 = jax.lax.dot_general(xq, wm, dn, preferred_element_type=jnp.int32)
    y1 = jax.lax.dot_general(xq, w0, dn, preferred_element_type=jnp.int32)
    y2 = jax.lax.dot_general(xq, wp, dn, preferred_element_type=jnp.int32)
    # out[r] = y0[r-1] + y1[r] + y2[r+1]
    acc = y1 + jnp.where(first, 0, pltpu.roll(y0, 1, axis=0))
    acc = acc + jnp.where(last, 0, pltpu.roll(y2, rows - 1, axis=0))
    y = acc.astype(jnp.float32) * s_eff + b_eff
    return jnp.where(y > 0, y, _LEAKY_SLOPE * y)


def _requant(y):
    return jnp.clip(jnp.rint(y), -127.0, 127.0).astype(jnp.int8)


def _byte(k):
    """0xFF in byte lane k as an int32 (two's-complement for k=3)."""
    return int(np.array(0xFF << (8 * k), np.uint32).view(np.int32))


def _shift_rows_int8(xq, l):
    """Row shifts of an int8 (rows, C) activation with cutout-boundary
    zeroing: (left[r] = x[r-1], right[r] = x[r+1]).

    Mosaic's sublane rotate is 32-bit only, so the int8 rows are bitcast to
    (rows//4, C) int32 — packing 4 consecutive rows per element,
    little-endian (byte 0 = row 4s; validated on v5e, probe_r2i) — and the
    by-one-row shift becomes two int shifts + or + a 32-bit sublane roll.
    Boundary rows (first/last of each length-``l`` cutout) are zeroed with
    static per-byte masks. Requires rows % 4 == 0.
    """
    rows = xq.shape[0]
    xp = pltpu.bitcast(xq, jnp.int32)  # (rows//4, C)
    r4 = rows // 4
    prev = pltpu.roll(xp, 1, axis=0)
    down = (xp << 8) | ((prev >> 24) & 0xFF)          # down[r] = x[r-1]
    nxt = pltpu.roll(xp, r4 - 1, axis=0)
    up = ((xp >> 8) & 0x00FFFFFF) | (nxt << 24)       # up[r] = x[r+1]

    s4 = jax.lax.broadcasted_iota(jnp.int32, (r4, 1), 0) * 4
    keep_down = jnp.full((r4, 1), -1, jnp.int32)
    keep_up = jnp.full((r4, 1), -1, jnp.int32)
    for k in range(4):
        pos = jax.lax.rem(s4 + k, l)
        keep_down = jnp.where(pos == 0, keep_down & ~_byte(k), keep_down)
        keep_up = jnp.where(pos == l - 1, keep_up & ~_byte(k), keep_up)
    left = pltpu.bitcast(down & keep_down, jnp.int8)
    right = pltpu.bitcast(up & keep_up, jnp.int8)
    return left, right


_BYTE_SHIFT_OK: dict = {}


def check_byte_shift(interpret: bool = False):
    """One-time known-answer check of :func:`_shift_rows_int8` on the
    current backend.

    The byte-shift tap realization assumes little-endian sublane packing
    of ``pltpu.bitcast`` (validated on v5e); on a platform where that does
    not hold the taps would be silently wrong, so the "cat" kernels run
    this tiny self-check once per process before first use.
    """
    backend = jax.default_backend() + ("/interpret" if interpret else "")
    if _BYTE_SHIFT_OK.get(backend):
        return
    rows, c, l = 8, 128, 4
    x = np.arange(rows * c, dtype=np.int64).reshape(rows, c)
    x = ((x * 37 + 11) % 251 - 125).astype(np.int8)

    def kernel(x_ref, l_ref, r_ref):
        left, right = _shift_rows_int8(x_ref[:], l)
        l_ref[:] = left
        r_ref[:] = right

    left, right = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, c), jnp.int8),) * 2,
        interpret=interpret,
    )(jnp.asarray(x))
    pos = np.arange(rows) % l
    exp_left = np.where((pos == 0)[:, None], 0, np.roll(x, 1, axis=0))
    exp_right = np.where((pos == l - 1)[:, None], 0, np.roll(x, -1, axis=0))
    if (not np.array_equal(np.asarray(left), exp_left)
            or not np.array_equal(np.asarray(right), exp_right)):
        raise RuntimeError(
            f"int8 byte-shift self-check failed on backend {backend!r}: "
            "pltpu.bitcast sublane byte order differs from the validated "
            "little-endian v5e packing; use conv_mode='3mm' on this "
            "platform")
    _BYTE_SHIFT_OK[backend] = True


def _conv_int8_cat(xq, wcat, s_eff, b_eff, l):
    """k=3 SAME conv on int8 (rows, Cin) as ONE matmul at 3x contraction:
    taps realized by int8 row shifts (:func:`_shift_rows_int8`) and
    lane-concatenation. Bit-identical accumulation to :func:`_conv_int8`
    (same int32 sums, different tap realization). Returns f32 post-leaky.
    """
    left, right = _shift_rows_int8(xq, l)
    xcat = jnp.concatenate([left, xq, right], axis=1)  # (rows, 3Cin)
    acc = jax.lax.dot_general(xcat, wcat, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_eff + b_eff
    return jnp.where(y > 0, y, _LEAKY_SLOPE * y)


def _run_plan_int8(xq, ws, plan, l0, requant_last=False, conv_mode="3mm"):
    l = l0
    wi = 0
    n_conv = sum(1 for op in plan if op[0] == "conv")
    ci = 0
    x = xq
    for pi, op in enumerate(plan):
        if op[0] == "conv":
            ci += 1
            if conv_mode == "cat":
                y = _conv_int8_cat(x, ws[wi][:], ws[wi + 1][:],
                                   ws[wi + 2][:], l)
                wi += 3
            else:
                y = _conv_int8(x, ws[wi][:], ws[wi + 1][:], ws[wi + 2][:],
                               ws[wi + 3][:], ws[wi + 4][:], l)
                wi += 5
            if pi + 1 < len(plan) and plan[pi + 1][0] == "pool":
                x = y  # pool on f32, requant after (see _conv_int8)
            elif ci < n_conv or requant_last:
                x = _requant(y)
            else:
                x = y  # last layer: f32 out (dequant scales folded)
        elif op[0] == "pool":
            x = _pool2(x)  # f32
            l //= 2
            if ci < n_conv or requant_last:
                x = _requant(x)
        elif op[0] == "mean":
            x = _mean_rows(x, l)
            l = 1
    return x


# ---------------------------------------------------------------------------
# position-major (pm) int8 kernels. Rows within a block are ordered
# (position, cutout): row = p * tile + k for a tile of ``tile`` cutouts.
# The k=3 taps then shift by WHOLE-TILE row offsets — with tile % 32 == 0
# an int8 slice/concat at tile-row offsets moves vreg-aligned data only
# (no byte shuffles, no boundary masks: the zero rows fall out of the
# concat) — vs ~4 ms of byte-shift work per B=128 step in the cutout-major
# "cat" kernels. Pools/means stay free row-major reshapes because position
# pairs are adjacent row groups.
# ---------------------------------------------------------------------------


def _taps_pm(x, tile):
    """left[r] = x[r - tile] (previous position), right[r] = x[r + tile];
    first/last positions zero-padded. Aligned slice-concat, any dtype."""
    z = jnp.zeros_like(x[:tile])
    left = jnp.concatenate([z, x[:-tile]], axis=0)
    right = jnp.concatenate([x[tile:], z], axis=0)
    return left, right


def _conv_int8_pm_acc(xq, wcat, tile):
    """k=3 SAME conv on position-major int8 (l*tile, Cin): one concat-tap
    matmul; same int32 accumulation as :func:`_conv_int8_cat`."""
    left, right = _taps_pm(xq, tile)
    xcat = jnp.concatenate([left, xq, right], axis=1)
    return jax.lax.dot_general(xcat, wcat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _scale_leaky(y, s_eff, b_eff):
    """Dequant + leaky on the f32-cast accumulator. Bit-exact whether
    applied before or after max-pool: s_eff > 0, f32 mul/add rounding and
    leaky are all monotone, so max commutes with the chain — pooling first
    halves this epilogue's VPU work. (The int32->f32 cast happens before
    the pool: Mosaic's compile pathologically blows up reshaping a raw
    int32 matmul accumulator.)"""
    y = y * s_eff + b_eff
    return jnp.where(y > 0, y, _LEAKY_SLOPE * y)


def _conv_int8_pm(xq, wcat, s_eff, b_eff, tile):
    return _scale_leaky(
        _conv_int8_pm_acc(xq, wcat, tile).astype(jnp.float32), s_eff, b_eff)


def _pool2_pm(x, tile):
    """Max-pool/2 over positions: position pairs are adjacent tile-row
    groups, so (l*tile, C) -> (l/2*tile, C) via one free reshape."""
    rows, c = x.shape
    y = x.reshape(rows // (2 * tile), 2 * tile * c)
    return jnp.maximum(y[:, :tile * c], y[:, tile * c:]).reshape(
        rows // 2, c)


def _mean_rows_pm(x, tile, l):
    """Mean over the l positions: (l*tile, C) -> (tile, C). Sequential
    accumulation in position order — bit-identical to :func:`_mean_rows`."""
    rows, c = x.shape
    acc = x[:tile]
    for p in range(1, l):
        acc = acc + x[p * tile:(p + 1) * tile]
    return acc / l


def _run_plan_int8_pm(xq, ws, plan, l0, tile, requant_last=False):
    l = l0
    wi = 0
    n_conv = sum(1 for op in plan if op[0] == "conv")
    ci = 0
    x = xq
    pending_epi = None
    for pi, op in enumerate(plan):
        if op[0] == "conv":
            ci += 1
            acc = _conv_int8_pm_acc(x, ws[wi][:], tile)
            if pi + 1 < len(plan) and plan[pi + 1][0] == "pool":
                # pool the bare f32-cast acc first — the monotone
                # scale+leaky commutes with max (see _scale_leaky),
                # halving that epilogue's VPU work
                x = acc.astype(jnp.float32)
                pending_epi = (ws[wi + 1][:], ws[wi + 2][:])
            else:
                y = _scale_leaky(acc.astype(jnp.float32), ws[wi + 1][:],
                                 ws[wi + 2][:])
                x = _requant(y) if (ci < n_conv or requant_last) else y
            wi += 3
        elif op[0] == "pool":
            x = _pool2_pm(x, tile)
            l //= 2
            x = _scale_leaky(x, *pending_epi)
            pending_epi = None
            if ci < n_conv or requant_last:
                x = _requant(x)
        elif op[0] == "mean":
            x = _mean_rows_pm(x, tile, l)
            l = 1
    return x


def _embed_acc_pm(out, ws_embed, compute_dtype, tile, l4):
    """Gate embed on position-major features: z (tile, 128) accumulated as
    l4 per-position matmuls (the embed weight's (p, c)-flattened row order
    is sliced statically)."""
    we, be = ws_embed
    acc = None
    for p in range(l4):
        xp = out[p * tile:(p + 1) * tile].astype(compute_dtype)
        wp = we[p * 256:(p + 1) * 256].astype(compute_dtype)
        t = jax.lax.dot_general(xp, wp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc + be[:]


def _embed_epilogue_pm(out, ws_embed, z_ref, compute_dtype, tile, l4):
    z_ref[:] = _embed_acc_pm(out, ws_embed, compute_dtype, tile,
                             l4).astype(z_ref.dtype)


def _layer1_pm(cut, wc, b1, scale, l, tile):
    """Backbone layer 1 inside the pm kernel: cutout block (tile, l) f32 ->
    act1 (l*tile, 64) int8 rows in (position, cutout) order.

    The k=3 taps run along the position axis (lanes of the cutout block);
    each position's (tile, 1) lane slice broadcasts against the (1, 64)
    weight row on the VPU — the act1 intermediate never leaves VMEM (the
    XLA form of this op, :func:`backbone_layer1`, is HBM-bound: one s8
    (N*L, 64) write + a slow T(1024)-layout tap read)."""
    z = jnp.zeros_like(cut[:, :1])
    xm = jnp.concatenate([z, cut[:, :-1]], axis=1)   # (tile, l)
    xp = jnp.concatenate([cut[:, 1:], z], axis=1)
    rows = []
    for p in range(l):
        acc = (xm[:, p:p + 1] * wc[0:1] + cut[:, p:p + 1] * wc[1:2]
               + xp[:, p:p + 1] * wc[2:3]) + b1
        rows.append(jnp.where(acc > 0, acc, _LEAKY_SLOPE * acc))
    act1 = jnp.concatenate(rows, axis=0) / scale
    return jnp.clip(jnp.rint(act1), -127, 127).astype(jnp.int8)


def _backbone_int8_pm_kernel(x_ref, *refs, l0, tile, with_embed=False,
                             requant_last=False, with_layer1=False,
                             in_scale=1.0):
    if with_layer1:
        refs, l1w = refs[2:], refs[:2]
    if with_embed:
        out_ref, z_ref = refs[-2], refs[-1]
        ws = refs[:-4]
        ws_embed = refs[-4:-2]
    else:
        out_ref = refs[-1]
        ws = refs[:-1]
    if with_layer1:
        x = _layer1_pm(x_ref[:].astype(jnp.float32), l1w[0][:], l1w[1][:],
                       in_scale, l0, tile)
    else:
        x = x_ref[:]
    out = _run_plan_int8_pm(x, ws, _BACKBONE_PLAN, l0, tile,
                            requant_last=requant_last)
    out_ref[:] = out.astype(out_ref.dtype)
    if with_embed:
        _embed_epilogue_pm(out, ws_embed, z_ref, jnp.bfloat16, tile, l0 // 4)


@functools.partial(jax.jit, static_argnames=("l", "tile", "out_dtype",
                                             "in_scale", "interpret"))
def fused_backbone_int8_pm(act1_q, weights, l: int = 56, tile: int = 160,
                           out_dtype=jnp.int8, embed_weights=None,
                           layer1_weights=None, in_scale: float = 1.0,
                           interpret: bool = False):
    """Position-major int8 backbone: flat (NB*l*tile, 64) layer-1 rows in
    (block, position, cutout) order -> feats (NB*l4*tile, 256) in the same
    order (+ zx (NB*tile, 128) with ``embed_weights``). NB must tile rows
    exactly (pad streams to a tile multiple upstream); weights from
    ``quantize_stack_int8(..., concat_taps=True)``; tile % 32 == 0.

    With ``layer1_weights`` ((3, 64) folded conv weight, (64,) bias) the
    first argument is instead raw CUTOUT rows (NB*tile, l) f32 in
    (stream, cutout) order — layer 1 runs inside the kernel (requantized at
    ``in_scale``) and the (N*L, 64) act1 tensor never exists in HBM."""
    with_layer1 = layer1_weights is not None
    if with_layer1:
        n_rows, c1 = act1_q.shape
        if n_rows % tile:
            raise ValueError(
                f"cutout rows {n_rows} not a multiple of tile {tile}; pad "
                "streams to a tile multiple upstream")
        nb = n_rows // tile
    else:
        rows, c1 = act1_q.shape
        if rows % (l * tile):
            raise ValueError(
                f"act1 rows {rows} not a multiple of l*tile = {l * tile}; "
                "pad streams to a tile multiple upstream")
        nb = rows // (l * tile)
    grid = (nb,)
    l4 = l // 4
    with_embed = embed_weights is not None
    kernel = functools.partial(_backbone_int8_pm_kernel, l0=l, tile=tile,
                               with_embed=with_embed,
                               requant_last=out_dtype == jnp.int8,
                               with_layer1=with_layer1,
                               in_scale=float(in_scale))
    weights = ((list(layer1_weights) if with_layer1 else []) + list(weights)
               + (list(embed_weights) if with_embed else []))
    out_shape = jax.ShapeDtypeStruct((nb * l4 * tile, 256), out_dtype)
    out_spec = pl.BlockSpec((l4 * tile, 256), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if with_embed:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((nb * tile, 128), jnp.bfloat16))
        out_spec = (out_spec,
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    in_block = (tile, c1) if with_layer1 else (l * tile, c1)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec(in_block, lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=out_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(act1_q, *weights)


# ---------------------------------------------------------------------------
# pack-2 ("p2") first stage for the pm backbone. probe_r3c measured the
# tail's first two convs at ~1.3 ms each (B=128) vs a 0.2-0.3 ms int8 MXU
# bound: 64-lane int8 activations stream at ~83 GB/s vs 233+ GB/s for
# 128-lane rows, and K=192/N=64|128 wastes MXU tiles. Packing position
# pairs (2p, 2p+1) into lane slots [0:64 | 64:128]:
#   * rows halve (half the VPU/requant passes, full vregs),
#   * conv2 becomes (rows/2, 4*64) @ (4*64, 2*64)  — K=256, N=128 exact,
#   * conv3 becomes (rows/2, 4*64) @ (4*64, 2*128) — K=256, N=256 exact,
#   * the block-1 max pool collapses to a lane-half max (pairs ARE the
#     pool groups), landing exactly in the unpacked pm layout conv4 needs.
# The packed weights interleave taps with zero blocks:
#   [[w_l, 0], [w_c, w_l], [w_r, w_c], [0, w_r]]
# so the int32 accumulation is BIT-IDENTICAL to the pm kernels (zeros add
# nothing, f32 epilogues see the same values).
# ---------------------------------------------------------------------------


def pack2_conv_weights(wcat, s_eff, b_eff):
    """Concat-tap int8 weight (3*Cin, Cout) -> packed (6*Cin, 2*Cout) with
    epilogue scale/bias tiled over the two lane slots.

    The packed tap input is [prev.slot1 | cur (2 slots) | next.slot0]
    (probe_r3e "p2s": K=4*Cin exact MXU passes, ~5x faster than the
    unpacked pm conv at serving shape); input slots hit weight row-blocks
    [w_l,0; w_c,w_l; w_r,w_c; 0,w_r].

    jnp throughout: the inputs are usually device-resident already and a
    host round-trip through np.asarray is pathologically slow on remote
    backends."""
    wcat = jnp.asarray(wcat)
    cin = wcat.shape[0] // 3
    wl, wc, wr = wcat[:cin], wcat[cin:2 * cin], wcat[2 * cin:]
    z = jnp.zeros_like(wl)
    wp = jnp.concatenate([
        jnp.concatenate([wl, z], axis=1),
        jnp.concatenate([wc, wl], axis=1),
        jnp.concatenate([wr, wc], axis=1),
        jnp.concatenate([z, wr], axis=1),
    ], axis=0)
    tile2 = lambda a: jnp.tile(jnp.asarray(a).reshape(-1), 2)
    return wp, tile2(s_eff), tile2(b_eff)


def pack2_backbone_weights(bb_q):
    """Flat pm backbone weights [wcat, s_eff, b_eff] x 5 (from
    ``quantize_stack_int8(..., concat_taps=True)``) -> p2 weight list:
    packed conv2/conv3 (conv3's epilogue kept UNPACKED — it applies after
    the lane-half pool) + untouched conv4..conv6."""
    w2p, s2p, b2p = pack2_conv_weights(bb_q[0], bb_q[1], bb_q[2])
    w3p, _, _ = pack2_conv_weights(bb_q[3], bb_q[4], bb_q[5])
    s3 = jnp.asarray(bb_q[4], jnp.float32).reshape(-1)
    b3 = jnp.asarray(bb_q[5], jnp.float32).reshape(-1)
    return [w2p, s2p, b2p, w3p, s3, b3] + list(bb_q[6:])


def _taps_p2(x, tile):
    """Packed tap build: [prev.slot1 | cur (2 slots) | next.slot0].

    x: (rows2, 2*Cin) int8 packed rows; returns (rows2, 4*Cin). Row shifts
    run on the full-lane tensor (Mosaic cannot row-concat a lane-offset
    slice); the lane-offset slices then feed the dim-1 concat, which
    Mosaic handles (probe_r3e: this form beats both the unpacked pm conv
    and the zero-padded 6-slot form by a wide margin)."""
    cin = x.shape[1] // 2
    z = jnp.zeros_like(x[:tile])
    prev = jnp.concatenate([z, x[:-tile]], axis=0)
    nxt = jnp.concatenate([x[tile:], z], axis=0)
    return jnp.concatenate([prev[:, cin:], x, nxt[:, :cin]], axis=1)


def _run_plan_int8_p2(xq, ws, l0, tile, requant_last=False):
    """Backbone tail on packed rows: conv2p -> conv3p -> lane-half pool ->
    pm conv4/conv5/conv6 -> pool. ``ws``: [w2p, s2p, b2p, w3p, s3, b3,
    conv4.., conv5.., conv6..] (conv3's scale UNPACKED, applied post-pool).
    xq: (l0/2 * tile, 128) packed int8 rows."""
    w2p, s2p, b2p = ws[0][:], ws[1][:], ws[2][:]
    w3p, s3, b3 = ws[3][:], ws[4][:], ws[5][:]
    dn = (((1,), (0,)), ((), ()))
    # conv2 packed: K=256, N=128
    acc2 = jax.lax.dot_general(_taps_p2(xq, tile), w2p, dn,
                               preferred_element_type=jnp.int32)
    x = _requant(_scale_leaky(acc2.astype(jnp.float32), s2p, b2p))
    # conv3 packed: K=256, N=256; pool the bare acc (monotone epilogue
    # commutes with max; the two lane slots share per-channel scales)
    acc3 = jax.lax.dot_general(_taps_p2(x, tile), w3p, dn,
                               preferred_element_type=jnp.int32)
    a3 = acc3.astype(jnp.float32)
    half = a3.shape[1] // 2
    pooled = jnp.maximum(a3[:, :half], a3[:, half:])
    x = _requant(_scale_leaky(pooled, s3, b3))
    # conv4..conv6 + final pool on the standard pm layout (l = l0 // 2)
    return _run_plan_int8_pm(
        x, ws[6:], (("conv",), ("conv",), ("conv",), ("pool",)),
        l0 // 2, tile, requant_last=requant_last)


def l1_mm_weights(wc, b1, scale, l):
    """Selection-folded layer-1 weights for the in-kernel MXU form.

    ``Wsel[j, p*64+c] = wc[j-p+1, c] / scale`` (boundary taps zero), so
    ``cut @ Wsel`` computes EVERY position's 3-tap conv in one (K=l,
    N=l*64) matmul, output lane-grouped by position; ``1/scale`` folds in
    via leaky's positive homogeneity (leaky(y)/s == leaky(y/s) for s>0).
    Built with jnp so it traces inside the jitted serving step."""
    w = jnp.asarray(wc, jnp.float32) / scale          # (3, 64)
    b = jnp.asarray(b1, jnp.float32).reshape(1, -1) / scale
    wsel = sum(
        jnp.kron(jnp.eye(l, k=1 - k, dtype=jnp.float32), w[k:k + 1])
        for k in range(3)
    )                                                 # (l, l*64)
    bsel = jnp.tile(b, (1, l))                        # (1, l*64)
    return wsel, bsel


def _layer1_p2_mm(cut, wsel, bsel, l, tile):
    """Layer 1 as ONE f32 MXU matmul + vreg-aligned pair packing.

    cut (tile, l) f32 @ Wsel (l, l*64) -> (tile, l*64) lane-grouped by
    position; leaky + rint + clip full-vreg; the (tile, 128) lane slices
    at 128-lane boundaries are exactly the packed position pairs, so the
    pack is l/2 aligned slice-concats along sublanes. Replaces ~l
    per-position (tile, 1)->(tile, 64) VPU broadcasts (probe_r3f: 4.9 ms)
    with ~0.5 ms of MXU work."""
    acc = jax.lax.dot_general(
        cut, wsel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bsel
    a = jnp.where(acc > 0, acc, _LEAKY_SLOPE * acc)
    q = jnp.clip(jnp.rint(a), -127, 127).astype(jnp.int8)
    return jnp.concatenate(
        [q[:, 128 * j:128 * (j + 1)] for j in range(l // 2)], axis=0)


def _layer1_p2(cut, wc, b1, scale, l, tile, mode="repack"):
    """Backbone layer 1 emitting PACKED rows: cutout block (tile, l) f32 ->
    (l/2 * tile, 128) int8 with positions (2p, 2p+1) in lane slots.

    Same per-element math as :func:`_layer1_pm` (bit-identical values,
    different placement). ``mode``: "repack" builds the pm (l*tile, 64)
    int8 rows first (the known-cheap construction) and packs pairs with
    one reshape + lane concat; "pair" lane-concats each position pair
    directly from the f32 broadcasts."""
    if mode == "blend":
        # full-lane construction: each pair row-group is built from
        # (tile, 1) -> (tile, 128) broadcast splats blended with a static
        # lane mask — no sub-vreg lane concats anywhere
        z = jnp.zeros_like(cut[:, :1])
        xm = jnp.concatenate([z, cut[:, :-1]], axis=1)
        xp = jnp.concatenate([cut[:, 1:], z], axis=1)
        w2 = jnp.concatenate([wc, wc], axis=1)  # (3, 128)
        b2 = jnp.concatenate([b1, b1], axis=1)  # (1, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
        left = lane < 64

        def col2(a, pe, po):
            return jnp.where(left, a[:, pe:pe + 1], a[:, po:po + 1])

        rows = []
        for p2 in range(l // 2):
            pe, po = 2 * p2, 2 * p2 + 1
            a = (col2(xm, pe, po) * w2[0:1] + col2(cut, pe, po) * w2[1:2]
                 + col2(xp, pe, po) * w2[2:3]) + b2
            rows.append(jnp.where(a > 0, a, _LEAKY_SLOPE * a))
        act1 = jnp.concatenate(rows, axis=0) / scale
        return jnp.clip(jnp.rint(act1), -127, 127).astype(jnp.int8)
    if mode == "repack":
        act1_pm = _layer1_pm(cut, wc, b1, scale, l, tile)  # (l*tile, 64)
        a3 = act1_pm.reshape(l // 2, 2 * tile, 64)
        return jnp.concatenate(
            [a3[:, :tile], a3[:, tile:]], axis=2
        ).reshape(l // 2 * tile, 128)
    z = jnp.zeros_like(cut[:, :1])
    xm = jnp.concatenate([z, cut[:, :-1]], axis=1)
    xp = jnp.concatenate([cut[:, 1:], z], axis=1)

    def act(p):
        a = (xm[:, p:p + 1] * wc[0:1] + cut[:, p:p + 1] * wc[1:2]
             + xp[:, p:p + 1] * wc[2:3]) + b1
        return jnp.where(a > 0, a, _LEAKY_SLOPE * a)

    rows = []
    for p2 in range(l // 2):
        rows.append(jnp.concatenate([act(2 * p2), act(2 * p2 + 1)], axis=1))
    act1 = jnp.concatenate(rows, axis=0) / scale
    return jnp.clip(jnp.rint(act1), -127, 127).astype(jnp.int8)


def _backbone_int8_p2_kernel(x_ref, *refs, l0, tile, with_embed=False,
                             requant_last=False, with_layer1=True,
                             in_scale=1.0, l1_mode="repack"):
    if with_layer1:
        refs, l1w = refs[2:], refs[:2]
    if with_embed:
        out_ref, z_ref = refs[-2], refs[-1]
        ws = refs[:-4]
        ws_embed = refs[-4:-2]
    else:
        out_ref = refs[-1]
        ws = refs[:-1]
    if with_layer1 and l1_mode == "mm":
        x = _layer1_p2_mm(x_ref[:].astype(jnp.float32), l1w[0][:],
                          l1w[1][:], l0, tile)
    elif with_layer1:
        x = _layer1_p2(x_ref[:].astype(jnp.float32), l1w[0][:], l1w[1][:],
                       in_scale, l0, tile, mode=l1_mode)
    else:
        x = x_ref[:]
    out = _run_plan_int8_p2(x, ws, l0, tile, requant_last=requant_last)
    out_ref[:] = out.astype(out_ref.dtype)
    if with_embed:
        _embed_epilogue_pm(out, ws_embed, z_ref, jnp.bfloat16, tile, l0 // 4)


@functools.partial(jax.jit, static_argnames=("l", "tile", "out_dtype",
                                             "in_scale", "l1_mode",
                                             "interpret"))
def fused_backbone_int8_p2(cutouts, weights, layer1_weights, l: int = 56,
                           tile: int = 160, out_dtype=jnp.int8,
                           embed_weights=None, in_scale: float = 1.0,
                           l1_mode: str = "repack",
                           interpret: bool = False):
    """Pack-2 pm backbone: raw CUTOUT rows (NB*tile, l) f32 in
    (stream, cutout) order -> feats (NB*l4*tile, 256) int8 position-major
    (IDENTICAL layout to :func:`fused_backbone_int8_pm` with
    ``layer1_weights``), ~1.3 ms faster at serving shape (probe_r3c).
    Values are bit-identical with ``l1_mode="repack"``; with the
    ``"mm"`` default of serve-v3, layer 1 folds ``1/in_scale`` into the
    selection weights, which changes f32 rounding — an activation landing
    exactly on an int8 ``rint`` boundary can quantize to the adjacent
    bin, so parity vs the pm kernel holds to 1 LSB, not bitwise.
    ``weights`` from :func:`pack2_backbone_weights`."""
    n_rows, c1 = cutouts.shape
    with_layer1 = layer1_weights is not None
    if l % 4:
        raise ValueError("l must be a multiple of 4")
    if with_layer1:
        if n_rows % tile:
            raise ValueError(
                f"cutout rows {n_rows} not a multiple of tile {tile}")
        nb = n_rows // tile
    else:
        # input is pre-packed act1: (NB * l/2 * tile, 128) int8 rows
        if n_rows % (l // 2 * tile):
            raise ValueError(
                f"packed act1 rows {n_rows} not a multiple of "
                f"l/2*tile = {l // 2 * tile}")
        nb = n_rows // (l // 2 * tile)
    grid = (nb,)
    l4 = l // 4
    with_embed = embed_weights is not None
    if with_layer1 and l1_mode == "mm":
        # fold (wc, b1, 1/in_scale) into the selection matmul weights;
        # traced (runs inside the jitted serving step, not per-call eager)
        layer1_weights = l1_mm_weights(layer1_weights[0],
                                       layer1_weights[1], in_scale, l)
    kernel = functools.partial(_backbone_int8_p2_kernel, l0=l, tile=tile,
                               with_embed=with_embed,
                               requant_last=out_dtype == jnp.int8,
                               with_layer1=with_layer1,
                               in_scale=float(in_scale), l1_mode=l1_mode)
    weights = ((list(layer1_weights) if with_layer1 else [])
               + list(weights)
               + (list(embed_weights) if with_embed else []))
    out_shape = jax.ShapeDtypeStruct((nb * l4 * tile, 256), out_dtype)
    out_spec = pl.BlockSpec((l4 * tile, 256), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if with_embed:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((nb * tile, 128), jnp.bfloat16))
        out_spec = (out_spec,
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    in_block = (tile, c1) if with_layer1 else (l // 2 * tile, c1)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec(in_block, lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=out_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(cutouts, *weights)


def _backbone_int8_p2cut_kernel(scol_ref, ha_ref, schunk_ref, cchunk_ref,
                                *refs, l0, tile, t_blocks, cut_cfg,
                                with_embed=False, requant_last=False):
    from planar_optical_flow_tpu.ops.pallas.cutout_kernel import (
        cutout_block,
    )

    refs, l1w = refs[2:], refs[:2]  # (wsel, bsel) from l1_mm_weights
    if with_embed:
        out_ref, z_ref = refs[-2], refs[-1]
        ws = refs[:-4]
        ws_embed = refs[-4:-2]
    else:
        out_ref = refs[-1]
        ws = refs[:-1]
    j = pl.program_id(0) % t_blocks
    cut = cutout_block(
        scol_ref[0], ha_ref[0], schunk_ref[0], cchunk_ref[0],
        rows=tile, row_off=j * tile, c=l0, **cut_cfg)
    x = _layer1_p2_mm(cut, l1w[0][:], l1w[1][:], l0, tile)
    out = _run_plan_int8_p2(x, ws, l0, tile, requant_last=requant_last)
    out_ref[:] = out.astype(out_ref.dtype)
    if with_embed:
        _embed_epilogue_pm(out, ws_embed, z_ref, jnp.bfloat16, tile, l0 // 4)


@functools.partial(jax.jit, static_argnames=(
    "l", "tile", "out_dtype", "in_scale", "num_pts", "window_width",
    "window_depth", "padding_val", "centered", "area_mode", "angle_inc",
    "interpret"))
def fused_backbone_int8_p2cut(scans, weights, layer1_weights, l: int = 56,
                              tile: int = 160, out_dtype=jnp.int8,
                              embed_weights=None, in_scale: float = 1.0,
                              *, num_pts: int,
                              window_width: float = 1.0,
                              window_depth: float = 0.5,
                              padding_val: float = 29.99,
                              centered: bool = True, area_mode: bool = True,
                              angle_inc: float | None = None,
                              interpret: bool = False):
    """Cutout + pack-2 backbone in ONE Pallas program.

    Raw padded scans (B, P_pad) f32 -> feats (B*P_pad/tile * l4 * tile,
    256) int8 position-major (same layout as :func:`fused_backbone_int8_pm`)
    + the gate embed. The cutout block (``cutout_kernel.cutout_block``
    math: lane gathers + area-mode prefix-sum means) is built in VMEM and
    feeds layer 1 directly — the (B*P_pad, l) f32 cutout tensor never
    exists in HBM, and the cutout's VPU work overlaps the tail's MXU work
    across grid steps. Layer 1 always uses the "mm" selection-matmul form.

    Reference cutout math: ``/root/reference/src/utils/utils.py:259-334``;
    conv stacks: ``/root/reference/src/depracted/model/dr_spaam.py:79-114``.
    """
    import math as _math

    if angle_inc is None:
        angle_inc = _math.radians(0.5)
    b, p_pad = scans.shape
    if p_pad % tile:
        raise ValueError(f"padded scan length {p_pad} not a multiple of "
                         f"tile {tile}")
    if l % 4:
        raise ValueError("l must be a multiple of 4")
    t_blocks = p_pad // tile
    from planar_optical_flow_tpu.ops.pallas.cutout_kernel import cutout_prep

    scans, half_alpha, schunk, cchunk, n_chunks = cutout_prep(
        scans, window_width)
    col = lambda a: a.reshape(b, p_pad, 1)

    wsel, bsel = l1_mm_weights(layer1_weights[0], layer1_weights[1],
                               in_scale, l)
    cut_cfg = dict(p_valid=int(num_pts), n_chunks=n_chunks,
                   angle_inc=float(angle_inc),
                   window_depth=float(window_depth),
                   padding_val=float(padding_val), centered=bool(centered),
                   area_mode=bool(area_mode))
    nb = b * t_blocks
    l4 = l // 4
    with_embed = embed_weights is not None
    kernel = functools.partial(
        _backbone_int8_p2cut_kernel, l0=l, tile=tile, t_blocks=t_blocks,
        cut_cfg=cut_cfg, with_embed=with_embed,
        requant_last=out_dtype == jnp.int8)
    wlist = ([wsel, bsel] + list(weights)
             + (list(embed_weights) if with_embed else []))
    out_shape = jax.ShapeDtypeStruct((nb * l4 * tile, 256), out_dtype)
    out_spec = pl.BlockSpec((l4 * tile, 256), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if with_embed:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((nb * tile, 128), jnp.bfloat16))
        out_spec = (out_spec,
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    tb = t_blocks
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda i: (i // tb, i % tb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i: (i // tb, i % tb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, 128), lambda i: (i // tb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, 128), lambda i: (i // tb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                          memory_space=pltpu.VMEM) for w in wlist],
        out_specs=out_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(col(scans), col(half_alpha), schunk, cchunk, *wlist)


def _head_cls_reg(x, wc, bc, wr, br, compute_dtype):
    """Final cls/reg projections on the pooled head features: lives
    exactly once so every head kernel (float, int8 cutout-major, int8 pm,
    fused gate+head, serve_cell) computes the same epilogue."""
    xc = x.astype(compute_dtype)
    dn = (((1,), (0,)), ((), ()))
    cls = jax.lax.dot_general(
        xc, wc.astype(compute_dtype), dn,
        preferred_element_type=jnp.float32) + bc
    reg = jax.lax.dot_general(
        xc, wr.astype(compute_dtype), dn,
        preferred_element_type=jnp.float32) + br
    return cls, reg


def _head_int8_pm_kernel(x_ref, *refs, l0, tile, compute_dtype):
    cls_ref, reg_ref = refs[-2], refs[-1]
    ws = refs[:-6]
    wc, bc, wr, br = (r[:] for r in refs[-6:-2])
    x = _run_plan_int8_pm(x_ref[:], ws, _HEAD_PLAN, l0, tile)
    cls, reg = _head_cls_reg(x, wc, bc, wr, br, compute_dtype)
    cls_ref[:] = cls.astype(cls_ref.dtype)
    reg_ref[:] = reg.astype(reg_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_classes", "l4", "tile",
                                             "compute_dtype", "interpret"))
def fused_head_int8_pm(feats_q, conv_weights, head_weights,
                       num_classes: int = 1, l4: int = 14, tile: int = 160,
                       compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Position-major int8 head: flat (NB*l4*tile, 256) template rows in
    (block, position, cutout) order -> cls/reg (NB*tile, .) in
    (block, cutout) order."""
    rows, c = feats_q.shape
    if rows % (l4 * tile):
        raise ValueError(
            f"{rows} pm template rows is not a whole number of "
            f"(l4={l4} * tile={tile}) blocks — trailing cutouts would be "
            "silently dropped")
    nb = rows // (l4 * tile)
    grid = (nb,)
    weights = list(conv_weights) + list(head_weights)
    kernel = functools.partial(_head_int8_pm_kernel, l0=l4, tile=tile,
                               compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb * tile, num_classes), jnp.float32),
            jax.ShapeDtypeStruct((nb * tile, 2), jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((l4 * tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=(
            pl.BlockSpec((tile, num_classes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(feats_q, *weights)


def _backbone_int8_kernel(x_ref, *refs, l0, with_embed=False,
                          requant_last=False, conv_mode="3mm"):
    if with_embed:
        out_ref, z_ref = refs[-2], refs[-1]
        ws = refs[:-4]
        ws_embed = refs[-4:-2]
    else:
        out_ref = refs[-1]
        ws = refs[:-1]
    out = _run_plan_int8(x_ref[:], ws, _BACKBONE_PLAN, l0,
                         requant_last=requant_last, conv_mode=conv_mode)
    out_ref[:] = out.astype(out_ref.dtype)
    if with_embed:
        # int8 out: the feats scale is pre-folded into the embed weight
        _embed_epilogue(out, ws_embed, z_ref, jnp.bfloat16)


def _head_int8_kernel(x_ref, *refs, l0, compute_dtype, conv_mode="3mm"):
    cls_ref, reg_ref = refs[-2], refs[-1]
    ws = refs[:-6]
    wc, bc, wr, br = (r[:] for r in refs[-6:-2])
    x = _run_plan_int8(x_ref[:], ws, _HEAD_PLAN, l0, conv_mode=conv_mode)
    cls, reg = _head_cls_reg(x, wc, bc, wr, br, compute_dtype)
    cls_ref[:] = cls.astype(cls_ref.dtype)
    reg_ref[:] = reg.astype(reg_ref.dtype)


@functools.partial(jax.jit, static_argnames=("l", "tile", "out_dtype",
                                             "conv_mode", "interpret"))
def fused_backbone_int8(act1_q, weights, l: int = 56, tile: int = 64,
                        out_dtype=jnp.bfloat16, embed_weights=None,
                        conv_mode: str = "3mm", interpret: bool = False):
    """int8 layer-1 activation (N*L, 64) -> (N*L//4, 256) flat features
    (dequantized to ``out_dtype`` by the last layer's epilogue). With
    ``embed_weights``, also emits zx (N, 128); returns (feats, zx).

    ``conv_mode="cat"`` (weights from ``quantize_stack_int8(...,
    concat_taps=True)``): taps as int8 row shifts + ONE matmul per layer at
    3x contraction depth; bit-identical results to "3mm". Callers on
    un-validated platforms should run :func:`check_byte_shift` once
    (outside jit) before using the "cat" mode."""
    nl, c1 = act1_q.shape
    n = nl // l
    n_pad = _pad_rows(n, tile)
    x = jnp.pad(act1_q, ((0, (n_pad - n) * l), (0, 0)))
    grid = (n_pad // tile,)
    l4 = l // 4
    with_embed = embed_weights is not None
    kernel = functools.partial(_backbone_int8_kernel, l0=l,
                               with_embed=with_embed,
                               requant_last=out_dtype == jnp.int8,
                               conv_mode=conv_mode)
    weights = list(weights) + (list(embed_weights) if with_embed else [])
    out_shape = jax.ShapeDtypeStruct((n_pad * l4, 256), out_dtype)
    out_spec = pl.BlockSpec((tile * l4, 256), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if with_embed:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n_pad, 128), jnp.bfloat16))
        out_spec = (out_spec,
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[pl.BlockSpec((tile * l, c1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=out_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, *weights)
    if with_embed:
        out, zx = res
        return out[:n * l4], zx[:n]
    return res[:n * l4]


@functools.partial(jax.jit, static_argnames=("num_classes", "l4", "tile",
                                             "compute_dtype", "conv_mode",
                                             "interpret"))
def fused_head_int8(feats_q, conv_weights, head_weights, num_classes: int = 1,
                    l4: int = 14, tile: int = 64,
                    compute_dtype=jnp.bfloat16, conv_mode: str = "3mm",
                    interpret: bool = False):
    """int8 flat (N*L4, 256) features -> f32 (cls, reg).

    ``conv_mode="cat"``: see :func:`fused_backbone_int8`."""
    nl, c = feats_q.shape
    n = nl // l4
    n_pad = _pad_rows(n, tile)
    x = jnp.pad(feats_q, ((0, (n_pad - n) * l4), (0, 0)))
    grid = (n_pad // tile,)
    weights = list(conv_weights) + list(head_weights)
    kernel = functools.partial(_head_int8_kernel, l0=l4,
                               compute_dtype=compute_dtype,
                               conv_mode=conv_mode)
    cls, reg = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, num_classes), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((tile * l4, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=(
            pl.BlockSpec((tile, num_classes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, *weights)
    return cls[:n], reg[:n]
