"""The whole DR-SPAAM streaming cell as ONE Pallas program per stream.

Reference semantics: backbone conv stack -> spatial-attention template
update -> head (``/root/reference/src/depracted/model/dr_spaam.py:79-215``),
which the serve-v3 pipeline runs as three Pallas kernels (backbone, gate,
head) with the int8 feature/template tensors round-tripping through HBM
between them (~880 MB/step at B=128). This kernel keeps the entire cell in
VMEM: per grid step (= one stream) it reads the stream's cutouts
(ct x L f32), the carried template (int8) and embedding, and writes the new
template (in place, over the carry), z, sim band and cls/reg logits —
features never touch HBM.

All math is shared with (and bit-identical to) the position-major kernels
in :mod:`conv_stack` / :mod:`..infer.fast_gate` at ``tile == ct`` —
enforced by the direct cell-vs-pm parity test
(``tests/test_int8_serving_gate.py::test_serve_cell_matches_pm_direct``,
int8 carries within 1 LSB): the
k=3 conv taps are whole-``ct``-row slice-concats, pools pair adjacent
position row-groups, the gate mixes each position's (ct, 256) template
slice with one int8 MXU matmul against the banded-attention matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planar_optical_flow_tpu.ops.pallas.conv_stack import (
    _BACKBONE_PLAN,
    _HEAD_PLAN,
    _LEAKY_SLOPE,
    _head_cls_reg,
    _layer1_pm,
    _run_plan_int8_pm,
    _embed_acc_pm,
)


def _attention(zx_f, zt_f, hw, ct, ct_valid):
    """Banded attention weights from pre-activation embeddings (ct, 128).

    Returns (attn_dense (ct, ct) f32, sim (ct, win) f32 with the
    reference's edge-clamped duplicate band entries, valid mask)."""
    ex = jnp.where(zx_f > 0, zx_f, _LEAKY_SLOPE * zx_f)
    et = jnp.where(zt_f > 0, zt_f, _LEAKY_SLOPE * zt_f)

    cols = []
    for o in range(-hw, hw + 1):
        sh = pltpu.roll(et, (-o) % ct, axis=0) if o else et
        cols.append(jnp.sum(ex * sh, axis=-1, keepdims=True))
    s = jnp.concatenate(cols, axis=1)  # (ct, 2hw+1)

    ri = jax.lax.broadcasted_iota(jnp.int32, (ct, 2 * hw + 1), 0)
    oi = jax.lax.broadcasted_iota(jnp.int32, (ct, 2 * hw + 1), 1) - hw
    valid = ((ri + oi >= 0) & (ri + oi < ct_valid) & (ri < ct_valid))
    masked = jnp.where(valid, s, -1e10)
    m = jnp.max(masked, axis=1, keepdims=True)
    e = jnp.exp(masked - m)
    e = jnp.where(valid, e, 0.0)
    attn = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-20)

    rr = jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 1)
    diag = cc - rr
    attn_d = jnp.zeros((ct, ct), jnp.float32)
    for k, o in enumerate(range(-hw, hw + 1)):
        attn_d = jnp.where(diag == o, attn[:, k:k + 1], attn_d)

    c0 = jnp.sum(ex * et[0:1], axis=-1, keepdims=True)
    c1 = jnp.sum(ex * et[ct_valid - 1:ct_valid], axis=-1, keepdims=True)
    clamped = jnp.where(ri + oi < 0, c0, c1)
    sim = jnp.where(valid, s, clamped)
    return attn_d, sim


def _cell_kernel(cut_ref, zt_ref, t_ref, *refs, l, ct, l4, hw, alpha,
                 ct_valid, in_scale, s_x, s_t, s_out, num_classes):
    (out_t_ref, z_ref, sim_ref, cls_ref, reg_ref) = refs[-5:]
    wrefs = refs[:-5]
    l1w, l1b = wrefs[0], wrefs[1]
    bb_ws = wrefs[2:2 + 15]            # 5 layers x (wcat, s_eff, b_eff)
    we, be = wrefs[17], wrefs[18]
    hd_ws = wrefs[19:19 + 15]
    wc, bc, wr, br = (r[:] for r in wrefs[34:38])

    # backbone (layer 1 + conv tail + requant to int8 feats), all in VMEM
    act1 = _layer1_pm(cut_ref[:].astype(jnp.float32), l1w[:], l1b[:],
                      in_scale, l, ct)
    feats = _run_plan_int8_pm(act1, bb_ws, _BACKBONE_PLAN, l, ct,
                              requant_last=True)  # (l4*ct, 256) int8

    # gate embed (weights pre-scaled by the feats scale) — bf16 cast
    # matches the three-kernel path bit-exactly
    zx_bf = _embed_acc_pm(feats, (we, be), jnp.bfloat16, ct,
                          l4).astype(jnp.bfloat16)
    zx_f = zx_bf.astype(jnp.float32)
    zt_bf = zt_ref[0]
    attn_d, sim = _attention(zx_f, zt_bf.astype(jnp.float32), hw, ct,
                             ct_valid)
    attn_i8 = jnp.clip(jnp.rint(attn_d * 127.0), -127, 127).astype(jnp.int8)

    zmix = jax.lax.dot_general(
        attn_d.astype(jnp.bfloat16), zt_bf.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    z_ref[0] = (alpha * zx_f + (1.0 - alpha) * zmix).astype(z_ref.dtype)
    sim_ref[0] = sim.astype(sim_ref.dtype)

    # template update: per position, one int8 MXU mix against the banded
    # attention; new template written in place over the carry
    t = t_ref[0]  # (l4*ct, 256) int8
    rows = []
    for p in range(l4):
        tp = t[p * ct:(p + 1) * ct]
        mixed32 = jax.lax.dot_general(
            attn_i8, tp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        mixed = mixed32.astype(jnp.float32) * (s_t / 127.0)
        xp = feats[p * ct:(p + 1) * ct].astype(jnp.float32) * s_x
        ntp = alpha * xp + (1.0 - alpha) * mixed
        rows.append(jnp.clip(jnp.rint(ntp / s_out), -127, 127
                             ).astype(jnp.int8))
    new_t = jnp.concatenate(rows, axis=0)
    out_t_ref[0] = new_t

    # head on the fresh template
    hx = _run_plan_int8_pm(new_t, hd_ws, _HEAD_PLAN, l4, ct)  # (ct, 128)
    cls, reg = _head_cls_reg(hx, wc, bc, wr, br, jnp.bfloat16)
    cls_ref[:] = cls.astype(cls_ref.dtype)
    reg_ref[:] = reg.astype(reg_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "l", "ct", "alpha", "window_size", "ct_valid", "in_scale", "s_x",
    "s_t", "s_out", "num_classes", "interpret"))
def serve_cell_int8(cutouts, zt, t_q, layer1_w, bb_q, embed_w, hd_q,
                    hd_head_w, l: int, ct: int, alpha: float,
                    window_size: int, in_scale: float, s_x: float,
                    s_t: float, s_out: float, ct_valid: int | None = None,
                    num_classes: int = 1, interpret: bool = False):
    """One fused streaming step for B streams (carry path).

    cutouts: (B*ct, L) f32 rows in (stream, cutout) order; zt: (B*ct, 128)
    bf16 carried embedding; t_q: (B*l4*ct, 256) int8 carried template in
    (stream, position, cutout) rows (``pm`` layout at tile == ct).
    Returns (new_t, z, sim (B*ct, win) f32, cls (B*ct, ncls) f32,
    reg (B*ct, 2) f32); new_t/z are written in place over t_q/zt (pass the
    donated carry).
    """
    n_rows, c_l = cutouts.shape
    b = n_rows // ct
    l4 = l // 4
    hw = window_size // 2
    win = 2 * hw + 1
    zdim = zt.shape[-1]
    zt3 = zt.reshape(b, ct, zdim)
    t3 = t_q.reshape(b, l4 * ct, 256)
    weights = ([layer1_w[0], layer1_w[1]] + list(bb_q) + list(embed_w)
               + list(hd_q) + list(hd_head_w))
    kernel = functools.partial(
        _cell_kernel, l=l, ct=ct, l4=l4, hw=hw, alpha=float(alpha),
        ct_valid=ct_valid or ct, in_scale=float(in_scale), s_x=float(s_x),
        s_t=float(s_t), s_out=float(s_out), num_classes=num_classes,
    )
    new_t, z, sim, cls, reg = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(t3.shape, jnp.int8),
            jax.ShapeDtypeStruct(zt3.shape, zt.dtype),
            jax.ShapeDtypeStruct((b, ct, win), jnp.float32),
            jax.ShapeDtypeStruct((b * ct, num_classes), jnp.float32),
            jax.ShapeDtypeStruct((b * ct, 2), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((ct, c_l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, zdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l4 * ct, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                          memory_space=pltpu.VMEM) for w in weights],
        out_specs=(
            pl.BlockSpec((1, l4 * ct, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, zdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, win), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, num_classes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        # in-place carry: new_t over t_q, z over zt (the serving step
        # donates the carry)
        input_output_aliases={2: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cutouts, zt3, t3, *weights)
    return (new_t.reshape(t_q.shape), z.reshape(zt.shape),
            sim.reshape(b * ct, win), cls, reg)
