"""Serving-path spatial-attention gate, reformulated for TPU.

The module gate (:class:`models.spatial_drow.SpatialAttentionGate`,
rebuilding reference ``dr_spaam.py:176-215``) computes a dense
``(B, ct, ct)`` similarity + masked softmax + ``attn @ template`` mix, even
though only the ±window/2 band of offsets is ever nonzero. At 450 cutouts
and D = L*C = 3584 template features the dense mix alone is 186 GFLOP per
step at B=128 and re-reads the (400+ MB) template several times — measured
~15 ms on v5e, template-bandwidth bound.

This module computes the SAME math in band form:

* similarity per offset ``o in [-hw, hw]``: ``s_o[i] = emb_x[i] . emb_t[i+o]``
  — 11 shifted 128-d dot products (VPU) instead of a (450, 450) matmul,
* softmax over the (validity-masked) offset axis — equivalent to the dense
  masked softmax because the reference's edge-clamped band mask is exactly
  the set of in-range positions,
* mix ``mixed[i] = sum_o attn[i, o] * template[i + o]`` — a banded weighted
  sum (11 VPU FMAs) instead of a (450, 450) @ (450, 3584) matmul; runs as a
  Pallas kernel with the template tile VMEM-resident (read once), with an
  XLA shifted-FMA fallback,
* ``sim_band`` (the flow-head feature) is recovered exactly — including the
  reference's edge-clamped duplicate entries — via a static (ct, window)
  offset-index map.

Embedding carry: the embed layer is Dense + eval-mode BatchNorm, i.e. a
single affine map A. Affine maps commute with the band mix (per-row scalar
weights, shifts along the cutout axis), so

    z_{t+1} = A(template_{t+1}) = alpha * A(x) + (1-alpha) * sum_o w_o shift(A(template_t), o)

and the gate can CARRY the pre-activation embedding ``z`` (B, ct, 128)
instead of re-embedding the (B, ct, 3584) template every step — saving one
large matmul and a full template read per step.

Eval-mode only (BatchNorm running stats); training uses the flax module.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAKY_SLOPE = 0.1


class GateParams(NamedTuple):
    w: jax.Array  # (D, 128) folded Dense+BN weight
    b: jax.Array  # (128,) folded bias
    alpha: float
    window_size: int


def fold_gate_params(gate_variables, alpha: float, window_size: int,
                     dtype=jnp.float32) -> GateParams:
    """Fold the gate's embed Dense + eval BatchNorm into one affine map.

    ``gate_variables``: {"params": {"embed": {kernel, bias},
    "embed_bn": {scale, bias}}, "batch_stats": {"embed_bn": {mean, var}}}
    (the ``gate`` sub-tree of the model variables).
    """
    p = gate_variables["params"]
    s = gate_variables["batch_stats"]
    w = np.asarray(p["embed"]["kernel"], np.float32)
    b = np.asarray(p["embed"].get("bias", np.zeros(w.shape[-1])), np.float32)
    gamma = np.asarray(p["embed_bn"]["scale"], np.float32)
    beta = np.asarray(p["embed_bn"]["bias"], np.float32)
    mean = np.asarray(s["embed_bn"]["mean"], np.float32)
    var = np.asarray(s["embed_bn"]["var"], np.float32)
    eps = 1e-5
    scale = gamma / np.sqrt(var + eps)
    return GateParams(
        w=jnp.asarray(w * scale, dtype),
        b=jnp.asarray((b - mean) * scale + beta, dtype),
        alpha=float(alpha),
        window_size=int(window_size),
    )


@functools.lru_cache(maxsize=8)
def _band_index_map(ct: int, window_size: int) -> np.ndarray:
    """(ct, window) indices into the offset axis reproducing the reference's
    edge-clamped band gather: slot o of row i reads offset clip(i+o)-i."""
    hw = window_size // 2
    i = np.arange(ct)[:, None]
    o = np.arange(-hw, hw + 1)[None, :]
    return (np.clip(i + o, 0, ct - 1) - i + hw).astype(np.int32)


def _shift_rows(a, o):
    """shifted[i] = a[i + o] along axis 1, zero-padded (static o)."""
    if o == 0:
        return a
    if o > 0:
        pad = jnp.zeros_like(a[:, :o])
        return jnp.concatenate([a[:, o:], pad], axis=1)
    pad = jnp.zeros_like(a[:, o:])
    return jnp.concatenate([pad, a[:, :o]], axis=1)


def _band_attention(params: GateParams, zx, z_t):
    """Banded logits + masked softmax + exact sim_band.

    zx, z_t: (B, ct, 128) pre-activation embeddings.
    Returns (attn (B, ct, window) with exact zeros at invalid offsets,
             sim_band (B, ct, window) reference-clamped similarity values).
    """
    ct = zx.shape[1]
    hw = params.window_size // 2
    ex = jnp.where(zx > 0, zx, _LEAKY_SLOPE * zx)
    et = jnp.where(z_t > 0, z_t, _LEAKY_SLOPE * z_t)

    s = jnp.stack(
        [jnp.sum(ex * _shift_rows(et, o), axis=-1)
         for o in range(-hw, hw + 1)],
        axis=-1,
    )  # (B, ct, window)

    i = jnp.arange(ct)[:, None]
    o = jnp.arange(-hw, hw + 1)[None, :]
    valid = ((i + o >= 0) & (i + o < ct))  # (ct, window)
    dt = s.dtype
    masked = jnp.where(valid[None], s, jnp.asarray(-1e10, dt))
    attn = jax.nn.softmax(masked, axis=-1)
    attn = jnp.where(valid[None], attn, jnp.asarray(0, dt))
    attn = attn / jnp.maximum(attn.sum(axis=-1, keepdims=True),
                              jnp.asarray(1e-20, dt))

    idx = jnp.asarray(_band_index_map(ct, params.window_size))
    sim_band = jnp.take_along_axis(s, jnp.broadcast_to(idx[None], s.shape),
                                   axis=-1)
    return attn, sim_band


def _banded_mix_xla(attn, template, hw):
    """mixed[i] = sum_o attn[i, o] * template[i + o] via shifted FMAs."""
    mixed = None
    for k, o in enumerate(range(-hw, hw + 1)):
        term = attn[..., k:k + 1] * _shift_rows(template, o)
        mixed = term if mixed is None else mixed + term
    return mixed


def _mix_kernel(attn_ref, x_ref, t_ref, out_ref, *, hw, alpha):
    """One (ct, D-chunk) block: new_template = alpha*x + (1-alpha)*banded mix.

    Rolled rows that wrap around carry attn == 0 (the validity mask), so no
    edge masking is needed.
    """
    # rolls in f32: Mosaic's sublane rotate is 32-bit only (bf16 sublanes
    # are 2-packed); accumulate in f32 anyway
    t = t_ref[0].astype(jnp.float32)       # (ct, d_chunk)
    attn = attn_ref[0].astype(jnp.float32)  # (ct, window)
    acc = attn[:, hw:hw + 1] * t  # o = 0
    for k, o in enumerate(range(-hw, hw + 1)):
        if o == 0:
            continue
        # circular roll by (-o mod ct); wrapped rows have attn == 0
        acc += attn[:, k:k + 1] * pltpu.roll(t, (-o) % t.shape[0], axis=0)
    x = x_ref[0].astype(jnp.float32)
    out_ref[0] = (alpha * x + (1.0 - alpha) * acc).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "window_size",
                                             "d_chunk", "interpret"))
def banded_mix_update(attn, x, template, alpha: float, window_size: int,
                      d_chunk: int = 896, interpret: bool = False):
    """Fused ``alpha * x + (1 - alpha) * (banded attn) @ template``.

    attn: (B, ct, window); x, template: (B, ct, D). One Pallas program; the
    template block stays VMEM-resident so it is read from HBM exactly once.

    NOTE: not on any serve path anymore — ``gate_step(use_pallas=True)``
    routes to the fully fused :func:`gate_fused` (attention + mix + carry
    in one program). Kept as the standalone mix primitive it was measured
    as (``experiments/probe_r2b.py``) and as the reference implementation
    for the fused kernel's mix stage.
    """
    b, ct, d = template.shape
    hw = window_size // 2
    if d % d_chunk:
        d_chunk = d
    grid = (b, d // d_chunk)
    kernel = functools.partial(_mix_kernel, hw=hw, alpha=alpha)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, ct, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ct, 2 * hw + 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, d_chunk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, d_chunk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ct, d_chunk), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        attn.reshape(b, ct, 2 * hw + 1),
        x.reshape(b, ct, d),
        template.reshape(b, ct, d),
    )


def _gate_fused_kernel(zx_ref, zt_ref, x_ref, t_ref,
                       out_ref, z_ref, sim_ref, attn_scr, *, hw, alpha, ct,
                       ct_valid, compute_dtype):
    """Whole post-embed gate for one (stream, D-chunk) block (2-D refs:
    (ct, d_chunk) template/x slices of the flat (N, D) arrays).

    The banded attention is computed from the (ct, 128) embeddings with
    cheap in-VMEM rolls, then EXPANDED to a dense (ct, ct) banded matrix via
    11 diagonal selects so the template mix runs as ONE MXU matmul
    (ct, ct) @ (ct, d_chunk) — the MXU absorbs the off-band zeros far
    cheaper than the VPU can shift the template. The dense matrix is built
    once per stream on the first D-chunk and cached in VMEM scratch (the
    chunk axis is the inner grid dimension); new_z / sim_band are also
    written there.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        attn_d, z_new, sim = _attention_body(
            zx_ref[:], zt_ref[:], hw=hw, alpha=alpha, ct=ct,
            ct_valid=ct_valid, mix_dtype=compute_dtype)
        attn_scr[:] = attn_d.astype(attn_scr.dtype)
        z_ref[:] = z_new.astype(z_ref.dtype)
        sim_ref[:] = sim.astype(sim_ref.dtype)

    t = t_ref[:]
    mixed = jax.lax.dot_general(
        attn_scr[:].astype(compute_dtype), t.astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    x = x_ref[:].astype(jnp.float32)
    out_ref[:] = (alpha * x + (1.0 - alpha) * mixed).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ct", "alpha", "window_size",
                                             "d_chunk", "ct_valid",
                                             "interpret"))
def gate_fused_flat(zx, zt, x, template, ct: int, alpha: float,
                    window_size: int, d_chunk: int = 896,
                    ct_valid: int | None = None, interpret: bool = False):
    """Fused post-embed gate on FLAT arrays: (new_template, new_z, sim_band).

    zx, zt: (N, 128) pre-activation embeddings; x, template: (N, D) with
    N = n_streams * ct (stream-major). Blocks are ct-row slices — no
    padded (B, ct, D) reshape anywhere. One pallas program over a
    (N/ct, D/d_chunk) grid.
    """
    n, d = template.shape
    hw = window_size // 2
    if d % d_chunk:
        d_chunk = d
    grid = (n // ct, d // d_chunk)
    zdim = zx.shape[-1]
    kernel = functools.partial(_gate_fused_kernel, hw=hw, alpha=alpha,
                               ct=ct, ct_valid=ct_valid or ct,
                               compute_dtype=x.dtype)
    zspec = pl.BlockSpec((ct, zdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((ct, d_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    new_t, new_z, sim = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((n, zdim), zx.dtype),
            jax.ShapeDtypeStruct((n, 2 * hw + 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[zspec, zspec, dspec, dspec],
        out_specs=(
            dspec,
            pl.BlockSpec((ct, zdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2 * hw + 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((ct, ct), jnp.float32)],
        # write new_t over template and new_z over zt: the serving step
        # donates the carry, and without the alias XLA inserts a full
        # template copy to satisfy the donation (same as the pm kernel)
        input_output_aliases={3: 0, 1: 1},
        interpret=interpret,
    )(zx, zt, x, template)
    return new_t, new_z, sim


def gate_fused(zx, zt, x, template, alpha: float, window_size: int,
               d_chunk: int = 896, interpret: bool = False):
    """(B, ct, D) convenience wrapper over :func:`gate_fused_flat`."""
    b, ct, d = template.shape
    zdim = zx.shape[-1]
    new_t, new_z, sim = gate_fused_flat(
        zx.reshape(b * ct, zdim), zt.reshape(b * ct, zdim),
        x.reshape(b * ct, d), template.reshape(b * ct, d),
        ct=ct, alpha=alpha, window_size=window_size, d_chunk=d_chunk,
        interpret=interpret,
    )
    return (new_t.reshape(b, ct, d), new_z.reshape(b, ct, zdim),
            sim.reshape(b, ct, -1))


def embed(params: GateParams, x):
    """Pre-activation embedding zx = x @ W + b, f32 accumulation.

    Accepts (B, ct, D) or flat (N, D)."""
    shape = x.shape
    d = shape[-1]
    z = jax.lax.dot_general(
        x.reshape(-1, d), params.w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + params.b
    return z.reshape(*shape[:-1], -1).astype(x.dtype)


def gate_step(params: GateParams, x, template, z_t, *,
              use_pallas: bool = True, interpret: bool = False):
    """One gate update.

    Args:
      x: (B, ct, D) current-scan features.
      template: (B, ct, D) carried template.
      z_t: (B, ct, 128) carried pre-activation embedding of ``template``.

    Returns (new_template, new_z, sim_band).
    """
    hw = params.window_size // 2
    zx = embed(params, x)
    if use_pallas:
        # fully fused: attention + mix + blend + z update + sim_band in one
        # pallas program (the mix rides the MXU as a dense banded matmul)
        return gate_fused(zx, z_t, x, template, params.alpha,
                          params.window_size, interpret=interpret)

    attn, sim_band = _band_attention(params, zx, z_t)
    mixed = _banded_mix_xla(attn, template, hw)
    new_template = params.alpha * x + (1.0 - params.alpha) * mixed
    z_mixed = _banded_mix_xla(attn, z_t, hw)
    new_z = params.alpha * zx + (1.0 - params.alpha) * z_mixed
    return new_template, new_z, sim_band


def gate_bootstrap(params: GateParams, x):
    """First scan of a stream: template = x, and the gate only supplies the
    self-similarity band (reference ``dr_spaam.py:242-245``).

    Returns (template, z, sim_band).
    """
    zx = embed(params, x)
    _, sim_band = _band_attention(params, zx, zx)
    return x, zx, sim_band


# ---------------------------------------------------------------------------
# int8-carry gate: template and current features live in int8 (symmetric,
# fixed calibrated scales), so the gate's HBM traffic halves and the mix
# matmul runs at the int8 MXU rate (the banded attention is exactly
# representable at scale 1/127 since attn is in [0, 1]). All arithmetic is
# f32 inside the kernel; only storage and matmul operands are int8.
# ---------------------------------------------------------------------------


def _attention_body(zx_raw, zt_raw, *, hw, alpha, ct, ct_valid,
                    mix_dtype=jnp.bfloat16):
    """Shared front half of ALL fused gate kernels (f32/bf16 and int8),
    on one stream's (ct, zdim) embedding block: leaky-ReLU embeddings ->
    banded similarity -> masked softmax -> dense banded attention.

    Returns ``(attn_d f32 (ct, ct) dense banded attention, z_new
    (ct, zdim) f32 alpha-blend of the z carry, sim (ct, win) f32 with the
    reference's edge-clamped duplicates)``. ``mix_dtype`` is the operand
    dtype of the z-mix matmul (bf16 on the int8 paths; the float kernel
    passes its compute dtype). All gate kernels must stay bit-identical
    per precision — their parity tests assert it — so the banded math
    lives here exactly once (int8 callers quantize ``attn_d`` to scale
    1/127 themselves)."""
    zx = zx_raw.astype(jnp.float32)  # (ct, zdim)
    zt = zt_raw.astype(jnp.float32)
    ex = jnp.where(zx > 0, zx, _LEAKY_SLOPE * zx)
    et = jnp.where(zt > 0, zt, _LEAKY_SLOPE * zt)

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

    zmix = jax.lax.dot_general(
        attn_d.astype(mix_dtype), zt_raw.astype(mix_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    z_new = alpha * zx + (1.0 - alpha) * zmix
    c0 = jnp.sum(ex * et[0:1], axis=-1, keepdims=True)
    c1 = jnp.sum(ex * et[ct_valid - 1:ct_valid], axis=-1, keepdims=True)
    clamped = jnp.where(ri + oi < 0, c0, c1)
    sim = jnp.where(valid, s, clamped)
    return attn_d, z_new, sim


def _quantize_attn(attn_d):
    """attn in [0, 1]: int8 at scale 1/127."""
    return jnp.clip(jnp.rint(attn_d * 127.0), -127, 127).astype(jnp.int8)


def _mix_requant(attn_q, x_q, t_q, alpha, s_x, s_t, s_out):
    """int8 template mix + requant on one (ct, D) slice: the alpha-blend
    of the dequantized input features with the attention-mixed template,
    re-quantized to the carry scale. Lives exactly once — every int8 gate
    kernel (cutout-major, pm grid, per-stream, fused gate+head) calls
    this, so their carries cannot drift apart."""
    mixed32 = jax.lax.dot_general(
        attn_q, t_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # int8 @ int8
    mixed = mixed32.astype(jnp.float32) * (s_t / 127.0)
    xf = x_q.astype(jnp.float32) * s_x
    new_t = alpha * xf + (1.0 - alpha) * mixed
    return jnp.clip(jnp.rint(new_t / s_out), -127, 127).astype(jnp.int8)


def _gate_int8_pm_stream_kernel(zx_ref, zt_ref, x_ref, t_ref,
                                out_ref, z_ref, sim_ref, *, hw, alpha,
                                ct, ct_valid, l4, tile, s_x, s_t, s_out):
    """Whole-stream position-major int8 gate: ONE grid step per stream.

    vs :func:`_gate_int8_pm_kernel` (grid (stream, position)): the banded
    attention is built once and the l4 per-position mix matmuls run in the
    same kernel body — no per-position grid overhead, and the (ct, ct)
    attention never round-trips through scratch across grid steps.
    Blocks: x/t/out (1, T, l4, tile, C); zx/zt/z (1, ct, 128);
    sim (1, ct, win).
    """
    attn_d, z_new, sim = _attention_body(
        zx_ref[0], zt_ref[0], hw=hw, alpha=alpha, ct=ct, ct_valid=ct_valid)
    attn_q = _quantize_attn(attn_d)
    z_ref[0] = z_new.astype(z_ref.dtype)
    sim_ref[0] = sim.astype(sim_ref.dtype)

    t_blocks = ct // tile
    for p in range(l4):
        # per-position (ct, C) template slice: T tile-row groups stacked
        t_p = t_ref[0, :, p].reshape(ct, -1)
        x_p = x_ref[0, :, p].reshape(ct, -1)
        out_ref[0, :, p] = _mix_requant(
            attn_q, x_p, t_p, alpha, s_x, s_t, s_out
        ).reshape(t_blocks, tile, t_p.shape[-1])


def _gate_head_int8_pm_stream_kernel(zx_ref, zt_ref, x_ref, t_ref, *refs,
                                     hw, alpha, ct, ct_valid, l4, tile,
                                     s_x, s_t, s_out, compute_dtype):
    """Per-stream gate + head in ONE program: the freshly mixed int8
    template is consumed by the head conv plan straight out of VMEM —
    the (S*T*l4*tile, 256) template never round-trips through HBM between
    the gate and the head (~0.25 ms of pure bandwidth at B=128), and one
    program launch disappears. Math is byte-identical to
    :func:`_gate_int8_pm_stream_kernel` followed by
    ``conv_stack._head_int8_pm_kernel`` (asserted by
    ``tests/test_fast_gate.py``)."""
    from planar_optical_flow_tpu.ops.pallas.conv_stack import (
        _HEAD_PLAN, _head_cls_reg, _run_plan_int8_pm,
    )

    out_ref, z_ref, sim_ref, cls_ref, reg_ref = refs[-5:]
    ws = refs[:-5]
    hd_ws = ws[:-4]  # 5 conv layers x (wcat, s_eff, b_eff)
    wc, bc, wr, br = (r[:] for r in ws[-4:])

    attn_d, z_new, sim = _attention_body(
        zx_ref[0], zt_ref[0], hw=hw, alpha=alpha, ct=ct, ct_valid=ct_valid)
    attn_q = _quantize_attn(attn_d)
    z_ref[0] = z_new.astype(z_ref.dtype)
    sim_ref[0] = sim.astype(sim_ref.dtype)

    t_blocks = ct // tile
    for p in range(l4):
        t_p = t_ref[0, :, p].reshape(ct, -1)
        x_p = x_ref[0, :, p].reshape(ct, -1)
        out_ref[0, :, p] = _mix_requant(
            attn_q, x_p, t_p, alpha, s_x, s_t, s_out
        ).reshape(t_blocks, tile, t_p.shape[-1])

    for tb in range(t_blocks):
        x_tb = out_ref[0, tb].reshape(l4 * tile, -1)  # fresh int8 template
        h = _run_plan_int8_pm(x_tb, hd_ws, _HEAD_PLAN, l4, tile)
        cls, reg = _head_cls_reg(h, wc, bc, wr, br, compute_dtype)
        cls_ref[0, tb] = cls.astype(cls_ref.dtype)
        reg_ref[0, tb] = reg.astype(reg_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "ct", "tile", "l4", "alpha", "window_size", "s_x", "s_t", "s_out",
    "ct_valid", "num_classes", "interpret"))
def gate_head_fused_int8_pm(zx, zt, x_q, t_q, hd_conv_weights,
                            hd_head_weights, ct: int, tile: int, l4: int,
                            alpha: float, window_size: int, s_x: float,
                            s_t: float, s_out: float,
                            ct_valid: int | None = None,
                            num_classes: int = 1,
                            interpret: bool = False):
    """Fused per-stream gate + head on position-major int8 arrays.

    Same contract as :func:`gate_fused_int8_pm` (``per_stream=True``) plus
    the head: returns ``(new_template, new_z, sim_band, cls, reg)`` with
    cls/reg as flat ``(S*T*tile, .)`` f32 rows in (stream, tile-block,
    cutout) order — the exact layout of ``conv_stack.fused_head_int8_pm``.
    ``hd_conv_weights``/``hd_head_weights``: the head weight lists from
    ``quantize_stack_int8(concat_taps=True)`` / ``head_stack_weights``
    (``s_out`` must equal the head's input scale, as in the int8c step).
    """
    n, c = x_q.shape
    zdim = zx.shape[-1]
    if ct % tile:
        raise ValueError(f"ct={ct} not a multiple of tile={tile}")
    t_blocks = ct // tile
    if n % (t_blocks * l4 * tile):
        raise ValueError(
            f"{n} pm rows is not a whole number of streams "
            f"(t_blocks={t_blocks} * l4={l4} * tile={tile})")
    s_streams = n // (t_blocks * l4 * tile)
    hw = window_size // 2
    win = 2 * hw + 1
    zx5 = zx.reshape(s_streams, ct, zdim)
    zt5 = zt.reshape(s_streams, ct, zdim)
    x5 = x_q.reshape(s_streams, t_blocks, l4, tile, c)
    t5 = t_q.reshape(s_streams, t_blocks, l4, tile, c)
    weights = list(hd_conv_weights) + list(hd_head_weights)
    kernel = functools.partial(
        _gate_head_int8_pm_stream_kernel, hw=hw, alpha=alpha, ct=ct,
        ct_valid=ct_valid or ct, l4=l4, tile=tile, s_x=float(s_x),
        s_t=float(s_t), s_out=float(s_out), compute_dtype=jnp.bfloat16,
    )
    zspec = pl.BlockSpec((1, ct, zdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, t_blocks, l4, tile, c),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    new_t, new_z, sim, cls, reg = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x5.shape, jnp.int8),
            jax.ShapeDtypeStruct((s_streams, ct, zdim), zx.dtype),
            jax.ShapeDtypeStruct((s_streams, ct, win), jnp.float32),
            jax.ShapeDtypeStruct((s_streams, t_blocks, tile, num_classes),
                                 jnp.float32),
            jax.ShapeDtypeStruct((s_streams, t_blocks, tile, 2),
                                 jnp.float32),
        ),
        grid=(s_streams,),
        in_specs=[zspec, zspec, dspec, dspec]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=(
            dspec,
            zspec,
            pl.BlockSpec((1, ct, win), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_blocks, tile, num_classes),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_blocks, tile, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        input_output_aliases={3: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(zx5, zt5, x5, t5, *weights)
    return (new_t.reshape(n, c), new_z.reshape(s_streams * ct, zdim),
            sim.reshape(s_streams * ct, win),
            cls.reshape(s_streams * ct, num_classes),
            reg.reshape(s_streams * ct, 2))


def _gate_int8_pm_kernel(zx_ref, zt_ref, x_ref, t_ref,
                         out_ref, z_ref, sim_ref, attn_scr, *, hw, alpha,
                         ct, ct_valid, s_x, s_t, s_out):
    """Position-major int8 gate: grid (stream, position). At p == 0 the
    banded attention, z carry and sim_band are computed from the (ct, 128)
    embeddings and the dense banded attention is cached in VMEM scratch;
    every position then mixes its (ct, 256) template slice with ONE int8
    MXU matmul. Same math as :func:`_gate_int8_kernel` on a different
    template layout (no (ct, D) row blocks — the D axis is the grid)."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        attn_d, z_new, sim = _attention_body(
            zx_ref[0], zt_ref[0], hw=hw, alpha=alpha, ct=ct,
            ct_valid=ct_valid)
        attn_scr[:] = _quantize_attn(attn_d)
        z_ref[0] = z_new.astype(z_ref.dtype)
        sim_ref[0] = sim.astype(sim_ref.dtype)

    t = t_ref[:].reshape(ct, -1)  # (1,T,1,tile,C) -> (ct, C), free merge
    out_ref[:] = _mix_requant(
        attn_scr[:], x_ref[:].reshape(ct, -1), t, alpha, s_x, s_t, s_out
    ).reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("ct", "tile", "l4", "alpha",
                                             "window_size", "ct_valid",
                                             "s_x", "s_t", "s_out",
                                             "per_stream", "interpret"))
def gate_fused_int8_pm(zx, zt, x_q, t_q, ct: int, tile: int, l4: int,
                       alpha: float, window_size: int, s_x: float,
                       s_t: float, s_out: float, ct_valid: int | None = None,
                       per_stream: bool = False,
                       interpret: bool = False):
    """int8-carry fused gate on POSITION-MAJOR flat arrays.

    zx, zt: (S*ct, 128) embeddings in (stream, cutout) order; x_q, t_q:
    (S*T*l4*tile, C) int8 in (stream, tile-block, position, cutout) order
    with T = ct // tile (the layout emitted by
    ``fused_backbone_int8_pm``). Returns (new_template int8 same layout,
    new_z, sim_band (S*ct, window) f32).

    ``per_stream``: one grid step per stream running all l4 position
    mixes in-kernel (fewer grid steps, attention built once per stream
    with no scratch round-trip). Default False = the round-2
    (stream, position) grid with the attention cached in VMEM scratch.
    """
    n, c = x_q.shape
    zdim = zx.shape[-1]
    if ct % tile:
        raise ValueError(f"ct={ct} not a multiple of tile={tile}")
    t_blocks = ct // tile
    if n % (t_blocks * l4 * tile):
        raise ValueError(
            f"{n} pm rows is not a whole number of streams "
            f"(t_blocks={t_blocks} * l4={l4} * tile={tile})")
    s_streams = n // (t_blocks * l4 * tile)
    hw = window_size // 2
    win = 2 * hw + 1
    zx5 = zx.reshape(s_streams, ct, zdim)
    zt5 = zt.reshape(s_streams, ct, zdim)
    x5 = x_q.reshape(s_streams, t_blocks, l4, tile, c)
    t5 = t_q.reshape(s_streams, t_blocks, l4, tile, c)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if per_stream:
        kernel = functools.partial(
            _gate_int8_pm_stream_kernel, hw=hw, alpha=alpha, ct=ct,
            ct_valid=ct_valid or ct, l4=l4, tile=tile, s_x=float(s_x),
            s_t=float(s_t), s_out=float(s_out),
        )
        zspec = pl.BlockSpec((1, ct, zdim), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec((1, t_blocks, l4, tile, c),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        new_t, new_z, sim = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(x5.shape, jnp.int8),
                jax.ShapeDtypeStruct((s_streams, ct, zdim), zx.dtype),
                jax.ShapeDtypeStruct((s_streams, ct, win), jnp.float32),
            ),
            grid=(s_streams,),
            in_specs=[zspec, zspec, dspec, dspec],
            out_specs=(
                dspec,
                zspec,
                pl.BlockSpec((1, ct, win), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            input_output_aliases={3: 0, 1: 1},
            compiler_params=cp,
            interpret=interpret,
        )(zx5, zt5, x5, t5)
        return (new_t.reshape(n, c), new_z.reshape(s_streams * ct, zdim),
                sim.reshape(s_streams * ct, win))
    kernel = functools.partial(
        _gate_int8_pm_kernel, hw=hw, alpha=alpha, ct=ct,
        ct_valid=ct_valid or ct, s_x=float(s_x), s_t=float(s_t),
        s_out=float(s_out),
    )
    zspec = pl.BlockSpec((1, ct, zdim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, t_blocks, 1, tile, c),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM)
    new_t, new_z, sim = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x5.shape, jnp.int8),
            jax.ShapeDtypeStruct((s_streams, ct, zdim), zx.dtype),
            jax.ShapeDtypeStruct((s_streams, ct, win), jnp.float32),
        ),
        grid=(s_streams, l4),
        in_specs=[zspec, zspec, dspec, dspec],
        out_specs=(
            dspec,
            zspec,
            pl.BlockSpec((1, ct, win), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((ct, ct), jnp.int8)],
        # write new_t over t_q and new_z over zt: the serving step donates
        # the carry, and without the alias XLA inserts a full-template copy
        # (220 MB at B=128, ~0.7 ms) to satisfy the donation
        input_output_aliases={3: 0, 1: 1},
        compiler_params=cp,
        interpret=interpret,
    )(zx5, zt5, x5, t5)
    return (new_t.reshape(n, c), new_z.reshape(s_streams * ct, zdim),
            sim.reshape(s_streams * ct, win))


def _gate_int8_kernel(zx_ref, zt_ref, x_ref, t_ref,
                      out_ref, z_ref, sim_ref, attn_scr, *, hw, alpha, ct,
                      ct_valid, s_x, s_t, s_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        attn_d, z_new, sim = _attention_body(
            zx_ref[:], zt_ref[:], hw=hw, alpha=alpha, ct=ct,
            ct_valid=ct_valid)
        attn_scr[:] = _quantize_attn(attn_d)
        z_ref[:] = z_new.astype(z_ref.dtype)
        sim_ref[:] = sim.astype(sim_ref.dtype)

    out_ref[:] = _mix_requant(attn_scr[:], x_ref[:], t_ref[:], alpha,
                              s_x, s_t, s_out)


@functools.partial(jax.jit, static_argnames=("ct", "alpha", "window_size",
                                             "d_chunk", "ct_valid", "s_x",
                                             "s_t", "s_out", "interpret"))
def gate_fused_int8(zx, zt, x_q, t_q, ct: int, alpha: float,
                    window_size: int, s_x: float, s_t: float, s_out: float,
                    d_chunk: int = 896, ct_valid: int | None = None,
                    interpret: bool = False):
    """int8-carry fused gate on FLAT arrays.

    zx, zt: (N, 128) f32/bf16 pre-activation embeddings; x_q, t_q: (N, D)
    int8 at scales ``s_x`` / ``s_t``. Returns (new_template int8 at
    ``s_out``, new_z, sim_band).
    """
    n, d = t_q.shape
    hw = window_size // 2
    if d % d_chunk:
        d_chunk = d
    grid = (n // ct, d // d_chunk)
    zdim = zx.shape[-1]
    kernel = functools.partial(
        _gate_int8_kernel, hw=hw, alpha=alpha, ct=ct,
        ct_valid=ct_valid or ct, s_x=float(s_x), s_t=float(s_t),
        s_out=float(s_out),
    )
    zspec = pl.BlockSpec((ct, zdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((ct, d_chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    new_t, new_z, sim = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, zdim), zx.dtype),
            jax.ShapeDtypeStruct((n, 2 * hw + 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[zspec, zspec, dspec, dspec],
        out_specs=(
            dspec,
            pl.BlockSpec((ct, zdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2 * hw + 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((ct, ct), jnp.int8)],
        # in-place carry update under donation (same as the pm kernel)
        input_output_aliases={3: 0, 1: 1},
        interpret=interpret,
    )(zx, zt, x_q, t_q)
    return new_t, new_z, sim
