"""Prototype: ConvBlock (conv3 + BatchNorm-train + leaky) fwd+bwd as
Pallas kernels, A/B'd against XLA's autodiff at the DR-SPAAM backbone
training shape — the go/no-go probe for a custom training-kernel
campaign (STATUS.md stopping-point check).

Design (BN's global batch stats force per-layer sync points):
  fwd  K1: conv (rolled taps, MXU) + bias -> c (bf16) + per-block
           partial sums of the f32 acc (for exact stats)
       XLA: mean/var from partials (tiny)
       K2: y = leaky(c * mul + add)
  bwd  B1: recompute z from c; g = dy * leaky'(z); partials sum(g),
           sum(g * xhat)
       XLA: reduce partials -> Sg, Sgx (also = dbeta, dscale)
       B2: dc = (scale/sigma) (g - Sg/m - xhat Sgx/m); dx via transposed
           rolled matmuls; per-block dW/db partials
       XLA: reduce dW/db partials

Traffic/layer: fwd x + c(w) + c(r) + y(w), bwd c+dy, x+c+dy+dx(w)
= ~10 activation passes vs XLA's fused graph. The MXU side uses the
serving kernels' rolled-tap matmul form.

Run: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/probe_pallas_convblock.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLOPE = 0.1
_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _masks(rows, l):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    pos = jax.lax.rem(r, l)
    return pos == 0, pos == (l - 1)


def _taps(x, rows, l):
    first, last = _masks(rows, l)
    left = jnp.where(first, 0.0, pltpu.roll(x, 1, axis=0))
    right = jnp.where(last, 0.0, pltpu.roll(x, rows - 1, axis=0))
    return left, right


def _mm(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _fwd_conv_kernel(x_ref, w_ref, b_ref, c_ref, s1_ref, s2_ref, *, l):
    x = x_ref[:].astype(jnp.float32)
    rows, cin = x.shape
    left, right = _taps(x, rows, l)
    w = w_ref[:]
    acc = _mm(left, w[:cin]) + _mm(x, w[cin:2 * cin]) + _mm(right,
                                                            w[2 * cin:])
    c = acc + b_ref[:]
    c_ref[:] = c.astype(c_ref.dtype)
    s1_ref[0] = jnp.sum(c, axis=0, keepdims=True)
    s2_ref[0] = jnp.sum(c * c, axis=0, keepdims=True)


def _fwd_apply_kernel(c_ref, mul_ref, add_ref, y_ref):
    z = c_ref[:].astype(jnp.float32) * mul_ref[:] + add_ref[:]
    y_ref[:] = jnp.where(z > 0, z, SLOPE * z).astype(y_ref.dtype)


def _bwd_part_kernel(c_ref, dy_ref, mul_ref, add_ref, mu_ref, inv_ref,
                     g1_ref, g2_ref):
    c = c_ref[:].astype(jnp.float32)
    z = c * mul_ref[:] + add_ref[:]
    g = dy_ref[:].astype(jnp.float32) * jnp.where(z > 0, 1.0, SLOPE)
    xhat = (c - mu_ref[:]) * inv_ref[:]
    g1_ref[0] = jnp.sum(g, axis=0, keepdims=True)
    g2_ref[0] = jnp.sum(g * xhat, axis=0, keepdims=True)


def _bwd_main_kernel(x_ref, c_ref, dy_ref, w_ref, mul_ref, add_ref,
                     mu_ref, inv_ref, coef_ref, sg_ref, sgx_ref,
                     dx_ref, dw_ref, db_ref, *, l, m):
    c = c_ref[:].astype(jnp.float32)
    z = c * mul_ref[:] + add_ref[:]
    g = dy_ref[:].astype(jnp.float32) * jnp.where(z > 0, 1.0, SLOPE)
    xhat = (c - mu_ref[:]) * inv_ref[:]
    dc = coef_ref[:] * (g - sg_ref[:] / m - xhat * (sgx_ref[:] / m))
    rows, cin = x_ref.shape
    w = w_ref[:]
    # dx[r] = dc[r] Wc^T + dc[r+1] Wl^T (r not cutout-last)
    #       + dc[r-1] Wr^T (r not cutout-first)
    first, last = _masks(rows, l)
    wl, wc, wr = w[:cin], w[cin:2 * cin], w[2 * cin:]
    dcl = jnp.where(last, 0.0, pltpu.roll(dc, rows - 1, axis=0))  # dc[r+1]
    dcr = jnp.where(first, 0.0, pltpu.roll(dc, 1, axis=0))        # dc[r-1]
    dx = (_mm(dc, wc.T) + _mm(dcl, wl.T) + _mm(dcr, wr.T))
    dx_ref[:] = dx.astype(dx_ref.dtype)
    x = x_ref[:].astype(jnp.float32)
    left, right = _taps(x, rows, l)
    dwl = jax.lax.dot_general(left, dc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwc = jax.lax.dot_general(x, dc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwr = jax.lax.dot_general(right, dc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw_ref[0] = jnp.concatenate([dwl, dwc, dwr], axis=0)[None]
    db_ref[0] = jnp.sum(dc, axis=0, keepdims=True)


def _specs(rows_b, c, nb):
    blk = pl.BlockSpec((rows_b, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    part = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return blk, vec, part


@functools.partial(jax.jit, static_argnames=("l", "tile_ct", "eps"))
def pallas_convblock_fwd(x, wcat, bias, scale, beta, l: int,
                         tile_ct: int = 100, eps: float = 1e-5):
    rows, cin = x.shape
    f = wcat.shape[1]
    rows_b = tile_ct * l
    nb = rows // rows_b
    blk_in, vec, part = _specs(rows_b, cin, nb)
    blk_out, _, _ = _specs(rows_b, f, nb)
    c, s1, s2 = pl.pallas_call(
        functools.partial(_fwd_conv_kernel, l=l),
        out_shape=(jax.ShapeDtypeStruct((rows, f), jnp.bfloat16),
                   jax.ShapeDtypeStruct((nb, 1, f), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, f), jnp.float32)),
        grid=(nb,),
        in_specs=[blk_in,
                  pl.BlockSpec(wcat.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec],
        out_specs=(blk_out, part, part),
        compiler_params=_CP,
    )(x, wcat, bias.reshape(1, -1))
    m = float(rows)
    mean = jnp.sum(s1[:, 0], axis=0) / m
    var = jnp.maximum(0.0, jnp.sum(s2[:, 0], axis=0) / m - mean * mean)
    inv = jax.lax.rsqrt(var + eps)
    mul = (inv * scale).reshape(1, -1)
    add = (beta - mean * inv * scale).reshape(1, -1)
    y = pl.pallas_call(
        _fwd_apply_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, f), jnp.bfloat16),
        grid=(nb,),
        in_specs=[blk_out,
                  pl.BlockSpec((1, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk_out,
        compiler_params=_CP,
    )(c, mul, add)
    return y, (c, mean, var, inv, mul, add)


@functools.partial(jax.jit, static_argnames=("l", "tile_ct"))
def pallas_convblock_bwd(x, wcat, scale, res, dy, l: int,
                         tile_ct: int = 100):
    c, mean, var, inv, mul, add = res
    rows, cin = x.shape
    f = wcat.shape[1]
    rows_b = tile_ct * l
    nb = rows // rows_b
    blk_in, vec, part = _specs(rows_b, cin, nb)
    blk_out, vecf, partf = _specs(rows_b, f, nb)
    g1, g2 = pl.pallas_call(
        _bwd_part_kernel,
        out_shape=(jax.ShapeDtypeStruct((nb, 1, f), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, f), jnp.float32)),
        grid=(nb,),
        in_specs=[blk_out, blk_out, vecf, vecf, vecf, vecf],
        out_specs=(partf, partf),
        compiler_params=_CP,
    )(c, dy, mul, add, mean.reshape(1, -1), inv.reshape(1, -1))
    sg = jnp.sum(g1[:, 0], axis=0)
    sgx = jnp.sum(g2[:, 0], axis=0)
    m = float(rows)
    coef = (scale * inv).reshape(1, -1)
    dx, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_main_kernel, l=l, m=m),
        out_shape=(jax.ShapeDtypeStruct((rows, cin), jnp.bfloat16),
                   jax.ShapeDtypeStruct((nb, 1, 3 * cin, f), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, f), jnp.float32)),
        grid=(nb,),
        in_specs=[blk_in, blk_out, blk_out,
                  pl.BlockSpec(wcat.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vecf, vecf, vecf, vecf, vecf, vecf, vecf],
        out_specs=(blk_in,
                   pl.BlockSpec((1, 1, 3 * cin, f), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   partf),
        compiler_params=_CP,
    )(x, c, dy, wcat, mul, add, mean.reshape(1, -1), inv.reshape(1, -1),
      coef, sg.reshape(1, -1), sgx.reshape(1, -1))
    dw = jnp.sum(dwp[:, 0], axis=0)
    db = jnp.sum(dbp[:, 0], axis=0)
    dscale = sgx  # sum(g * xhat)
    dbeta = sg
    return dx, dw, db, dscale, dbeta


def main():
    import flax.linen as nn
    from planar_optical_flow_tpu.models.blocks import ConvBlock

    B, L, C, F = 39600, 56, 64, 64
    TILE = 100
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.normal(size=(B, L, C)) * 0.5, jnp.bfloat16)
    block = ConvBlock(F, 3, impl="conv")
    variables = block.init(jax.random.PRNGKey(0), x3[:2].astype(jnp.float32),
                           train=True)
    p = variables["params"]
    w = jnp.asarray(p["Conv_0"]["kernel"], jnp.float32)  # (3, C, F)
    b = jnp.asarray(p["Conv_0"]["bias"], jnp.float32)
    scale = jnp.asarray(p["BatchNorm_0"]["scale"], jnp.float32)
    beta = jnp.asarray(p["BatchNorm_0"]["bias"], jnp.float32)
    rng2 = np.random.default_rng(1)
    scale = scale * (1.0 + 0.1 * jnp.asarray(rng2.normal(size=F),
                                             jnp.float32))
    beta = beta + 0.1 * jnp.asarray(rng2.normal(size=F), jnp.float32)
    p = {"Conv_0": {"kernel": w, "bias": b},
         "BatchNorm_0": {"scale": scale, "bias": beta}}

    # ---- XLA reference: value_and_grad through ConvBlock (bf16 params)
    dy3 = jnp.asarray(rng.normal(size=(B, L, F)), jnp.bfloat16)

    def xla_fwd_bwd(params, x, dy):
        def f(params, x):
            p16 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), params)
            y, _ = block.apply(
                {"params": p16, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(params, x)
        return val, grads

    xla = jax.jit(xla_fwd_bwd)
    val, (gp, gx) = xla(p, x3, dy3)
    float(np.asarray(gx[0, 0, 0]))  # axon block_until_ready is lazy
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        val, (gp, gx) = xla(p, x3, dy3)
    float(np.asarray(gx[0, 0, 0]))
    xla_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"XLA   fwd+bwd: {xla_ms:7.2f} ms", flush=True)

    # ---- Pallas pipeline
    xf = x3.reshape(B * L, C)
    dyf = dy3.reshape(B * L, F)
    wcat = w.reshape(3 * C, F)

    @jax.jit
    def pall(xf, wcat, b, scale, beta, dyf):
        y, res = pallas_convblock_fwd(xf, wcat, b, scale, beta, l=L,
                                      tile_ct=TILE)
        dx, dw, db, dsc, dbe = pallas_convblock_bwd(
            xf, wcat, scale, res, dyf, l=L, tile_ct=TILE)
        return y, dx, dw, db, dsc, dbe

    out = pall(xf, wcat, b, scale, beta, dyf)
    float(np.asarray(out[1][0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pall(xf, wcat, b, scale, beta, dyf)
    float(np.asarray(out[1][0, 0]))
    pal_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"Pallas fwd+bwd: {pal_ms:7.2f} ms   ({xla_ms / pal_ms:.2f}x)",
          flush=True)

    # ---- parity (bf16 tolerances)
    y, dx, dw, db, dsc, dbe = out

    def rel(a, bb):
        a, bb = np.asarray(a, np.float32), np.asarray(bb, np.float32)
        d = np.abs(a - bb)
        s = np.maximum(np.abs(bb), 1e-3)
        return float((d / s).max()), float(np.corrcoef(
            a.ravel(), bb.ravel())[0, 1])

    # recompute XLA y for comparison
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    y_ref, _ = block.apply(
        {"params": p16, "batch_stats": variables["batch_stats"]},
        x3, train=True, mutable=["batch_stats"])
    print("y    :", rel(y.reshape(B, L, F), y_ref))
    print("dx   :", rel(dx.reshape(B, L, C), gx))
    print("dw   :", rel(dw.reshape(3, C, F), gp["Conv_0"]["kernel"]))
    print("db   :", rel(db.reshape(-1), gp["Conv_0"]["bias"]))
    print("dscale:", rel(dsc, gp["BatchNorm_0"]["scale"]))
    print("dbeta:", rel(dbe, gp["BatchNorm_0"]["bias"]))


if __name__ == "__main__":
    main()
