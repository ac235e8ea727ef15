"""Round-3 probe F: in-kernel layer-1 construction variants at serving
shape (the p2s conv form needs PACKED (l/2*tile, 128) act1 rows; probe
which construction is cheap). Kernels emit act1 only.

  pm    — per-position rows.append (the shipped _layer1_pm), (l*tile, 64)
  p2    — per-pair lane-concat (the slow r3 _layer1_p2), (l/2*tile, 128)
  p2r   — compute (tile, l, 64) broadcast FMA once, then assemble packed
          rows via per-pair lane-concat of (tile, 64) slices
  p2m   — matmul form: act(p) for all p via ONE (tile, l) x padded-weight
          trick is not expressible; instead pairwise: build (tile, 128)
          per pair directly from the 3-tap FMA on two lane columns
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
B, P, tile, l = 128, 480, 160, 56
NB = B * P // tile
_LEAKY = 0.1


def _sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0][:1, :1])


def timeit(fn, *args, n=20):
    o = fn(*args)
    _sync(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    _sync(o)
    return (time.perf_counter() - t0) / n * 1000


rng = np.random.default_rng(0)
cut = jnp.asarray(rng.uniform(-1, 1, (NB * tile, l)), jnp.float32)
wc = jnp.asarray(rng.normal(size=(3, 64)) * 0.3, jnp.float32)
b1 = jnp.asarray(rng.normal(size=(1, 64)) * 0.1, jnp.float32)
scale = 0.01


def act_of(cutb, wcr, b1r, p):
    z = jnp.zeros_like(cutb[:, :1])
    xm = jnp.concatenate([z, cutb[:, :-1]], axis=1)
    xp = jnp.concatenate([cutb[:, 1:], z], axis=1)
    a = (xm[:, p:p + 1] * wcr[0:1] + cutb[:, p:p + 1] * wcr[1:2]
         + xp[:, p:p + 1] * wcr[2:3]) + b1r
    return jnp.where(a > 0, a, _LEAKY * a)


def build(mode):
    if mode == "pm":
        rows, lanes = l * tile, 64
    else:
        rows, lanes = l * tile // 2, 128

    def kernel(x_ref, w_ref, b_ref, o_ref):
        cutb = x_ref[:].astype(jnp.float32)
        wcr, b1r = w_ref[:], b_ref[:]
        if mode == "pm":
            rows_ = [act_of(cutb, wcr, b1r, p) for p in range(l)]
            act1 = jnp.concatenate(rows_, axis=0)
        elif mode == "p2":
            rows_ = [jnp.concatenate(
                [act_of(cutb, wcr, b1r, 2 * p2),
                 act_of(cutb, wcr, b1r, 2 * p2 + 1)], axis=1)
                for p2 in range(l // 2)]
            act1 = jnp.concatenate(rows_, axis=0)
        else:  # p2w: widened broadcast — both positions' taps in one FMA
            z = jnp.zeros_like(cutb[:, :1])
            xm = jnp.concatenate([z, cutb[:, :-1]], axis=1)
            xp = jnp.concatenate([cutb[:, 1:], z], axis=1)
            w2 = jnp.concatenate([wcr, wcr], axis=1)  # (3, 128)
            b2 = jnp.concatenate([b1r, b1r], axis=1)
            rows_ = []
            for p2 in range(l // 2):
                pe, po = 2 * p2, 2 * p2 + 1
                # lanes [0:64] use taps of pe, lanes [64:128] taps of po:
                # select per-lane tap columns via two-column concat
                m = jnp.concatenate([xm[:, pe:pe + 1], xm[:, po:po + 1]],
                                    axis=1)  # (tile, 2)
                c = jnp.concatenate([cutb[:, pe:pe + 1],
                                     cutb[:, po:po + 1]], axis=1)
                r = jnp.concatenate([xp[:, pe:pe + 1], xp[:, po:po + 1]],
                                    axis=1)
                # broadcast (tile, 2) against (2*64) via repeat to 128:
                mr = pltpu.repeat(m, 64, axis=1)
                cr = pltpu.repeat(c, 64, axis=1)
                rr = pltpu.repeat(r, 64, axis=1)
                a = mr * w2[0:1] + cr * w2[1:2] + rr * w2[2:3] + b2
                rows_.append(jnp.where(a > 0, a, _LEAKY * a))
            act1 = jnp.concatenate(rows_, axis=0)
        q = jnp.clip(jnp.rint(act1 / scale), -127, 127).astype(jnp.int8)
        o_ref[:] = q

    f = pl.pallas_call(
        kernel, grid=(NB,),
        in_specs=[pl.BlockSpec((tile, l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for a in (wc, b1)],
        out_specs=pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * rows, lanes), jnp.int8),
        compiler_params=CP,
    )
    return jax.jit(lambda a: f(a, wc, b1))


for mode in ("pm", "p2", "p2w"):
    try:
        t = timeit(build(mode), cut)
        print(f"layer1 {mode}: {t:.3f} ms", flush=True)
    except Exception as e:
        print(f"layer1 {mode}: FAILED {str(e)[:200]}", flush=True)
