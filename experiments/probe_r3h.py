"""Round-3 probe H: head kernel tap forms at serving shape.

The head is now the dominant serve cost (5.32 ms of the 11.7 ms device
step) at ~80% of its 4.28 ms int8 MXU bound. Its convs contract K=768 via
one concat-tap matmul (``_conv_int8_pm_acc``); at Cin=256 the (rows, 768)
int8 concat build is real VMEM traffic. Variants:

  cat  — shipped: taps concat -> one (rows, 3C) @ (3C, Cout) matmul
  3mm  — three (rows, C) @ (C, Cout) int32 matmuls accumulated (no
         768-lane build; left/right shifted tensors still materialize)
  3mmf — 3mm with the f32 conversion after the final add only
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
B, P, tile, l4 = 128, 480, 160, 14
NB = B * P // tile
ROWS = NB * l4 * tile
_LEAKY = 0.1
CH = [(256, 256), (256, 256), (256, 512), (512, 256), (256, 128)]
POOL_AFTER = 2  # pool follows conv index 2 (0-based), mean after conv 4


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
x_q = jnp.asarray(rng.integers(-127, 128, (ROWS, 256)), jnp.int8)
ws = []
for ci, co in CH:
    ws += [jnp.asarray(rng.integers(-127, 128, (3 * ci, co)), jnp.int8),
           jnp.asarray(rng.uniform(1e-4, 2e-4, (co,)), jnp.float32),
           jnp.asarray(rng.normal(size=(co,)) * 0.05, jnp.float32)]
wc = jnp.asarray(rng.normal(size=(128, 1)) * 0.05, jnp.float32)
bc = jnp.asarray(np.zeros((1,)), jnp.float32)
wr = jnp.asarray(rng.normal(size=(128, 2)) * 0.05, jnp.float32)
br = jnp.asarray(np.zeros((2,)), jnp.float32)


def taps(x, tile):
    z = jnp.zeros_like(x[:tile])
    left = jnp.concatenate([z, x[:-tile]], axis=0)
    right = jnp.concatenate([x[tile:], z], axis=0)
    return left, right


def conv(x, wcat, mode):
    left, right = taps(x, tile)
    dn = (((1,), (0,)), ((), ()))
    if mode == "cat":
        xcat = jnp.concatenate([left, x, right], axis=1)
        return jax.lax.dot_general(xcat, wcat, dn,
                                   preferred_element_type=jnp.int32)
    cin = wcat.shape[0] // 3
    wl, wx, wrr = wcat[:cin], wcat[cin:2 * cin], wcat[2 * cin:]
    a = jax.lax.dot_general(left, wl, dn, preferred_element_type=jnp.int32)
    a += jax.lax.dot_general(x, wx, dn, preferred_element_type=jnp.int32)
    a += jax.lax.dot_general(right, wrr, dn,
                             preferred_element_type=jnp.int32)
    return a


def scale_leaky(y, s, b):
    y = y * s + b
    return jnp.where(y > 0, y, _LEAKY * y)


def requant(y):
    return jnp.clip(jnp.rint(y), -127, 127).astype(jnp.int8)


def pool2(x):
    rows, c = x.shape
    y = x.reshape(rows // (2 * tile), 2 * tile * c)
    return jnp.maximum(y[:, :tile * c], y[:, tile * c:]).reshape(
        rows // 2, c)


def mean_rows(x, l):
    acc = x[:tile]
    for p in range(1, l):
        acc = acc + x[p * tile:(p + 1) * tile]
    return acc / l


def build(mode):
    def kernel(x_ref, *refs):
        wlist = refs[:-6]
        wcc, bcc, wrr, brr = (r[:] for r in refs[-6:-2])
        cls_ref, reg_ref = refs[-2], refs[-1]
        x = x_ref[:]
        l = l4
        for i in range(len(CH)):
            acc = conv(x, wlist[3 * i][:], mode)
            if i == POOL_AFTER:
                x = pool2(acc.astype(jnp.float32))
                l //= 2
                x = requant(scale_leaky(x, wlist[3 * i + 1][:],
                                        wlist[3 * i + 2][:]))
            else:
                y = scale_leaky(acc.astype(jnp.float32),
                                wlist[3 * i + 1][:], wlist[3 * i + 2][:])
                x = requant(y) if i < len(CH) - 1 else y
        x = mean_rows(x, l)
        xc = x.astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        cls_ref[:] = (jax.lax.dot_general(
            xc, wcc.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32) + bcc)
        reg_ref[:] = (jax.lax.dot_general(
            xc, wrr.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32) + brr)

    wl_all = ws + [wc, bc, wr, br]
    f = pl.pallas_call(
        kernel, grid=(NB,),
        in_specs=[pl.BlockSpec((l4 * tile, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in wl_all],
        out_shape=(jax.ShapeDtypeStruct((NB * tile, 1), jnp.float32),
                   jax.ShapeDtypeStruct((NB * tile, 2), jnp.float32)),
        out_specs=(pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile, 2), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=CP,
    )
    return jax.jit(lambda a: f(a, *wl_all))


for mode in ("cat", "3mm"):
    try:
        t = timeit(build(mode), x_q)
        print(f"head {mode}: {t:.3f} ms", flush=True)
    except Exception as e:
        print(f"head {mode}: FAILED {str(e)[:250]}", flush=True)
