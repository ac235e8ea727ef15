"""Round-3 probe I: in-place tap-concat scratch for the head stack.

probe_r3h killed the 3-matmul form (output-accumulate traffic beats the
concat build). This probes the remaining copy waste in "cat": each conv
materializes its activation y, then the NEXT conv re-reads y three times
to build [left|y|right]. Variant "icat" keeps the activation INSIDE a
persistent (rows, 3C) VMEM scratch: the epilogue stores y once into the
middle third and twice (shifted) into the side thirds, so the tap buffer
is never rebuilt from a separate activation — saves one full write+read
of y per conv. Parity-checked against "cat" in the same run.

  cat  — shipped (_conv_int8_pm_acc): y temp -> 3-way concat -> matmul
  icat — epilogue writes y directly into the 3 thirds of the scratch
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

DN = (((1,), (0,)), ((), ()))


def taps(x, tile):
    z = jnp.zeros_like(x[:tile])
    left = jnp.concatenate([z, x[:-tile]], axis=0)
    right = jnp.concatenate([x[tile:], z], axis=0)
    return left, right


def conv_cat(x, wcat):
    left, right = taps(x, tile)
    xcat = jnp.concatenate([left, x, right], axis=1)
    return jax.lax.dot_general(xcat, wcat, DN,
                               preferred_element_type=jnp.int32)


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


def heads_out(x, wcc, bcc, wrr, brr, cls_ref, reg_ref, l):
    x = mean_rows(x, l)
    xc = x.astype(jnp.bfloat16)
    cls_ref[:] = (jax.lax.dot_general(
        xc, wcc.astype(jnp.bfloat16), DN,
        preferred_element_type=jnp.float32) + bcc)
    reg_ref[:] = (jax.lax.dot_general(
        xc, wrr.astype(jnp.bfloat16), DN,
        preferred_element_type=jnp.float32) + brr)


def build_cat():
    def kernel(x_ref, *refs):
        wlist = refs[:-6]
        wcc, bcc, wrr, brr = (r[:] for r in refs[-6:-2])
        cls_ref, reg_ref = refs[-2], refs[-1]
        x = x_ref[:]
        l = l4
        for i in range(len(CH)):
            acc = conv_cat(x, wlist[3 * i][:])
            if i == POOL_AFTER:
                x = pool2(acc.astype(jnp.float32))
                l //= 2
                x = requant(scale_leaky(x, wlist[3 * i + 1][:],
                                        wlist[3 * i + 2][:]))
            else:
                y = scale_leaky(acc.astype(jnp.float32),
                                wlist[3 * i + 1][:], wlist[3 * i + 2][:])
                x = requant(y) if i < len(CH) - 1 else y
        heads_out(x, wcc, bcc, wrr, brr, cls_ref, reg_ref, l)

    return _pallas(kernel, scratches=[])


def _store_icat(s_ref, y, c, rows):
    """Write int8 y (rows, c) into all three thirds of scratch s_ref
    ((rows, 3c); side thirds shifted by one position = tile rows)."""
    s_ref[:, c:2 * c] = y
    s_ref[tile:, :c] = y[:-tile]          # left tap of the NEXT conv
    s_ref[:rows - tile, 2 * c:] = y[tile:]  # right tap


def build_icat():
    rows0 = l4 * tile
    rows1 = rows0 // 2

    def kernel(x_ref, *refs):
        sA, sB, sC = refs[-3:]
        refs = refs[:-3]
        wlist = refs[:-6]
        wcc, bcc, wrr, brr = (r[:] for r in refs[-6:-2])
        cls_ref, reg_ref = refs[-2], refs[-1]
        # zero the tap edges (position 0 has no left neighbor, position
        # l-1 no right); nothing else ever writes these strips
        sA[:tile, :256] = jnp.zeros((tile, 256), jnp.int8)
        sA[rows0 - tile:, 512:] = jnp.zeros((tile, 256), jnp.int8)
        sB[:tile, :512] = jnp.zeros((tile, 512), jnp.int8)
        sB[rows1 - tile:, 1024:] = jnp.zeros((tile, 512), jnp.int8)
        sC[:tile, :256] = jnp.zeros((tile, 256), jnp.int8)
        sC[rows1 - tile:, 512:] = jnp.zeros((tile, 256), jnp.int8)

        _store_icat(sA, x_ref[:], 256, rows0)
        l = l4
        x = None
        for i in range(len(CH)):
            cin = CH[i][0]
            src = sA if l == l4 else (sB if cin == 512 else sC)
            acc = jax.lax.dot_general(src[:], wlist[3 * i][:], DN,
                                      preferred_element_type=jnp.int32)
            if i == POOL_AFTER:
                xf = pool2(acc.astype(jnp.float32))
                l //= 2
                y = requant(scale_leaky(xf, wlist[3 * i + 1][:],
                                        wlist[3 * i + 2][:]))
                _store_icat(sB, y, 512, rows1)
            else:
                yf = scale_leaky(acc.astype(jnp.float32),
                                 wlist[3 * i + 1][:], wlist[3 * i + 2][:])
                if i < len(CH) - 1:
                    y = requant(yf)
                    _store_icat(sA if l == l4 else sC, y, CH[i][1],
                                rows0 if l == l4 else rows1)
                else:
                    x = yf
        heads_out(x, wcc, bcc, wrr, brr, cls_ref, reg_ref, l)

    return _pallas(kernel, scratches=[
        pltpu.VMEM((rows0, 768), jnp.int8),
        pltpu.VMEM((rows1, 1536), jnp.int8),
        pltpu.VMEM((rows1, 768), jnp.int8),
    ])


def _pallas(kernel, scratches):
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
        scratch_shapes=scratches,
        compiler_params=CP,
    )
    return jax.jit(lambda a: f(a, *wl_all))


ref = None
for name, build in (("cat", build_cat), ("icat", build_icat)):
    try:
        fn = build()
        out = fn(x_q)
        if ref is None:
            ref = jax.tree_util.tree_map(np.asarray, out)
        else:
            d = max(float(np.abs(np.asarray(a) - b).max())
                    for a, b in zip(out, ref))
            print(f"head {name}: max|diff vs cat| = {d:.2e}", flush=True)
        t = timeit(fn, x_q)
        print(f"head {name}: {t:.3f} ms", flush=True)
    except Exception as e:
        print(f"head {name}: FAILED {str(e)[:300]}", flush=True)
