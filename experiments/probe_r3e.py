"""Round-3 probe E: conv2 tap-form shootout at serving shape, marginal
per-layer cost (reps chained, 3-1):
  pm    — rows (l*tile, 64), taps = row-shift concat, K=192 @ N=64
  p2s   — packed rows (l/2*tile, 128), taps = row-shift + lane-offset
          slices into a dim-1 concat, K=256 @ N=128 (full MXU tiles)
  p2z   — packed rows, full-lane 6-slot concat, K=384 @ N=128 (no lane
          slices, 50% zero weights)
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


def build(mode, reps):
    rng = np.random.default_rng(0)
    if mode == "pm":
        rows, cin, kdim, cout = l * tile, 64, 192, 64
    elif mode == "p2s":
        rows, cin, kdim, cout = l * tile // 2, 128, 256, 128
    else:  # p2z
        rows, cin, kdim, cout = l * tile // 2, 128, 384, 128
    x = jnp.asarray(rng.integers(-127, 128, (NB * rows, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (kdim, cout)), jnp.int8)
    s = jnp.asarray(rng.uniform(1e-4, 2e-4, (1, cout)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, cout)) * .1, jnp.float32)

    def taps(xx):
        z = jnp.zeros_like(xx[:tile])
        prev = jnp.concatenate([z, xx[:-tile]], 0)
        nxt = jnp.concatenate([xx[tile:], z], 0)
        if mode == "pm":
            return jnp.concatenate([prev, xx, nxt], 1)  # (., 192)
        if mode == "p2s":
            h = xx.shape[1] // 2
            return jnp.concatenate([prev[:, h:], xx, nxt[:, :h]], 1)
        return jnp.concatenate([prev, xx, nxt], 1)      # (., 384)

    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
        xx = x_ref[:]
        for _ in range(reps):
            acc = jax.lax.dot_general(taps(xx), w_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * s_ref[:] + b_ref[:]
            y = jnp.where(y > 0, y, 0.1 * y)
            q = jnp.clip(jnp.rint(y), -127, 127).astype(jnp.int8)
            xx = q[:, :x_ref.shape[1]] if q.shape[1] >= x_ref.shape[1] \
                else jnp.concatenate([q, q], axis=1)
        o_ref[:] = xx

    f = pl.pallas_call(
        kernel, grid=(NB,),
        in_specs=[pl.BlockSpec((rows, cin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for a in (w, s, b)],
        out_specs=pl.BlockSpec((rows, cin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * rows, cin), jnp.int8),
        compiler_params=CP,
    )
    return jax.jit(lambda a: f(a, w, s, b)), x


for mode in ("pm", "p2s", "p2z"):
    ts = {}
    for reps in (1, 3):
        f, x = build(mode, reps)
        ts[reps] = timeit(f, x)
    print(f"{mode}: marginal {(ts[3] - ts[1]) / 2:.3f} ms "
          f"(r1 {ts[1]:.3f}, r3 {ts[3]:.3f})", flush=True)
