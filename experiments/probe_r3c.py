"""Round-3 probe C: where does the pm backbone tail's time actually go?

probe_r3a showed the TAIL alone (5 int8 convs, no layer1/embed) is ~5.9 ms
at serving shape while its MXU bound is ~2.4; a single conv2 rep measured
4.8 ms and extra reps were free (they got DCE'd in probe_r3b — this probe
chains reps through the data so they are live). Hypotheses to separate:
  (a) per-block fixed overhead (grid steps / DMA latency) — vary tile;
  (b) the int8 matmul itself runs far below peak at skinny N;
  (c) copy/epilogue VPU work — already ruled out by r2 ablations.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
B, P = 128, 480  # serving: 61440 cutouts


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


def conv_probe(l, cin, cout, tile, reps, mode="cat"):
    """One kernel: `reps` chained cat-convs (cin->cout->...); returns ms."""
    rows = l * tile
    nb = B * P // tile

    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
        x = x_ref[:]
        w = w_ref[:]
        for r in range(reps):
            if mode == "cat":
                z = jnp.zeros_like(x[:tile])
                xc = jnp.concatenate(
                    [jnp.concatenate([z, x[:-tile]], 0), x,
                     jnp.concatenate([x[tile:], z], 0)], axis=1)
            else:  # mm: no taps, weight (cin, cout)
                xc = x
            y = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * s_ref[:] + b_ref[:]
            yf = jnp.where(yf > 0, yf, 0.1 * yf)
            q = jnp.clip(jnp.rint(yf), -127, 127).astype(jnp.int8)
            # live chain: next rep consumes this rep's output lanes
            x = q[:, :cin]
        o_ref[:] = q

    rng = np.random.default_rng(0)
    kdim = 3 * cin if mode == "cat" else cin
    x = jnp.asarray(rng.integers(-127, 128, (nb * rows, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (kdim, cout)), jnp.int8)
    s = jnp.asarray(rng.uniform(1e-4, 2e-4, (1, cout)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, cout)) * .1, jnp.float32)
    f = pl.pallas_call(
        kernel, grid=(nb,),
        in_specs=[pl.BlockSpec((rows, cin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for a in (w, s, b)],
        out_specs=pl.BlockSpec((rows, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * rows, cout), jnp.int8),
        compiler_params=CP,
    )
    return timeit(jax.jit(lambda a: f(a, w, s, b)), x)


def copy_probe(l, cin, tile):
    """Pure in->out copy at the same block shape: per-block DMA floor."""
    rows = l * tile
    nb = B * P // tile

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (nb * rows, cin)), jnp.int8)
    f = pl.pallas_call(
        kernel, grid=(nb,),
        in_specs=[pl.BlockSpec((rows, cin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, cin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * rows, cin), jnp.int8),
        compiler_params=CP,
    )
    return timeit(jax.jit(f), x)


print("== copy floor (l=56, cin=64):")
for tile in (160, 480):
    print(f"  tile={tile}: {copy_probe(56, 64, tile):.3f} ms")

print("== conv2 (56 pos, 64->64) cat, reps x tile:")
for tile in (160, 480):
    for reps in (1, 3):
        t = conv_probe(56, 64, 64, tile, reps)
        print(f"  tile={tile} reps={reps}: {t:.3f} ms")

print("== conv2 notap mm (K=64,N=64) vs cat (K=192):")
print(f"  mm reps=1: {conv_probe(56, 64, 64, 160, 1, mode='mm'):.3f} ms")
print(f"  mm reps=3: {conv_probe(56, 64, 64, 160, 3, mode='mm'):.3f} ms")

print("== conv6-shape (28 pos, 128->256) cat:")
for reps in (1, 3):
    print(f"  reps={reps}: {conv_probe(28, 128, 256, 160, reps):.3f} ms")
