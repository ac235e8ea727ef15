"""Round-3 probe B: per-layer cost map of the pm backbone tail.

For each conv layer shape, time a kernel that runs ONLY that layer R times
(marginal cost per rep isolates the layer from block DMA), in three forms:
  cat    — tap concat + one (M, 3K) @ (3K, N) int8 matmul + epilogue
  pure   — one UNSHIFTED (M, 3K) @ (3K, N) matmul + epilogue (input is
           pre-widened; isolates the tap-concat build cost)
  mm     — pure matmul only, no epilogue
Also maps raw int8 matmul throughput over (K, N) to find utilization
cliffs (is K=192 padded to 256? is N=64/128 half-rate?).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

tile = 160
NB = 384  # serving block count at B=128, p_pad=480
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0][:1, :1])


def timeit(fn, *args, n=30):
    o = fn(*args)
    _sync(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    _sync(o)
    return (time.perf_counter() - t0) / n * 1000


def layer_kernel(mode, reps):
    def kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
        x = x_ref[:]
        w = w_ref[:]
        cin3 = w.shape[0]
        cin = cin3 // 3
        acc = None
        for _ in range(reps):
            if mode == "cat":
                z = jnp.zeros_like(x[:tile])
                xc = jnp.concatenate(
                    [jnp.concatenate([z, x[:-tile]], 0), x,
                     jnp.concatenate([x[tile:], z], 0)], axis=1)
            else:
                xc = jnp.concatenate([x, x, x], axis=1) if x.shape[1] == cin \
                    else x
            y = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            if mode != "mm":
                yf = y.astype(jnp.float32) * s_ref[:] + b_ref[:]
                yf = jnp.where(yf > 0, yf, 0.1 * yf)
                q = jnp.clip(jnp.rint(yf), -127, 127).astype(jnp.int8)
            else:
                q = (y & 127).astype(jnp.int8)
            # feed a slice back so reps can't be CSE'd; keep Cin lanes
            x = q[:, :cin] if q.shape[1] >= cin else jnp.concatenate(
                [q] * (cin // q.shape[1]), axis=1)
            acc = q if acc is None else acc
        o_ref[:] = acc[:, :o_ref.shape[1]]
    return kernel


rng = np.random.default_rng(0)
print("== per-layer (marginal ms per layer over all 384 blocks, reps 5-1)")
for name, l, cin, cout in (("conv2", 56, 64, 64), ("conv3", 56, 64, 128),
                           ("conv4", 28, 128, 128), ("conv5", 28, 128, 128),
                           ("conv6", 28, 128, 256)):
    rows = l * tile
    for mode in ("cat", "pure", "mm"):
        xin = cin if mode == "cat" else 3 * cin
        x = jnp.asarray(rng.integers(-127, 128, (NB * rows, xin)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (3 * cin, cout)), jnp.int8)
        s = jnp.asarray(rng.uniform(1e-4, 2e-4, (1, cout)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, cout)) * .1, jnp.float32)
        ts = {}
        for reps in (5, 1):
            f = pl.pallas_call(
                layer_kernel(mode, reps), grid=(NB,),
                in_specs=[pl.BlockSpec((rows, xin), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(a.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for a in (w, s, b)],
                out_specs=pl.BlockSpec((rows, cout), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NB * rows, cout), jnp.int8),
                compiler_params=CP,
            )
            g = jax.jit(lambda a, f=f: f(a, w, s, b))
            ts[reps] = timeit(g, x)
        marg = (ts[5] - ts[1]) / 4
        print(f"  {name} ({l}x{tile} rows, {cin}->{cout}) {mode}: "
              f"marginal {marg:.3f} ms  (r1 {ts[1]:.3f}, r5 {ts[5]:.3f})")
