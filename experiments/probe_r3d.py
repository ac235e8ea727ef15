"""Round-3 probe D: separate per-dispatch overhead from device time on the
axon backend. Times (a) a trivial 1-block kernel, (b) the serving-shape
copy kernel at grid multiplicities 1x and 4x IN ONE DISPATCH (via an
index_map that revisits blocks) — if time scales with the grid, it is
device work; if not, it is dispatch overhead."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
B, P, tile, l = 128, 480, 160, 56
rows = l * tile
nb = B * P // tile


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

# (a) trivial kernel: dispatch floor
tiny = jnp.asarray(rng.integers(-127, 128, (8, 128)), jnp.int8)
f0 = pl.pallas_call(
    lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:]),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int8),
)
print(f"tiny 1-block kernel: {timeit(jax.jit(f0), tiny):.3f} ms")

# (b) serving-shape copy at grid 1x / 4x in one dispatch
x = jnp.asarray(rng.integers(-127, 128, (nb * rows, 64)), jnp.int8)
for mult in (1, 4):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    f = pl.pallas_call(
        kernel, grid=(nb * mult,),
        in_specs=[pl.BlockSpec((rows, 64), lambda i: (i % nb, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, 64), lambda i: (i % nb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * rows, 64), jnp.int8),
        compiler_params=CP,
    )
    print(f"copy grid x{mult}: {timeit(jax.jit(f), x):.3f} ms")

# (c) same copy but 128-lane blocks (lane-full) for DMA-efficiency check
x2 = jnp.asarray(rng.integers(-127, 128, (nb * rows // 2, 128)), jnp.int8)
f2 = pl.pallas_call(
    lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:]),
    grid=(nb,),
    in_specs=[pl.BlockSpec((rows // 2, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((rows // 2, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((nb * rows // 2, 128), jnp.int8),
    compiler_params=CP,
)
print(f"copy 128-lane same bytes: {timeit(jax.jit(f2), x2):.3f} ms")
