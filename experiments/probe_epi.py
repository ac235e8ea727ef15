"""Epilogue dtype probe on the pm backbone shape: int8 concat-tap convs
with f32 vs bf16 scale/leaky/requant chains (standalone kernels)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

tile, l, nb = 160, 56, 384
SLOPE = 0.1

def make_kernel(epi):
    def conv(xq, wcat, s_eff, b_eff):
        z = jnp.zeros_like(xq[:tile])
        xcat = jnp.concatenate(
            [jnp.concatenate([z, xq[:-tile]], 0), xq,
             jnp.concatenate([xq[tile:], z], 0)], axis=1)
        acc = jax.lax.dot_general(xcat, wcat, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(epi) * s_eff.astype(epi) + b_eff.astype(epi)
        y = (jnp.asarray(0.55, epi) * y
             + jnp.asarray(0.45, epi) * jnp.abs(y))
        return jnp.clip(jnp.rint(y), -127, 127).astype(jnp.int8)

    def kernel(x_ref, w1, s1, b1, w2, s2, b2, o_ref):
        x = conv(x_ref[:], w1[:], s1[:], b1[:])
        x = conv2(x, w2[:], s2[:], b2[:])
        o_ref[:] = x

    def conv2(xq, wcat, s_eff, b_eff):
        z = jnp.zeros_like(xq[:tile])
        xcat = jnp.concatenate(
            [jnp.concatenate([z, xq[:-tile]], 0), xq,
             jnp.concatenate([xq[tile:], z], 0)], axis=1)
        acc = jax.lax.dot_general(xcat, wcat, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(epi) * s_eff.astype(epi) + b_eff.astype(epi)
        y = (jnp.asarray(0.55, epi) * y
             + jnp.asarray(0.45, epi) * jnp.abs(y))
        return jnp.clip(jnp.rint(y), -127, 127).astype(jnp.int8)
    return kernel

rng = np.random.default_rng(0)
rows = l * tile
x = jnp.asarray(rng.integers(-127, 128, (nb * rows, 64)), jnp.int8)
w1 = jnp.asarray(rng.integers(-127, 128, (192, 64)), jnp.int8)
s1 = jnp.asarray(rng.uniform(1e-4, 2e-4, (1, 64)), jnp.float32)
b1 = jnp.asarray(rng.normal(size=(1, 64)) * 0.1, jnp.float32)
w2 = jnp.asarray(rng.integers(-127, 128, (192, 128)), jnp.int8)
s2 = jnp.asarray(rng.uniform(1e-4, 2e-4, (1, 128)), jnp.float32)
b2 = jnp.asarray(rng.normal(size=(1, 128)) * 0.1, jnp.float32)

for name, epi in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    f = pl.pallas_call(
        make_kernel(epi), grid=(nb,),
        in_specs=[pl.BlockSpec((rows, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(a.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
           for a in (w1, s1, b1, w2, s2, b2)],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * rows, 128), jnp.int8),
    )
    g = jax.jit(lambda a, f=f: f(a, w1, s1, b1, w2, s2, b2))
    o = g(x); o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(30):
        o = g(x)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / 30 * 1000
    print(f"{name}: {dt:.3f} ms")
