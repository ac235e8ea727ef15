"""Max-pool fwd+bwd A/B at the DR-SPAAM backbone shape (39600, 56, 128):
reduce_window (nn.max_pool) vs reshape+jnp.max vs jnp.maximum(even, odd).
The backward is what differs: select_and_scatter vs tie-splitting
(broadcast+count) vs pure elementwise select."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

N, L, C = 39600, 56, 128
rng = np.random.default_rng(0)
x0 = rng.normal(size=(N, L, C))


def pool_rw(x):
    return nn.max_pool(x, window_shape=(2,), strides=(2,))


def pool_reshape(x):
    b, l, c = x.shape
    return jnp.max(x.reshape(b, l // 2, 2, c), axis=2)


def pool_maximum(x):
    return jnp.maximum(x[:, 0::2], x[:, 1::2])


def bench(name, fn, x, n=30):
    loss = jax.jit(jax.grad(lambda a: jnp.sum(fn(a).astype(jnp.float32))))
    g = loss(x)
    float(jnp.sum(g[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        g = loss(x)
    float(jnp.sum(g[0]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name}: {dt:.3f} ms", flush=True)


for dt_ in (jnp.float32, jnp.bfloat16):
    x = jnp.asarray(x0, dt_)
    print(f"--- {np.dtype(dt_).name} ---", flush=True)
    bench("reduce_window", pool_rw, x)
    bench("reshape+max  ", pool_reshape, x)
    bench("maximum(e,o) ", pool_maximum, x)
