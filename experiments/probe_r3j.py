"""Round-3 probe J: layer-1 selection-folded matmul in f32 vs bf16.

The p2 backbone's layer 1 is ONE (tile, 56) @ (56, 3584) matmul per grid
step, currently f32 (``_layer1_p2_mm``). Cutouts are centered+clipped to
~[-1, 1], so bf16 operand rounding (~2^-8 relative) is at/below the int8
requant step — the MXU runs bf16 at a multiple of the f32 rate. Measures
standalone kernel time and the int8 disagreement rate vs the f32 form.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
B, P, tile, L = 128, 480, 160, 56
NB = B * P // tile
_LEAKY = 0.1


def _sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0][:1, :1])


def timeit(fn, *args, n=50):
    o = fn(*args)
    _sync(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
    _sync(o)
    return (time.perf_counter() - t0) / n * 1000


rng = np.random.default_rng(0)
cut = jnp.asarray(rng.uniform(-1.0, 1.0, (NB * tile, L)), jnp.float32)
wc = rng.normal(size=(3, 64)).astype(np.float32) * 0.3
b1 = rng.normal(size=(1, 64)).astype(np.float32) * 0.1
scale = 0.05

w = jnp.asarray(wc) / scale
b = jnp.asarray(b1).reshape(1, -1) / scale
wsel = sum(jnp.kron(jnp.eye(L, k=1 - k, dtype=jnp.float32), w[k:k + 1])
           for k in range(3))
bsel = jnp.tile(b, (1, L))


def build(dtype):
    wsel_c = wsel.astype(dtype)
    bsel_c = bsel  # bias stays f32 (added to the f32 accumulator)

    def kernel(x_ref, w_ref, b_ref, o_ref):
        x = x_ref[:].astype(dtype)
        acc = jax.lax.dot_general(
            x, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_ref[:]
        a = jnp.where(acc > 0, acc, _LEAKY * acc)
        q = jnp.clip(jnp.rint(a), -127, 127).astype(jnp.int8)
        o_ref[:] = jnp.concatenate(
            [q[:, 128 * j:128 * (j + 1)] for j in range(L // 2)], axis=0)

    f = pl.pallas_call(
        kernel, grid=(NB,),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wsel_c.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bsel_c.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((NB * L // 2 * tile, 128), jnp.int8),
        out_specs=pl.BlockSpec((L // 2 * tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=CP,
    )
    return jax.jit(lambda a: f(a, wsel_c, bsel_c))


ref = None
for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    fn = build(dt)
    out = np.asarray(fn(cut))
    if ref is None:
        ref = out
    else:
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        print(f"l1 {name}: mismatch {100 * (diff > 0).mean():.3f}% "
              f"(max {diff.max()} LSB)", flush=True)
    t = timeit(fn, cut)
    print(f"l1 {name}: {t:.3f} ms", flush=True)
