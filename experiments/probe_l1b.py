"""Layer-1 variants round 2: 3-D broadcast (v5), sublane-roll on
transposed input (v6: input passed (l, tile) so taps are sublane shifts,
output built by 3-D broadcast + reshape)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

tile, l, nb = 160, 56, 384
SLOPE = 0.1

def k_v5(x_ref, w_ref, b_ref, o_ref):
    # x (tile, l) -> xt (l, tile) -> (l, tile, 64) broadcast -> reshape
    cut = x_ref[:]
    wc, b1 = w_ref[:], b_ref[:]
    z = jnp.zeros_like(cut[:, :1])
    xm = jnp.concatenate([z, cut[:, :-1]], axis=1)
    xp = jnp.concatenate([cut[:, 1:], z], axis=1)
    def term(a, i):
        at = a.T  # (l, tile)
        return at[:, :, None] * wc[i][None, None, :]
    acc = term(xm, 0) + term(cut, 1) + term(xp, 2) + b1[None]
    act = jnp.where(acc > 0, acc, SLOPE * acc) / 0.07
    o_ref[:] = jnp.clip(jnp.rint(act), -127, 127).astype(jnp.int8).reshape(
        l * tile, 64)

def k_v6(x_ref, w_ref, b_ref, o_ref):
    # x passed as (l, tile): taps are sublane rolls, no transpose
    xt = x_ref[:]
    wc, b1 = w_ref[:], b_ref[:]
    zr = jnp.zeros_like(xt[:1])
    xm = jnp.concatenate([zr, xt[:-1]], axis=0)
    xp = jnp.concatenate([xt[1:], zr], axis=0)
    acc = (xm[:, :, None] * wc[0][None, None, :]
           + xt[:, :, None] * wc[1][None, None, :]
           + xp[:, :, None] * wc[2][None, None, :]) + b1[None]
    act = jnp.where(acc > 0, acc, SLOPE * acc) / 0.07
    o_ref[:] = jnp.clip(jnp.rint(act), -127, 127).astype(jnp.int8).reshape(
        l * tile, 64)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(nb * tile, l)), jnp.float32)
xt = jnp.asarray(np.asarray(x).reshape(nb, tile, l).transpose(0, 2, 1)
                 .reshape(nb * l, tile))
wc = jnp.asarray(rng.normal(size=(3, 64)), jnp.float32)
b1 = jnp.asarray(rng.normal(size=(1, 64)), jnp.float32)

ref = None
for name, k, inp, blk in [("v5", k_v5, x, (tile, l)),
                          ("v6", k_v6, xt, (l, tile))]:
    try:
        f = pl.pallas_call(
            k, grid=(nb,),
            in_specs=[pl.BlockSpec(blk, lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((3, 64), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 64), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((l * tile, 64), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb * l * tile, 64), jnp.int8),
        )
        g = jax.jit(lambda a, f=f: f(a, wc, b1))
        o = g(inp); o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(30):
            o = g(inp)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 30 * 1000
        print(f"{name}: {dt:.3f} ms")
        if ref is None:
            ref = np.asarray(o)
        else:
            print(name, "matches v5:",
                  np.array_equal(np.asarray(o), ref))
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}")
