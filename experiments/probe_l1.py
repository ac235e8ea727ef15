"""Layer-1-in-kernel variants: lane-slice loop (v1) vs transpose+flat
broadcast (v3) vs transpose+K3 matmul (v4). Standalone pallas kernels on
the serving shape (nb=384 blocks, tile=160, l=56)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

tile, l, nb = 160, 56, 384
SLOPE = 0.1

def taps(cut):
    z = jnp.zeros_like(cut[:, :1])
    xm = jnp.concatenate([z, cut[:, :-1]], axis=1)
    xp = jnp.concatenate([cut[:, 1:], z], axis=1)
    return xm, xp

def k_v1(x_ref, w_ref, b_ref, o_ref):
    cut = x_ref[:]
    wc, b1 = w_ref[:], b_ref[:]
    xm, xp = taps(cut)
    rows = []
    for p in range(l):
        acc = (xm[:, p:p+1] * wc[0:1] + cut[:, p:p+1] * wc[1:2]
               + xp[:, p:p+1] * wc[2:3]) + b1
        rows.append(jnp.where(acc > 0, acc, SLOPE * acc))
    act = jnp.concatenate(rows, axis=0) / 0.07
    o_ref[:] = jnp.clip(jnp.rint(act), -127, 127).astype(jnp.int8)

def k_v3(x_ref, w_ref, b_ref, o_ref):
    cut = x_ref[:]
    wc, b1 = w_ref[:], b_ref[:]
    xm, xp = taps(cut)
    def flat(a):  # (tile, l) -> (l*tile, 1)
        return a.T.reshape(l * tile, 1)
    acc = (flat(xm) * wc[0:1] + flat(cut) * wc[1:2]
           + flat(xp) * wc[2:3]) + b1
    act = jnp.where(acc > 0, acc, SLOPE * acc) / 0.07
    o_ref[:] = jnp.clip(jnp.rint(act), -127, 127).astype(jnp.int8)

def k_v4(x_ref, w_ref, b_ref, o_ref):
    cut = x_ref[:]
    wc, b1 = w_ref[:], b_ref[:]
    xm, xp = taps(cut)
    x3 = jnp.concatenate(
        [a.T.reshape(l * tile, 1) for a in (xm, cut, xp)], axis=1)
    acc = jax.lax.dot_general(x3, wc, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + b1
    act = jnp.where(acc > 0, acc, SLOPE * acc) / 0.07
    o_ref[:] = jnp.clip(jnp.rint(act), -127, 127).astype(jnp.int8)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(nb * tile, l)), jnp.float32)
wc = jnp.asarray(rng.normal(size=(3, 64)), jnp.float32)
b1 = jnp.asarray(rng.normal(size=(1, 64)), jnp.float32)

outs = {}
for name, k in [("v1", k_v1), ("v3", k_v3), ("v4", k_v4)]:
    try:
        f = pl.pallas_call(
            k, grid=(nb,),
            in_specs=[pl.BlockSpec((tile, l), lambda i: (i, 0),
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
        o = g(x); o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(30):
            o = g(x)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 30 * 1000
        outs[name] = np.asarray(o)
        print(f"{name}: {dt:.3f} ms")
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}")
for n in ("v3", "v4"):
    if n in outs:
        print(n, "matches v1:", np.array_equal(outs[n], outs["v1"]),
              "maxdiff", np.abs(outs[n].astype(np.int32) - outs["v1"].astype(np.int32)).max())
