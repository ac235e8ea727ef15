"""Backbone ablation (WRONG MATH, timing only): full kernel vs epilogue
variants at serving shape, to locate the 5.7ms kernel's slack vs its
~2.9ms MXU bound."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

tile, l, nb = 160, 56, 384
PLAN = (("conv", 64, 64), ("conv", 64, 128), ("pool",),
        ("conv", 128, 128), ("conv", 128, 128), ("conv", 128, 256),
        ("pool",))

def make_kernel(mode):
    def conv(xq, w, s, b, do_epi):
        if mode == "oshift":
            # 3 matmuls on the UNSHIFTED input; shift the outputs by whole
            # tiles instead (no (rows, 3C) concat build). Same math.
            ci = xq.shape[1]
            dn = (((1,), (0,)), ((), ()))
            yl = jax.lax.dot_general(xq, w[:ci], dn,
                                     preferred_element_type=jnp.int32)
            yc = jax.lax.dot_general(xq, w[ci:2 * ci], dn,
                                     preferred_element_type=jnp.int32)
            yr = jax.lax.dot_general(xq, w[2 * ci:], dn,
                                     preferred_element_type=jnp.int32)
            zz = jnp.zeros_like(yl[:tile])
            acc = (yc + jnp.concatenate([zz, yl[:-tile]], 0)
                   + jnp.concatenate([yr[tile:], zz], 0))
        else:
            z = jnp.zeros_like(xq[:tile])
            xcat = jnp.concatenate(
                [jnp.concatenate([z, xq[:-tile]], 0), xq,
                 jnp.concatenate([xq[tile:], z], 0)], axis=1)
            acc = jax.lax.dot_general(xcat, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32)
        if mode == "mxu-only":
            # f32 cast only, no scale/leaky/requant (wrong math)
            return y.astype(jnp.int8)
        y = y * s + b
        y = jnp.where(y > 0, y, 0.1 * y)
        if mode == "no-requant":
            return y.astype(jnp.int8)  # plain cast, no rint/clip
        return jnp.clip(jnp.rint(y), -127, 127).astype(jnp.int8)

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        ws = refs[:-1]
        x = x_ref[:]
        wi = 0
        cur_l = l
        for op in PLAN:
            if op[0] == "conv":
                x = conv(x, ws[wi][:], ws[wi+1][:], ws[wi+2][:], True)
                wi += 3
            else:
                rows, c = x.shape
                xf = x.astype(jnp.float32)
                y = xf.reshape(rows // (2 * tile), 2 * tile * c)
                x = jnp.maximum(y[:, :tile * c], y[:, tile * c:]).reshape(
                    rows // 2, c).astype(jnp.int8)
                cur_l //= 2
        o_ref[:] = x
    return kernel

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-127, 128, (nb * l * tile, 64)), jnp.int8)
ws = []
for op in PLAN:
    if op[0] == "conv":
        ci, co = op[1], op[2]
        ws += [jnp.asarray(rng.integers(-127, 128, (3 * ci, co)), jnp.int8),
               jnp.asarray(rng.uniform(1e-4, 2e-4, (1, co)), jnp.float32),
               jnp.asarray(rng.normal(size=(1, co)) * .1, jnp.float32)]

for mode in ("full", "oshift"):
    f = pl.pallas_call(
        make_kernel(mode), grid=(nb,),
        in_specs=[pl.BlockSpec((l * tile, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in ws],
        out_specs=pl.BlockSpec((l * tile // 4, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * l * tile // 4, 256), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda a, f=f: f(a, *ws))
    o = g(x); o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(30):
        o = g(x)
    o.block_until_ready()
    print(f"{mode}: {(time.perf_counter()-t0)/30*1000:.3f} ms")
