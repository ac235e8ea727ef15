"""TPU probe r2k: decompose the int8 backbone kernel cost.

Builds variants of the cat-mode stack with pieces disabled (WRONG MATH,
timing only): no-shift taps, no-requant epilogue, no-leaky, raw matmul
chain. Identifies the VPU/MXU split at tile=128, B=128.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planar_optical_flow_tpu.ops.pallas import conv_stack as cs

B = 128
ITERS = 50
p_pad = 456
L = 56
TILE = 128
N = B * p_pad

rng = np.random.default_rng(0)
act1_q = jnp.asarray(rng.integers(-127, 128, (N * L, 64)), jnp.int8)

# fake weights mimicking the backbone tail: (cin, cout) per layer with
# pools after layers 1 and 4 (0-indexed: plan conv conv pool conv conv conv
# pool)
DIMS = [(64, 64), (64, 128), (128, 128), (128, 128), (128, 256)]
WCAT = [jnp.asarray(rng.integers(-127, 128, (3 * ci, co)), jnp.int8)
        for ci, co in DIMS]
SEFF = [jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32)
        for _, co in DIMS]
BEFF = [jnp.asarray(rng.uniform(-1, 1, (co,)), jnp.float32)
        for _, co in DIMS]


def make_kernel(shifts, requant, leaky, taps3):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        x = x_ref[:]
        l = L
        wi = 0
        for li, (ci, co) in enumerate(DIMS):
            wcat = ws[3 * li][:]
            s_eff, b_eff = ws[3 * li + 1][:], ws[3 * li + 2][:]
            if taps3:
                if shifts:
                    lft, rgt = cs._shift_rows_int8(x, l)
                else:
                    lft = rgt = x
                xcat = jnp.concatenate([lft, x, rgt], axis=1)
                acc = jax.lax.dot_general(
                    xcat, wcat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:
                acc = jax.lax.dot_general(
                    x, wcat[ci:2 * ci], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * s_eff + b_eff
            if leaky:
                y = jnp.where(y > 0, y, 0.1 * y)
            if li in (1, 4):
                y = cs._pool2(y)
                l //= 2
            if requant:
                x = cs._requant(y)
            else:
                x = jnp.clip(y, -127, 127).astype(jnp.int8)
        out_ref[:] = x
    return kernel


def run(name, shifts=True, requant=True, leaky=True, taps3=True):
    rows_in = TILE * L
    rows_out = TILE * (L // 4)
    kernel = make_kernel(shifts, requant, leaky, taps3)
    weights = []
    for i in range(len(DIMS)):
        weights += [WCAT[i], SEFF[i], BEFF[i]]
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N // L * (L // 4) * L // L * 1, 256)
                                       if False else
                                       ((N * L // L) * (L // 4), 256),
                                       jnp.int8),
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((rows_in, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for w in weights],
        out_specs=pl.BlockSpec((rows_out, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(lambda a: fn(a, *weights))
    out = jax.block_until_ready(f(act1_q))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(act1_q)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:46s} {dt:8.3f} ms")


run("full cat (shifts+requant+leaky)")
run("no shifts (xcat = 3x same)", shifts=False)
run("no requant (clip+cast only)", requant=False)
run("no leaky", leaky=False)
run("center-tap only (1 matmul, Cin contraction)", taps3=False)
run("bare: no shifts, no requant, no leaky",
    shifts=False, requant=False, leaky=False)
