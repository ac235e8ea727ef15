"""Round-3 probe A: decompose the pm backbone kernel's 5.76 ms (B=128
device trace) into layer-1 / tail / embed contributions, using the real
``fused_backbone_int8_pm`` with its optional pieces toggled.

Serving shape: B=128 streams, p_pad=480 cutouts, tile=160, l=56.
int8 MXU bound for the tail is ~2.4 ms.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.ops.pallas import conv_stack as cs

B, P, tile, l = 128, 480, 160, 56
l4 = l // 4
rng = np.random.default_rng(0)

# fake quantized weights in the exact flat format (wcat int8, s_eff, b_eff)
CH = [(64, 64), (64, 128), (128, 128), (128, 128), (128, 256)]
bb_q = []
for ci, co in CH:
    bb_q += [jnp.asarray(rng.integers(-127, 128, (3 * ci, co)), jnp.int8),
             jnp.asarray(rng.uniform(1e-4, 2e-4, (co,)), jnp.float32),
             jnp.asarray(rng.normal(size=(co,)) * 0.1, jnp.float32)]
embed_w = (jnp.asarray(rng.normal(size=(l4 * 256, 128)) * 0.01, jnp.float32),
           jnp.asarray(rng.normal(size=(128,)) * 0.01, jnp.float32))
l1_w = (jnp.asarray(rng.normal(size=(3, 64)) * 0.3, jnp.float32),
        jnp.asarray(rng.normal(size=(1, 64)) * 0.1, jnp.float32))

cut = jnp.asarray(rng.uniform(-1, 1, (B * P, l)), jnp.float32)
act1 = jnp.asarray(rng.integers(-127, 128, (B * P * l, 64)), jnp.int8)


def _sync(o):
    # this backend's block_until_ready is lazy: force a scalar readback of
    # the last output; in-order execution completes everything before it
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[:1, :1])


def timeit(name, fn, *args):
    o = fn(*args)
    _sync(o)
    t0 = time.perf_counter()
    for _ in range(30):
        o = fn(*args)
    _sync(o)
    dt = (time.perf_counter() - t0) / 30 * 1000
    print(f"{name}: {dt:.3f} ms")
    return dt


# full serving config: layer1 in-kernel + embed epilogue
timeit("full (l1+tail+embed)", lambda: cs.fused_backbone_int8_pm(
    cut, bb_q, l=l, tile=tile, out_dtype=jnp.int8, embed_weights=embed_w,
    layer1_weights=l1_w, in_scale=0.01))

# layer1 in-kernel, no embed
timeit("l1+tail", lambda: cs.fused_backbone_int8_pm(
    cut, bb_q, l=l, tile=tile, out_dtype=jnp.int8,
    layer1_weights=l1_w, in_scale=0.01))

# tail + embed, act1 pre-quantized (pm row order) fed from HBM
timeit("tail+embed (act1 in)", lambda: cs.fused_backbone_int8_pm(
    act1, bb_q, l=l, tile=tile, out_dtype=jnp.int8, embed_weights=embed_w))

# tail only
timeit("tail only", lambda: cs.fused_backbone_int8_pm(
    act1, bb_q, l=l, tile=tile, out_dtype=jnp.int8))
