"""Standalone backbone kernel A/B at serving shape (B=128): act1-input vs
cutout-input (layer-1 in kernel), each with embed epilogue."""
import time
import numpy as np
import jax, jax.numpy as jnp
from planar_optical_flow_tpu.models.drow import DrowBackbone
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs
from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

rng = np.random.default_rng(0)
bb = DrowBackbone()
B, p_pad, tile, l = 128, 480, 160, 56
nb = B * p_pad // tile
x_small = jnp.asarray(rng.normal(size=(1024, l, 1)).astype(np.float32))
v = bb.init(jax.random.PRNGKey(0), x_small, train=False)
layer1, _ = cs.backbone_stack_weights(v)
blocks = (_block_params(v, "block1", 3) + _block_params(v, "block2", 3))
act1_s = np.asarray(cs.backbone_layer1(x_small[..., 0], layer1,
                                       compute_dtype=jnp.float32))
wq, in_scale, feat_scale = cs.quantize_stack_int8(
    blocks[1:], act1_s.reshape(1024, l, 64), l, pool_after={1, 4},
    dequant_last=False, concat_taps=True)
ew = (jnp.asarray(rng.normal(size=((l // 4) * 256, 128)) * 0.02, jnp.float32),
      jnp.asarray(rng.normal(size=(128,)) * 0.02, jnp.float32))

cut = jnp.asarray(rng.normal(size=(B * p_pad, l)), jnp.float32)
act1_pm = jnp.asarray(rng.integers(-127, 128, (nb * l * tile, 64)), jnp.int8)

def timeit(name, g, *a):
    o = g(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(30):
        o = g(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/30*1000:.3f} ms")

timeit("act1-input  ", jax.jit(lambda a: cs.fused_backbone_int8_pm(
    a, wq, l=l, tile=tile, out_dtype=jnp.int8, embed_weights=ew)), act1_pm)
timeit("cutout-input", jax.jit(lambda a: cs.fused_backbone_int8_pm(
    a, wq, l=l, tile=tile, out_dtype=jnp.int8, embed_weights=ew,
    layer1_weights=(layer1[0][:, 0, :], layer1[1].reshape(1, -1)),
    in_scale=float(in_scale))), cut)
timeit("act1 noembed", jax.jit(lambda a: cs.fused_backbone_int8_pm(
    a, wq, l=l, tile=tile, out_dtype=jnp.int8)), act1_pm)
