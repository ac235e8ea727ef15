"""TPU probe r2d: int8 fused conv kernels (requant-in-epilogue)."""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs
from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

B, L = 128, 56
N = B * 450
ITERS = 30
KEY = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)


def timeit(fn, args, label):
    try:
        out = fn(*args)
        for _ in range(2):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]
                      .astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]
                      .astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"label": label, "ms": round(dt, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"label": label, "error": str(e)[:200]}), flush=True)


xsc = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))
bb = DrowBackbone()
vb = bb.init(KEY, xsc[..., None], train=False)
layer1, _ = cs.backbone_stack_weights(vb)
act1s = np.asarray(cs.backbone_layer1(xsc[:4096], layer1,
                                      compute_dtype=jnp.float32))
blocks = (_block_params(vb, "block1", 3) + _block_params(vb, "block2", 3))
wq_bb, in_s_bb, _ = cs.quantize_stack_int8(
    blocks[1:], act1s.reshape(-1, L, 64), L, pool_after={1, 4})

act1_full = cs.backbone_layer1(xsc, layer1)  # bf16
act1_q = cs.quantize_int8(act1_full.astype(jnp.float32), in_s_bb)
for tile in (64, 128, 256):
    timeit(lambda a, t=tile: cs.fused_backbone_int8(a, wq_bb, l=L, tile=t),
           (act1_q,), f"bb int8 tile={tile}")

hd = DrowHead(num_classes=1)
f0 = jnp.asarray(rng.normal(size=(N, L // 4, 256)).astype(np.float32))
vh = hd.init(KEY, f0, train=False)
hblocks = (_block_params(vh, "block3", 3) + _block_params(vh, "block4", 2))
wq_hd, in_s_hd, _ = cs.quantize_stack_int8(
    hblocks, np.asarray(f0[:4096]), L // 4, pool_after={2})
conv_w, head_w = cs.head_stack_weights(vh)
fq = cs.quantize_int8(f0.astype(jnp.float32), in_s_hd).reshape(N * 14, 256)
for tile in (64, 128, 256):
    timeit(lambda a, t=tile: cs.fused_head_int8(a, wq_hd, head_w,
                                                num_classes=1, l4=14, tile=t),
           (fq,), f"head int8 tile={tile}")

# quantize-input cost in XLA (would fuse into producers in the real pipe)
timeit(jax.jit(lambda a: cs.quantize_int8(a.astype(jnp.float32), in_s_bb)),
       (act1_full,), "quantize act1 XLA")
