"""TPU probe: fused conv-stack v2 kernels vs XLA flax convs.

Workload: B=128 streams x 450 cutouts = 57600 rows, L=56 (dr_spaam.yaml).
Chained-readback timing (see memory/axon-tpu-env).
"""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs

N = int(os.environ.get("N", str(128 * 450)))
L = 56
ITERS = int(os.environ.get("ITERS", "30"))
KEY = jax.random.PRNGKey(0)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))

bb = DrowBackbone()
vb = bb.init(KEY, x[..., None], train=False)
wb = cs.backbone_stack_weights(vb)
hd = DrowHead(num_classes=1)
f0 = jnp.asarray(rng.normal(size=(N, L // 4, 256)).astype(np.float32))
vh = hd.init(KEY, f0, train=False)
wh_conv, wh_head = cs.head_stack_weights(vh)

vb16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, vb)
vh16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, vh)


def timeit(fn, arg, label, feedback=None):
    """Chained timing: out feeds back into the next call via `feedback`."""
    try:
        a = arg
        out = fn(a)
        for _ in range(2):
            a = feedback(a, out) if feedback else arg
            out = fn(a)
        jnp.sum(jax.tree_util.tree_leaves(out)[0]).block_until_ready()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            a = feedback(a, out) if feedback else arg
            out = fn(a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"label": label, "ms": round(dt, 2)}), flush=True)
        return dt
    except Exception as e:
        print(json.dumps({"label": label, "error": str(e)[:300]}), flush=True)
        return None


# feedback: perturb input by a vanishing data-dependent amount to chain deps
# (x*0 would be algebraically folded away; 1e-20 survives the simplifier and
# is exactly 0 after bf16 rounding of the sum's scale)
def fb_x(a, out):
    lead = jax.tree_util.tree_leaves(out)[0]
    eps = (lead.ravel()[:1].astype(jnp.float32) * 1e-20).astype(a.dtype)
    return a + eps[0]


x16 = x.astype(jnp.bfloat16)
f16 = f0.astype(jnp.bfloat16)

# XLA baselines
bb_x = jax.jit(lambda a: bb.apply(vb16, a[..., None], train=False))
timeit(bb_x, x16, "backbone XLA bf16", fb_x)
hd_x = jax.jit(lambda a: hd.apply(vh16, a, train=False))
timeit(hd_x, f16, "head XLA bf16", fb_x)

# im2col cost
im2 = jax.jit(lambda a: cs.im2col_taps(a))
timeit(im2, x16, "im2col bf16", fb_x)

taps = cs.im2col_taps(x16)
for tile in (32, 64, 128):
    for pm in ("reshape", "stride"):
        timeit(lambda a, t=tile, p=pm: cs.fused_backbone_v2(
                   a, wb, l=L, tile=t, pool_mode=p),
               taps, f"backbone v2 tile={tile} pool={pm}", fb_x)

for tile in (32, 64, 128, 256):
    for pm in ("reshape", "stride"):
        timeit(lambda a, t=tile, p=pm: cs.fused_head_v2(
                   a, wh_conv, wh_head, num_classes=1, tile=t, pool_mode=p),
               f16, f"head v2 tile={tile} pool={pm}", fb_x)
