"""TPU probe r2c: fused gate kernel + bf16-act conv ceiling + big tiles."""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.models.spatial_drow import SpatialAttentionGate
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs
from planar_optical_flow_tpu.infer import fast_gate as fg

B, CT, D, L = 128, 450, 3584, 56
N = B * CT
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
        return dt
    except Exception as e:
        print(json.dumps({"label": label, "error": str(e)[:200]}), flush=True)


# ---- fused gate kernel
gate = SpatialAttentionGate(alpha=0.5, window_size=11)
x0 = jnp.asarray(rng.normal(size=(2, CT, D)), jnp.float32)
gv = gate.init(KEY, x0, x0, train=False)
params = fg.fold_gate_params(
    {"params": gv["params"], "batch_stats": gv["batch_stats"]},
    alpha=0.5, window_size=11, dtype=jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(B, CT, D)), jnp.bfloat16)
t = jnp.asarray(rng.normal(size=(B, CT, D)), jnp.bfloat16)
z = fg.embed(params, t)
zx = fg.embed(params, x)
for dc in (896, 1792):
    timeit(lambda a, b_, c, d, dd=dc: fg.gate_fused(a, b_, c, d, 0.5, 11,
                                                    d_chunk=dd),
           (zx, z, x, t), f"gate_fused kernel d_chunk={dc}")
timeit(jax.jit(lambda p, a, tt, zz: fg.gate_step(p, a, tt, zz)),
       (params, x, t, z), "fast gate full (embed+fused)")

# ---- conv ceiling: bf16 activations
xsc = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))
bb = DrowBackbone()
vb = bb.init(KEY, xsc[..., None], train=False)
layer1, wtail = cs.backbone_stack_weights(vb)
act1 = cs.backbone_layer1(xsc, layer1)
for cm in ("notap", "3mm"):
    for tile in (64, 128, 256):
        timeit(lambda a, c=cm, tl=tile: cs.fused_backbone_v2(
                   a, wtail, l=L, tile=tl, conv_mode=c,
                   act_dtype=jnp.bfloat16),
               (act1,), f"bb v2 {cm} act=bf16 tile={tile}")
