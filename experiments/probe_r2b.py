"""TPU probe r2b: gate component breakdown + conv v2 (layer1-XLA, concat)."""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.models.spatial_drow import SpatialAttentionGate
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs
from planar_optical_flow_tpu.infer import fast_gate as fg

B = int(os.environ.get("B", "128"))
CT = 450
D = 3584
N = B * CT
L = 56
ITERS = int(os.environ.get("ITERS", "30"))
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
            # chain: readback forces completion each iter (donation-free
            # steady state; per-memory the dispatch is async otherwise)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]
                      .astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"label": label, "ms": round(dt, 2)}), flush=True)
        return dt
    except Exception as e:
        print(json.dumps({"label": label, "error": str(e)[:200]}), flush=True)


# ======== GATE components (bf16, B=128, ct=450, D=3584)
gate = SpatialAttentionGate(alpha=0.5, window_size=11)
x0 = jnp.asarray(rng.normal(size=(2, CT, D)), jnp.float32)
gv = gate.init(KEY, x0, x0, train=False)
gv16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16)
    if jnp.issubdtype(a.dtype, jnp.floating) else a, gv)
params = fg.fold_gate_params(
    {"params": gv["params"], "batch_stats": gv["batch_stats"]},
    alpha=0.5, window_size=11, dtype=jnp.bfloat16)

x = jnp.asarray(rng.normal(size=(B, CT, D)), jnp.bfloat16)
t = jnp.asarray(rng.normal(size=(B, CT, D)), jnp.bfloat16)
z = fg.embed(params, t)

timeit(jax.jit(lambda a, b: gate.apply(gv16, a, b, train=False)), (x, t),
       "gate module dense bf16")
timeit(jax.jit(lambda a: fg.embed(params, a)), (x,), "gate embed matmul")
timeit(jax.jit(lambda zx, zt: fg._band_attention(params, zx, zt)), (z, z),
       "gate band attention (sim+softmax)")
attn = jnp.asarray(rng.uniform(0, 1, (B, CT, 11)), jnp.bfloat16)
for dc in (448, 896, 1792, 3584):
    timeit(lambda a, xx, tt, d=dc: fg.banded_mix_update(
               a, xx, tt, 0.5, 11, d_chunk=d),
           (attn, x, t), f"banded_mix pallas d_chunk={dc}")
timeit(jax.jit(lambda p, a, tt, zz: fg.gate_step(p, a, tt, zz)[0]),
       (params, x, t, z), "fast gate full (pallas mix)")

# ======== CONV v2 (layer1 in XLA, concat vs 3mm vs notap)
xsc = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))
bb = DrowBackbone()
vb = bb.init(KEY, xsc[..., None], train=False)
layer1, wtail = cs.backbone_stack_weights(vb)
hd = DrowHead(num_classes=1)
f0 = jnp.asarray(rng.normal(size=(N, L // 4, 256)).astype(np.float32))
vh = hd.init(KEY, f0, train=False)
wh_conv, wh_head = cs.head_stack_weights(vh)

timeit(jax.jit(lambda a: cs.backbone_layer1(a, layer1)), (xsc,),
       "backbone layer1 XLA")
act1 = cs.backbone_layer1(xsc, layer1)
for cm in ("concat", "3mm", "notap"):
    for tile in (64, 128):
        timeit(lambda a, c=cm, tl=tile: cs.fused_backbone_v2(
                   a, wtail, l=L, tile=tl, conv_mode=c),
               (act1,), f"backbone v2 tail {cm} tile={tile}")

feats_flat = jnp.asarray(rng.normal(size=(N * 14, 256)), jnp.bfloat16)
for cm in ("concat", "3mm"):
    for tile in (64, 128):
        timeit(lambda a, c=cm, tl=tile: cs.fused_head_v2(
                   a, wh_conv, wh_head, num_classes=1, l4=14, tile=tl,
                   conv_mode=c),
               (feats_flat,), f"head v2 {cm} tile={tile}")

# reshape costs the serve step would pay around the gate
tmpl = jnp.asarray(rng.normal(size=(B, CT, D)), jnp.bfloat16)
timeit(jax.jit(lambda a: a.reshape(B * CT * 14, 256) + 0), (tmpl,),
       "reshape (B,450,3584)->(N*14,256)")
ff = jnp.asarray(rng.normal(size=(B * CT * 14, 256)), jnp.bfloat16)
timeit(jax.jit(lambda a: a.reshape(B, CT, D) + 0), (ff,),
       "reshape (N*14,256)->(B,450,3584)")
