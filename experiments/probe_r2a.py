"""TPU probe round-2a: pallas banded gate mix + conv-stack v2 variants."""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs
from planar_optical_flow_tpu.infer.streaming import make_serve_step

B = int(os.environ.get("B", "128"))
N = B * 450
L = 56
ITERS = int(os.environ.get("ITERS", "30"))
KEY = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)


def timeit(fn, arg, label, feedback=None):
    try:
        a = arg
        out = fn(a)
        for _ in range(2):
            a = feedback(a, out) if feedback else arg
            out = fn(a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            a = feedback(a, out) if feedback else arg
            out = fn(a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"label": label, "ms": round(dt, 2)}), flush=True)
        return dt
    except Exception as e:
        print(json.dumps({"label": label, "error": str(e)[:200]}), flush=True)


def fb_x(a, out):
    lead = jax.tree_util.tree_leaves(out)[0]
    eps = (lead.ravel()[:1].astype(jnp.float32) * 1e-20).astype(a.dtype)
    return a + eps[0]


# ---- conv stacks
x = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))
bb = DrowBackbone()
vb = bb.init(KEY, x[..., None], train=False)
wb = cs.backbone_stack_weights(vb)
hd = DrowHead(num_classes=1)
f0 = jnp.asarray(rng.normal(size=(N, L // 4, 256)).astype(np.float32))
vh = hd.init(KEY, f0, train=False)
wh_conv, wh_head = cs.head_stack_weights(vh)
cast16 = lambda v: jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16)
    if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
vb16, vh16 = cast16(vb), cast16(vh)
x16 = x.astype(jnp.bfloat16)
f16 = f0.astype(jnp.bfloat16)

timeit(jax.jit(lambda a: bb.apply(vb16, a[..., None], train=False)), x16,
       "backbone XLA bf16", fb_x)
timeit(jax.jit(lambda a: hd.apply(vh16, a, train=False)), f16,
       "head XLA bf16", fb_x)
timeit(jax.jit(lambda a: cs.im2col_taps(a)), x16, "im2col bf16", fb_x)

taps = cs.im2col_taps(x16)
for tile in (32, 64):
    for pm in ("reshape", "stride"):
        timeit(lambda a, t=tile, p=pm: cs.fused_backbone_v2(
                   a, wb, l=L, tile=t, pool_mode=p),
               taps, f"backbone v2 tile={tile} pool={pm}", fb_x)
for tile in (64, 256):
    for pm in ("reshape", "stride"):
        timeit(lambda a, t=tile, p=pm: cs.fused_head_v2(
                   a, wh_conv, wh_head, num_classes=1, tile=t, pool_mode=p),
               f16, f"head v2 tile={tile} pool={pm}", fb_x)

# ---- full serve step with pallas gate mix
num_pts = 450
cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                     window_depth=0.5, num_cutout_pts=56, padding_val=29.99,
                     area_mode=True, gather_mode="matmul")
model = FlowDrow(window_size=11, pedestrian_only=True)
xx = jnp.zeros((1, num_pts, 1, 56))
cur = jnp.zeros((1, num_pts))
variables = model.init(KEY, xx, cur, train=False)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (B, num_pts)), jnp.float32)

step = make_serve_step(model, variables, cutout_kwargs, num_pts=num_pts,
                       compute_dtype=jnp.bfloat16, gate_mix="pallas")
carry, out = step(None, scan)
for _ in range(3):
    carry, out = step(carry, scan)
float(out["pred_cls"][0, 0, 0])
t0 = time.perf_counter()
for _ in range(ITERS):
    carry, out = step(carry, scan)
float(out["pred_cls"][0, 0, 0])
dt = (time.perf_counter() - t0) / ITERS * 1000
print(json.dumps({"label": "serve_step bf16 gate=pallas", "ms": round(dt, 2),
                  "scans_per_s": round(B / dt * 1000, 1)}), flush=True)
