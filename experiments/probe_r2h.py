"""TPU probe r2h: component breakdown of the serve-v3 int8c step @ B=128.

Times each stage of the fused pipeline in isolation (own jit, realistic
inputs) to locate the gap between the 31.9 ms step and the ~5-9 ms
compute roofline.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer import fast_gate as fg
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs
from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params
from planar_optical_flow_tpu.ops.pallas.cutout_kernel import cutout_fused
from planar_optical_flow_tpu.ops.nms import nms_predicted_center_topk
from planar_optical_flow_tpu.ops.geometry import get_laser_phi

B = 128
ITERS = 50
num_pts = 450
p_pad = 456
ct_len = 56
l4 = 14
d_feat = l4 * 256
TILE = 128

model = FlowDrow(window_size=11, pedestrian_only=True)
x0 = jnp.zeros((1, num_pts, 1, ct_len))
cur0 = jnp.zeros((1, num_pts))
variables = model.init(jax.random.PRNGKey(0), x0, cur0, train=False)
det_vars = {"params": variables["params"]["dr_spaam"],
            "batch_stats": variables["batch_stats"]["dr_spaam"]}
bb_vars = {"params": det_vars["params"]["backbone"],
           "batch_stats": det_vars["batch_stats"]["backbone"]}
hd_vars = {"params": det_vars["params"]["head"],
           "batch_stats": det_vars["batch_stats"]["head"]}
layer1_w, bb_tail_w = cs.backbone_stack_weights(bb_vars)
hd_conv_w, hd_head_w = cs.head_stack_weights(hd_vars)
gate_params = fg.fold_gate_params(
    {"params": det_vars["params"]["gate"],
     "batch_stats": det_vars["batch_stats"]["gate"]},
    alpha=model.alpha, window_size=model.window_size, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (B, num_pts)), jnp.float32)
phi_j = jnp.asarray(get_laser_phi(num_pts=num_pts), jnp.float32)

N = B * p_pad


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:42s} {dt:8.3f} ms")
    return out


# --- stage 1: cutout (pallas) ---
scan_p = jnp.pad(scan, ((0, 0), (0, p_pad - num_pts)))
enc = jax.jit(lambda s: cutout_fused(
    s, num_cutout_pts=ct_len, window_width=1.0, window_depth=0.5,
    padding_val=29.99, centered=True, area_mode=True, p_valid=num_pts))
cut = timeit("cutout_fused (pallas)", enc, scan_p)  # (N, 56) f32

# --- stage 2: backbone layer 1 (XLA) ---
l1 = jax.jit(lambda c: cs.backbone_layer1(c, layer1_w,
                                          compute_dtype=jnp.float32))
act1 = timeit("backbone_layer1 (XLA f32)", l1, cut)  # (N*56, 64)

# --- int8 calibration ---
act1_c = np.asarray(act1[: 8 * p_pad * ct_len])
bb_blocks = (_block_params(bb_vars, "block1", 3)
             + _block_params(bb_vars, "block2", 3))
bb_q, bb_in_scale, feat_scale = cs.quantize_stack_int8(
    bb_blocks[1:], act1_c.reshape(-1, ct_len, 64)[:4096], ct_len,
    pool_after={1, 4}, dequant_last=False)
hd_blocks = (_block_params(hd_vars, "block3", 3)
             + _block_params(hd_vars, "block4", 2))
tmpl_samp = rng.normal(0, 1, (4096, l4, 256)).astype(np.float32)
hd_q, hd_in_scale, _ = cs.quantize_stack_int8(
    tmpl_samp_blocks := hd_blocks, tmpl_samp, l4, pool_after={2})
feat_scale = float(feat_scale)
tmpl_scale = float(hd_in_scale)
embed_w = (gate_params.w, gate_params.b)

# --- stage 3: quantize act1 ---
q1 = jax.jit(lambda a: cs.quantize_int8(a, bb_in_scale))
act1_q = timeit("quantize act1 -> int8 (XLA)", q1, act1)

# --- stage 4: fused backbone int8 (+ embed epilogue) ---
bb = jax.jit(lambda a: cs.fused_backbone_int8(
    a, bb_q, l=ct_len, tile=TILE, out_dtype=jnp.int8,
    embed_weights=(embed_w[0] * feat_scale, embed_w[1])))
feats, zx = timeit("fused_backbone_int8 (pallas, tile=128)", bb, act1_q)
feats = feats.reshape(N, d_feat)

# --- stage 5: gate int8 ---
tq = jnp.asarray(
    rng.integers(-127, 127, (N, d_feat)), jnp.int8)
zt = jnp.asarray(rng.normal(0, 1, (N, 128)), jnp.bfloat16)
gt = jax.jit(lambda zx_, zt_, x_, t_: fg.gate_fused_int8(
    zx_, zt_, x_, t_, ct=p_pad, ct_valid=num_pts, alpha=model.alpha,
    window_size=model.window_size, s_x=feat_scale, s_t=tmpl_scale,
    s_out=tmpl_scale))
new_t, new_z, sim = timeit("gate_fused_int8 (pallas)", gt, zx, zt, feats, tq)

# --- stage 6: head int8 ---
hd = jax.jit(lambda t: cs.fused_head_int8(
    t.reshape(-1, 256), hd_q, hd_head_w, num_classes=1, l4=l4, tile=TILE))
cls, reg = timeit("fused_head_int8 (pallas, tile=128)", hd, new_t)

# --- stage 7: flow head ---
from planar_optical_flow_tpu.infer.streaming import cast_variables
gate_vars = cast_variables(variables, jnp.bfloat16)
sim_b = sim.reshape(B, p_pad, -1)[:, :num_pts].astype(jnp.bfloat16)
fl = jax.jit(lambda s, c: model.apply(
    gate_vars, s, c, method=lambda m, s_, c_: m._flow_head(s_, c_,
                                                           train=False)))
flow = timeit("flow head (XLA bf16)", fl, sim_b, scan.astype(jnp.bfloat16))

# --- stage 8: NMS top-64 ---
probs = jax.nn.sigmoid(cls.reshape(B, p_pad, -1)[:, :num_pts]
                       .astype(jnp.float32))
regs = reg.reshape(B, p_pad, 2)[:, :num_pts].astype(jnp.float32)
nm = jax.jit(lambda s, c, r: jax.vmap(
    lambda s_, c_, r_: nms_predicted_center_topk(
        s_, phi_j, c_, r_, min_dist=0.5, top_k=64))(s, c, r))
timeit("nms top-64 (XLA vmap)", nm, scan, probs, regs)

print("---")
print("sum of stages above vs 31.86 ms integrated step")
