"""TPU probe r2l: position-major int8 kernels — parity vs cutout-major
(cat) kernels at the same p_pad, and timing at B=128.

Layout maps (S streams, T = p_pad//tile blocks, L positions):
  act1 cm rows (s, ct, l)  ->  pm rows (s, t, l, k)
  feats cm rows (s, ct, p) ->  pm rows (s, t, p, k)
  zx / cls / reg rows (s, ct) == pm (s, t, k): identical order.
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

B = 128
ITERS = 50
num_pts = 450
P = 480          # p_pad for pm (divisible by tile)
TILE = 160
T = P // TILE
L = 56
L4 = 14
model = FlowDrow(window_size=11, pedestrian_only=True)
x0 = jnp.zeros((1, num_pts, 1, L))
cur0 = jnp.zeros((1, num_pts))
variables = model.init(jax.random.PRNGKey(0), x0, cur0, train=False)
det_vars = {"params": variables["params"]["dr_spaam"],
            "batch_stats": variables["batch_stats"]["dr_spaam"]}
bb_vars = {"params": det_vars["params"]["backbone"],
           "batch_stats": det_vars["batch_stats"]["backbone"]}
hd_vars = {"params": det_vars["params"]["head"],
           "batch_stats": det_vars["batch_stats"]["head"]}
layer1_w, _ = cs.backbone_stack_weights(bb_vars)
_, hd_head_w = cs.head_stack_weights(hd_vars)
gate_params = fg.fold_gate_params(
    {"params": det_vars["params"]["gate"],
     "batch_stats": det_vars["batch_stats"]["gate"]},
    alpha=model.alpha, window_size=model.window_size, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (B, num_pts)), jnp.float32)
N = B * P


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:52s} {dt:8.3f} ms")
    return out


scan_p = jnp.pad(scan, ((0, 0), (0, P - num_pts)))
enc = jax.jit(lambda s: cutout_fused(
    s, num_cutout_pts=L, window_width=1.0, window_depth=0.5,
    padding_val=29.99, centered=True, area_mode=True, p_valid=num_pts))
cut = jax.block_until_ready(enc(scan_p))  # (N, L)

act1_f = np.asarray(jax.jit(lambda c: cs.backbone_layer1(
    c, layer1_w, compute_dtype=jnp.float32))(cut[: 8 * P * L]))
bb_blocks = (_block_params(bb_vars, "block1", 3)
             + _block_params(bb_vars, "block2", 3))
hd_blocks = (_block_params(hd_vars, "block3", 3)
             + _block_params(hd_vars, "block4", 2))
tmpl_samp = rng.normal(0, 1, (4096, L4, 256)).astype(np.float32)
kw = dict(pool_after={1, 4}, dequant_last=False, concat_taps=True)
bb_q, bb_s, feat_s = cs.quantize_stack_int8(
    bb_blocks[1:], act1_f.reshape(-1, L, 64)[:4096], L, **kw)
hd_q, hd_s, _ = cs.quantize_stack_int8(hd_blocks, tmpl_samp, L4,
                                       pool_after={2}, concat_taps=True)
feat_s = float(feat_s)
tmpl_s = float(hd_s)
embed_w = (gate_params.w * feat_s, gate_params.b)

l1q = jax.jit(lambda c: cs.backbone_layer1(c, layer1_w, out_scale=bb_s))
act1_q = jax.block_until_ready(l1q(cut))  # (N*L, 64) cm rows (s, ct, l)

# cm -> pm act1: (S, T, tile, L, 64) -> (S, T, L, tile, 64)
l1q_pm = jax.jit(lambda c: cs.backbone_layer1(c, layer1_w, out_scale=bb_s)
                 .reshape(B, T, TILE, L, 64).transpose(0, 1, 3, 2, 4)
                 .reshape(-1, 64))
act1_pm = timeit("layer1 int8 + pm transpose (XLA)", l1q_pm, cut)

# --- backbone parity ---
bb_cm = jax.jit(lambda a: cs.fused_backbone_int8(
    a, bb_q, l=L, tile=128, out_dtype=jnp.int8, embed_weights=embed_w,
    conv_mode="cat"))
bb_pm = jax.jit(lambda a: cs.fused_backbone_int8_pm(
    a, bb_q, l=L, tile=TILE, out_dtype=jnp.int8, embed_weights=embed_w))
f_cm, z_cm = bb_cm(act1_q)
f_pm, z_pm = bb_pm(act1_pm)
f_cm_as_pm = (np.asarray(f_cm).reshape(B, T, TILE, L4, 256)
              .transpose(0, 1, 3, 2, 4).reshape(-1, 256))
print("backbone pm==cm feats:",
      np.array_equal(f_cm_as_pm, np.asarray(f_pm)),
      " zx close:", np.allclose(np.asarray(z_cm, np.float32),
                                np.asarray(z_pm, np.float32),
                                rtol=0.02, atol=0.02))

# --- gate parity ---
tq_pm = jnp.asarray(rng.integers(-127, 128, (N * L4, 256)), jnp.int8)
tq_cm = jnp.asarray(np.asarray(tq_pm).reshape(B, T, L4, TILE, 256)
                    .transpose(0, 1, 3, 2, 4).reshape(N, L4 * 256))
zt = jnp.asarray(rng.normal(0, 1, (N, 128)), jnp.bfloat16)
x_cm = jnp.asarray(np.asarray(f_cm).reshape(N, L4 * 256))
g_cm = jax.jit(lambda zx, zt_, x, t: fg.gate_fused_int8(
    zx, zt_, x, t, ct=P, ct_valid=num_pts, alpha=model.alpha,
    window_size=model.window_size, s_x=feat_s, s_t=tmpl_s, s_out=tmpl_s))
g_pm = jax.jit(lambda zx, zt_, x, t: fg.gate_fused_int8_pm(
    zx, zt_, x, t, ct=P, tile=TILE, l4=L4, ct_valid=num_pts,
    alpha=model.alpha, window_size=model.window_size, s_x=feat_s,
    s_t=tmpl_s, s_out=tmpl_s))
nt_cm, nz_cm, sim_cm = g_cm(z_cm, zt, x_cm, tq_cm)
nt_pm, nz_pm, sim_pm = g_pm(z_pm, zt, f_pm, tq_pm)
nt_cm_as_pm = (np.asarray(nt_cm).reshape(B, T, TILE, L4, 256)
               .transpose(0, 1, 3, 2, 4).reshape(-1, 256))
dt_frac = (nt_cm_as_pm != np.asarray(nt_pm)).mean()
print("gate pm vs cm: template mismatch frac (rint boundary):",
      f"{dt_frac:.2e}",
      " sim close:", np.allclose(np.asarray(sim_cm), np.asarray(sim_pm),
                                 rtol=0.02, atol=0.05),
      " z close:", np.allclose(np.asarray(nz_cm, np.float32),
                               np.asarray(nz_pm, np.float32),
                               rtol=0.05, atol=0.05))

# --- head parity ---
hd_cm = jax.jit(lambda t: cs.fused_head_int8(
    t, hd_q, hd_head_w, num_classes=1, l4=L4, tile=128, conv_mode="cat"))
hd_pm = jax.jit(lambda t: cs.fused_head_int8_pm(
    t, hd_q, hd_head_w, num_classes=1, l4=L4, tile=TILE))
c_cm, r_cm = hd_cm(tq_cm.reshape(-1, 256))
c_pm, r_pm = hd_pm(tq_pm)
print("head pm~cm cls:", np.allclose(np.asarray(c_cm), np.asarray(c_pm),
                                     rtol=1e-4, atol=1e-4),
      " reg:", np.allclose(np.asarray(r_cm), np.asarray(r_pm),
                           rtol=1e-4, atol=1e-4))

# --- timing ---
timeit("backbone int8 cm cat tile=128 (p_pad=480)", bb_cm, act1_q)
timeit("backbone int8 PM tile=160", bb_pm, act1_pm)
timeit("gate int8 cm", g_cm, z_cm, zt, x_cm, tq_cm)
timeit("gate int8 PM", g_pm, z_pm, zt, f_pm, tq_pm)
timeit("head int8 cm cat tile=128", hd_cm, tq_cm.reshape(-1, 256))
timeit("head int8 PM tile=160", hd_pm, tq_pm)

for tile in (96,):
    bb_pm2 = jax.jit(lambda a, t=tile: cs.fused_backbone_int8_pm(
        a, bb_q, l=L, tile=t, out_dtype=jnp.int8, embed_weights=embed_w))
    act1_pm2 = jnp.asarray(
        np.asarray(act1_q).reshape(B, P // tile, tile, L, 64)
        .transpose(0, 1, 3, 2, 4).reshape(-1, 64))
    timeit(f"backbone int8 PM tile={tile}", bb_pm2, act1_pm2)
    hd_pm2 = jax.jit(lambda t_, t=tile: cs.fused_head_int8_pm(
        t_, hd_q, hd_head_w, num_classes=1, l4=L4, tile=t))
    tq_pm2 = jnp.asarray(
        np.asarray(tq_cm).reshape(B, P // tile, tile, L4, 256)
        .transpose(0, 1, 3, 2, 4).reshape(-1, 256))
    timeit(f"head int8 PM tile={tile}", hd_pm2, tq_pm2)
