"""TPU probe r2j: int8 concat-tap kernels (conv_mode="cat") vs 3mm,
plus layer1-with-folded-requant. Parity (bit-exact vs 3mm) + timing at
B=128, tile sweep.
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
p_pad = 456
ct_len = 56
l4 = 14
d_feat = l4 * 256

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
layer1_w, _ = cs.backbone_stack_weights(bb_vars)
_, hd_head_w = cs.head_stack_weights(hd_vars)
gate_params = fg.fold_gate_params(
    {"params": det_vars["params"]["gate"],
     "batch_stats": det_vars["batch_stats"]["gate"]},
    alpha=model.alpha, window_size=model.window_size, dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
scan = jnp.asarray(rng.uniform(0.5, 25.0, (B, num_pts)), jnp.float32)
N = B * p_pad


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:52s} {dt:8.3f} ms")
    return out


scan_p = jnp.pad(scan, ((0, 0), (0, p_pad - num_pts)))
enc = jax.jit(lambda s: cutout_fused(
    s, num_cutout_pts=ct_len, window_width=1.0, window_depth=0.5,
    padding_val=29.99, centered=True, area_mode=True, p_valid=num_pts))
cut = jax.block_until_ready(enc(scan_p))

# calibration
act1_f = np.asarray(jax.jit(lambda c: cs.backbone_layer1(
    c, layer1_w, compute_dtype=jnp.float32))(cut[: 8 * p_pad * ct_len]))
bb_blocks = (_block_params(bb_vars, "block1", 3)
             + _block_params(bb_vars, "block2", 3))
hd_blocks = (_block_params(hd_vars, "block3", 3)
             + _block_params(hd_vars, "block4", 2))
tmpl_samp = rng.normal(0, 1, (4096, l4, 256)).astype(np.float32)
kw = dict(pool_after={1, 4}, dequant_last=False)
bb_q3, bb_s, feat_s = cs.quantize_stack_int8(
    bb_blocks[1:], act1_f.reshape(-1, ct_len, 64)[:4096], ct_len, **kw)
bb_qc, _, _ = cs.quantize_stack_int8(
    bb_blocks[1:], act1_f.reshape(-1, ct_len, 64)[:4096], ct_len,
    concat_taps=True, **kw)
hd_q3, hd_s, _ = cs.quantize_stack_int8(hd_blocks, tmpl_samp, l4,
                                        pool_after={2})
hd_qc, _, _ = cs.quantize_stack_int8(hd_blocks, tmpl_samp, l4,
                                     pool_after={2}, concat_taps=True)
embed_w = (gate_params.w * float(feat_s), gate_params.b)

# --- layer1 with folded requant ---
l1q = jax.jit(lambda c: cs.backbone_layer1(c, layer1_w, out_scale=bb_s))
act1_q = timeit("layer1 + folded requant (XLA, int8 out)", l1q, cut)

# parity: bit-exact vs 3mm for backbone and head
for tile in (128,):
    bb3 = jax.jit(lambda a: cs.fused_backbone_int8(
        a, bb_q3, l=ct_len, tile=tile, out_dtype=jnp.int8,
        embed_weights=embed_w))
    bbc = jax.jit(lambda a: cs.fused_backbone_int8(
        a, bb_qc, l=ct_len, tile=tile, out_dtype=jnp.int8,
        embed_weights=embed_w, conv_mode="cat"))
    f3, z3 = bb3(act1_q)
    fc, zc = bbc(act1_q)
    print("backbone cat==3mm feats:",
          np.array_equal(np.asarray(f3), np.asarray(fc)),
          " zx:", np.allclose(np.asarray(z3, np.float32),
                              np.asarray(zc, np.float32)))

tq = jnp.asarray(rng.integers(-127, 128, (N * l4, 256)), jnp.int8)
hd3 = jax.jit(lambda t: cs.fused_head_int8(t, hd_q3, hd_head_w,
                                           num_classes=1, l4=l4, tile=128))
hdc = jax.jit(lambda t: cs.fused_head_int8(t, hd_qc, hd_head_w,
                                           num_classes=1, l4=l4, tile=128,
                                           conv_mode="cat"))
c3, r3 = hd3(tq)
cc, rc = hdc(tq)
print("head cat==3mm cls:", np.array_equal(np.asarray(c3), np.asarray(cc)),
      " reg:", np.array_equal(np.asarray(r3), np.asarray(rc)))

# --- timing sweep ---
for tile in (64, 128):
    bb3 = jax.jit(lambda a, t=tile: cs.fused_backbone_int8(
        a, bb_q3, l=ct_len, tile=t, out_dtype=jnp.int8,
        embed_weights=embed_w))
    bbc = jax.jit(lambda a, t=tile: cs.fused_backbone_int8(
        a, bb_qc, l=ct_len, tile=t, out_dtype=jnp.int8,
        embed_weights=embed_w, conv_mode="cat"))
    timeit(f"backbone int8 3mm tile={tile}", bb3, act1_q)
    timeit(f"backbone int8 cat tile={tile}", bbc, act1_q)
for tile in (64, 128, 256):
    hd3 = jax.jit(lambda t, tl=tile: cs.fused_head_int8(
        t, hd_q3, hd_head_w, num_classes=1, l4=l4, tile=tl))
    hdc = jax.jit(lambda t, tl=tile: cs.fused_head_int8(
        t, hd_qc, hd_head_w, num_classes=1, l4=l4, tile=tl,
        conv_mode="cat"))
    timeit(f"head int8 3mm tile={tile}", hd3, tq)
    timeit(f"head int8 cat tile={tile}", hdc, tq)
