"""Frozen-detector FlowDROW forward on the serving kernels, for training.

FlowDROW trains ONLY its flow head — the DR-SPAAM detector underneath is
frozen (reference ``dr_spaam.py:294-298``: ``requires_grad=False``; here
``stop_gradient``). Round 2 measured the train step at 36.5 ms (B=8 x 11
scans) dominated by exactly the two things the serving path already solved:
the f32 cutout encode and the 11-step temporal unroll through the dense
module gate. Since no gradient flows through the detector, its forward can
legally run the inference-only fused pipeline: the Pallas cutout kernel,
folded-BN bf16 fused conv stacks, and the banded z-carry gate — ~3x less
step time, with the flow head (the only trained part) unchanged and exact.

BatchNorm folding here is TRACED (pure jnp) because the train step jits
over the variables; the fold is weight-shaped and free next to the convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.infer import fast_gate as fg
from planar_optical_flow_tpu.ops.pallas import conv_stack as cs


def _fold_conv_bn(conv, bn, stats, eps=1e-5):
    w = conv["kernel"].astype(jnp.float32)
    b = conv.get("bias", jnp.zeros(w.shape[-1])).astype(jnp.float32)
    scale = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        stats["var"].astype(jnp.float32) + eps)
    return w * scale, (b - stats["mean"].astype(jnp.float32)) * scale \
        + bn["bias"].astype(jnp.float32)


def _block(params, stats, name, n):
    out = []
    for i in range(n):
        cb = f"ConvBlock_{i}"
        out.append(_fold_conv_bn(params[name][cb]["Conv_0"],
                                 params[name][cb]["BatchNorm_0"],
                                 stats[name][cb]["BatchNorm_0"]))
    return out


def _tapstack(blocks):
    """[(w (3,Cin,Cout), b)] -> flat [wcat (3Cin, Cout), b, ...] (traced
    equivalent of ``conv_stack.prepare_stack_weights``)."""
    flat = []
    for w, b in blocks:
        k, cin, cout = w.shape
        flat += [w.reshape(k * cin, cout), b]
    return flat


def fold_detector(det_vars, alpha: float, window_size: int):
    """Traced folded weights of a frozen SpatialDrow: (layer1, backbone
    tail, head convs, head dense, gate params)."""
    p, s = det_vars["params"], det_vars["batch_stats"]
    bb_blocks = (_block(p["backbone"], s["backbone"], "block1", 3)
                 + _block(p["backbone"], s["backbone"], "block2", 3))
    layer1 = bb_blocks[0]
    bb_tail = _tapstack(bb_blocks[1:])
    hd_blocks = (_block(p["head"], s["head"], "block3", 3)
                 + _block(p["head"], s["head"], "block4", 2))
    hd_conv = _tapstack(hd_blocks)
    hd_dense = (p["head"]["cls"]["kernel"], p["head"]["cls"]["bias"],
                p["head"]["reg"]["kernel"], p["head"]["reg"]["bias"])
    ge = p["gate"]["embed"]
    gbn, gst = p["gate"]["embed_bn"], s["gate"]["embed_bn"]
    scale = gbn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        gst["var"].astype(jnp.float32) + 1e-5)
    gate = fg.GateParams(
        w=(ge["kernel"].astype(jnp.float32) * scale).astype(jnp.bfloat16),
        b=((ge.get("bias", jnp.zeros(128)).astype(jnp.float32)
            - gst["mean"].astype(jnp.float32)) * scale
           + gbn["bias"].astype(jnp.float32)).astype(jnp.bfloat16),
        alpha=float(alpha), window_size=int(window_size),
    )
    return layer1, bb_tail, hd_conv, hd_dense, gate


@functools.partial(jax.jit, static_argnames=(
    "alpha", "window_size", "num_classes", "num_pts", "ct_len",
    "window_width", "window_depth", "padding_val", "centered", "area_mode",
    "tile", "interpret"))
def frozen_detector_forward(det_vars, scans, *, alpha: float,
                            window_size: int, num_classes: int,
                            num_pts: int, ct_len: int,
                            window_width: float, window_depth: float,
                            padding_val: float = 29.99,
                            centered: bool = True, area_mode: bool = True,
                            tile: int = 64, interpret: bool = False):
    """Fused inference forward of the frozen detector over a scan stack.

    scans: (B, S, P) f32, scan S-1 current. Returns (pred_cls (B, P, C),
    pred_reg (B, P, 2), sim_band (B, P, window)) — all stop_gradient'ed.
    Requires the fixed-geometry cutout config (``fixed=True, stride=1``).
    """
    from planar_optical_flow_tpu.ops.pallas.cutout_kernel import cutout_fused

    det_vars = jax.lax.stop_gradient(det_vars)
    layer1, bb_tail, hd_conv, hd_dense, gate = fold_detector(
        det_vars, alpha, window_size)

    b, s_scans, p = scans.shape
    p_pad = ((num_pts + 7) // 8) * 8
    l4 = ct_len // 4
    d_feat = l4 * 256

    flat_scans = scans.reshape(b * s_scans, p)
    scan_p = jnp.pad(flat_scans, ((0, 0), (0, p_pad - num_pts)))
    cut = cutout_fused(
        scan_p, num_cutout_pts=ct_len, window_width=window_width,
        window_depth=window_depth, padding_val=padding_val,
        centered=centered, area_mode=area_mode, p_valid=num_pts,
        interpret=interpret,
    )  # (B*S*p_pad, L) f32

    act1 = cs.backbone_layer1(cut, layer1)  # (N*L, 64) bf16
    feats, zx = cs.fused_backbone_v2(
        act1, bb_tail, l=ct_len, tile=tile, compute_dtype=jnp.bfloat16,
        conv_mode="3mm", embed_weights=(gate.w, gate.b),
        interpret=interpret,
    )
    feats = feats.reshape(b, s_scans, p_pad, d_feat).astype(jnp.bfloat16)
    zx = zx.reshape(b, s_scans, p_pad, 128)

    # temporal recursion: template from scan 0, gate through scans 1..S-1
    # (reference dr_spaam.py:262-277); z-carry form of the same math
    template = feats[:, 0].reshape(b * p_pad, d_feat)
    z = zx[:, 0].reshape(b * p_pad, 128)
    sim = None
    for i in range(1, s_scans):
        template, z, sim = fg.gate_fused_flat(
            zx[:, i].reshape(b * p_pad, 128), z,
            feats[:, i].reshape(b * p_pad, d_feat), template,
            ct=p_pad, ct_valid=num_pts, alpha=gate.alpha,
            window_size=gate.window_size, interpret=interpret,
        )
    if sim is None:  # single-scan stack: self-attention bootstrap
        _, _, sim = fg.gate_fused_flat(
            z, z, template, template, ct=p_pad, ct_valid=num_pts,
            alpha=gate.alpha, window_size=gate.window_size,
            interpret=interpret,
        )

    cls, reg = cs.fused_head_v2(
        template.reshape(b * p_pad * l4, 256), hd_conv, hd_dense,
        num_classes=num_classes, l4=l4, tile=tile,
        compute_dtype=jnp.bfloat16, interpret=interpret,
    )
    pred_cls = cls.reshape(b, p_pad, -1)[:, :num_pts]
    pred_reg = reg.reshape(b, p_pad, 2)[:, :num_pts]
    sim_band = (sim.reshape(b, p_pad, -1)[:, :num_pts]
                .astype(jnp.float32))
    return (jax.lax.stop_gradient(pred_cls),
            jax.lax.stop_gradient(pred_reg),
            jax.lax.stop_gradient(sim_band))
