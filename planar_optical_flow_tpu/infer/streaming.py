"""Stateful streaming inference: one jitted step per incoming scan.

This is the first-class API for the serve path the reference hides in
``depracted_scripts/infer_person_flow.py:101-187`` (per-frame host cutout +
template memory stored in ``model._feat``, ``dr_spaam.py:306-310``). Here the
template is an explicit carry and the whole per-scan pipeline — cutout
encoding, backbone, attention gate, detection heads, sigmoid, canonical→
global flow rotation, vote NMS — is ONE compiled XLA program; the host only
feeds raw ``(B, 450)`` scans and reads back fixed-shape results.

Supports batched independent streams (B > 1): template state is per-stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from planar_optical_flow_tpu.ops.cutout import scans_to_cutout, area_s_for
from planar_optical_flow_tpu.ops.geometry import (
    get_laser_phi,
    canonical_to_global_flow,
)
from planar_optical_flow_tpu.ops.nms import nms_predicted_center
from planar_optical_flow_tpu.models.flow_drow import FlowDrow


def serve_output_fields(is_flow: bool, with_nms: bool) -> tuple:
    """The caller-facing output contract every step builder produces
    (:func:`_detection_epilogue`) — the single source of truth for
    ``output_fields`` validation, so the construction-time checks in
    the v3 builder and :class:`StreamingRunner` cannot drift."""
    return (("pred_cls", "pred_reg")
            + (("pred_flow",) if is_flow else ())
            + (("det_xys", "det_cls", "det_keep", "instance_mask")
               if with_nms else ()))


def _sanitize_scan(scan, max_range: float):
    """Hostile-input guard shared by every step builder: non-finite
    ranges (NaN/Inf from a faulty sensor) map to ``max_range`` (no
    echo), everything clips to the sensor's [0, max_range] envelope.
    Bit-exact identity on in-range data; one VPU where+clip that fuses
    into the cutout producer (measured ~free, BASELINE.md round 5)."""
    return jnp.clip(jnp.where(jnp.isfinite(scan), scan, max_range),
                    0.0, max_range)


def _detection_epilogue(scan, pred_cls, pred_reg, flow, phi_j, *,
                        with_nms, nms_min_dist, nms_top_k=None):
    """Shared tail of every serving step: sigmoid -> canonical->global
    flow rotation -> vote NMS. One definition so the five step builders
    cannot drift (same outputs contract everywhere).

    ``flow``: canonical-frame (B, P, 2) f32 or None; ``pred_cls``/
    ``pred_reg``/``scan`` f32. ``nms_top_k`` selects the top-k serving
    NMS (exactness argument at ``ops/nms.py:19-28``)."""
    probs = jax.nn.sigmoid(pred_cls)
    out = {"pred_cls": probs, "pred_reg": pred_reg}
    if flow is not None:
        out["pred_flow"] = canonical_to_global_flow(flow, phi_j)
    if with_nms:
        conf = probs if probs.shape[-1] == 1 else probs[..., -1:]
        if nms_top_k:
            from planar_optical_flow_tpu.ops.nms import (
                nms_predicted_center_topk,
            )

            nms_fn = lambda s, c, r: nms_predicted_center_topk(
                s, phi_j, c, r, min_dist=nms_min_dist, top_k=nms_top_k
            )
        else:
            nms_fn = lambda s, c, r: nms_predicted_center(
                s, phi_j, c, r, min_dist=nms_min_dist
            )
        det_xys, det_cls, keep, inst = jax.vmap(nms_fn)(
            scan, conf, pred_reg
        )
        out.update(det_xys=det_xys, det_cls=det_cls, det_keep=keep,
                   instance_mask=inst)
    return out


def merge_stream_carries(carry, boot_carry, reset_mask):
    """Per-stream carry merge: rows belonging to streams where
    ``reset_mask`` is True are taken from ``boot_carry``, the rest keep
    ``carry``. This is how individual streams (robots/sensors) join or
    restart inside a live serving batch without disturbing the others.

    Works for every engine's carry because each leaf's leading dimension
    is the batch times a per-leaf row count, laid out stream-major: the
    module path's ``(B, ...)`` template, the flat/pm/p2 serving carries'
    ``(B * rows_per_stream, ...)`` template/z (cutouts are stream-major
    and the pm block size divides the padded cutout count, so no row
    block straddles streams).

    ``reset_mask``: (B,) bool. Returns a new carry pytree.
    """
    mask = jnp.asarray(reset_mask, dtype=bool)
    b = mask.shape[0]

    def merge(old, boot):
        if old.shape != boot.shape:
            raise ValueError(
                f"carry/boot leaf shape mismatch: {old.shape} vs "
                f"{boot.shape}")
        rows = old.shape[0]
        if rows % b:
            raise ValueError(
                f"carry leaf leading dim {rows} is not a multiple of the "
                f"batch {b} — cannot attribute rows to streams")
        m = jnp.repeat(mask, rows // b)
        return jnp.where(m.reshape((rows,) + (1,) * (old.ndim - 1)),
                         boot, old)

    return jax.tree_util.tree_map(merge, carry, boot_carry)


def _merge_stream_outputs(out, boot_out, reset_mask):
    """Outputs counterpart of :func:`merge_stream_carries`: every output
    leaf leads with the batch dim."""
    mask = jnp.asarray(reset_mask, dtype=bool)
    return jax.tree_util.tree_map(
        lambda a, bo: jnp.where(
            mask.reshape((mask.shape[0],) + (1,) * (a.ndim - 1)), bo, a),
        out, boot_out)


def _encode_single(scan, phi, cutout_kwargs):
    kw = dict(cutout_kwargs)
    if kw.pop("area_mode", False):
        kw["area_mode"] = True
        kw.setdefault(
            "area_s",
            area_s_for(kw.get("window_width", 1.66),
                       kw.get("num_cutout_pts", 48)),
        )
    ct = scans_to_cutout(scan[:, None, :], phi, **kw)  # (B, P, 1, C)
    return ct[:, :, 0, :]


def cast_variables(variables, dtype):
    """Cast float parameters/stats to ``dtype`` (e.g. bf16 serving)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        variables,
    )


def make_fused_stream_step(model, variables, cutout_kwargs,
                           num_pts: int = 450, nms_min_dist: float = 0.5,
                           with_nms: bool = True, compute_dtype=None,
                           tile: int = 64, interpret: bool = False):
    """Streaming step with the Pallas fused backbone/head kernels
    (inference-only; BatchNorm folded from f32 ``variables``).

    Returns ``step(template, scan) -> (template', outputs)`` — the folded
    weights are closed over, so there is no ``variables`` argument.
    """
    from planar_optical_flow_tpu.ops.pallas import fused_drow as fd

    phi = get_laser_phi(num_pts=num_pts)
    phi_j = jnp.asarray(phi, dtype=jnp.float32)
    is_flow = isinstance(model, FlowDrow)
    det_vars = (
        {"params": variables["params"]["dr_spaam"],
         "batch_stats": variables["batch_stats"]["dr_spaam"]}
        if is_flow else variables
    )
    w_bb = fd.backbone_weights({
        "params": det_vars["params"]["backbone"],
        "batch_stats": det_vars["batch_stats"]["backbone"],
    })
    w_hd = fd.head_weights({
        "params": det_vars["params"]["head"],
        "batch_stats": det_vars["batch_stats"]["head"],
    })
    num_classes = det_vars["params"]["head"]["cls"]["kernel"].shape[-1]
    cdt = compute_dtype or jnp.float32
    gate_vars = cast_variables(variables, cdt) if compute_dtype else variables

    def gate_apply(feats, template):
        if is_flow:
            fn = lambda m, a, b: m.dr_spaam.gate(a, b, train=False)
        else:
            fn = lambda m, a, b: m.gate(a, b, train=False)
        return model.apply(gate_vars, feats, template, method=fn)

    def flow_apply(sim, cur_scan):
        return model.apply(
            gate_vars, sim, cur_scan,
            method=lambda m, s, c: m._flow_head(s, c, train=False),
        )

    def step(template, scan):
        b = scan.shape[0]
        cutouts = _encode_single(scan, phi, cutout_kwargs)  # (B, P, C)
        feats = fd.fused_backbone(
            cutouts.reshape(b * num_pts, -1), w_bb, tile=tile,
            compute_dtype=cdt, interpret=interpret,
        )
        l4, ch = feats.shape[-2], feats.shape[-1]
        feats = feats.reshape(b, num_pts, l4 * ch)  # gate runs on flat feats
        if compute_dtype is not None:
            feats = feats.astype(compute_dtype)
        if template is None:
            new_template = feats
            _, sim = gate_apply(feats, feats)
        else:
            new_template, sim = gate_apply(feats, template)
        cls, reg = fd.fused_head(
            new_template.astype(jnp.float32).reshape(b * num_pts, l4, ch),
            w_hd, num_classes=num_classes, tile=tile,
            compute_dtype=cdt, interpret=interpret,
        )
        pred_cls = cls.reshape(b, num_pts, -1)
        pred_reg = reg.reshape(b, num_pts, 2)
        flow = None
        if is_flow:
            flow = flow_apply(
                sim, scan.astype(cdt) if compute_dtype else scan
            ).astype(jnp.float32)
        out = _detection_epilogue(scan, pred_cls, pred_reg, flow, phi_j,
                                  with_nms=with_nms,
                                  nms_min_dist=nms_min_dist)
        return new_template, out

    step_boot = jax.jit(lambda s: step(None, s))
    step_carry = jax.jit(step, donate_argnums=(0,))

    def dispatch(template, scan):
        if template is None:
            return step_boot(scan)
        return step_carry(template, scan)

    return dispatch


def make_quantized_stream_step(model, variables, cutout_kwargs, calib_scans,
                               num_pts: int = 450, nms_min_dist: float = 0.5,
                               with_nms: bool = True,
                               gate_dtype=jnp.bfloat16,
                               sanitize_inputs: bool = True):
    """Streaming step with int8 conv stacks (backbone + head convs).

    The conv stacks are activation-bandwidth bound; int8 halves their
    traffic and doubles MXU rate (see ops/quantized_drow.py). BatchNorm is
    folded, weights are per-channel int8, activation scales are calibrated
    on ``calib_scans`` (f32 ``(B, num_pts)``) by running the f32 reference
    step. The attention gate and flow head stay in ``gate_dtype``; NMS and
    flow rotation stay f32.

    Returns ``step(template, scan) -> (template', outputs)``.
    """
    import numpy as np_

    from planar_optical_flow_tpu.ops.pallas import fused_drow as fd
    from planar_optical_flow_tpu.ops import quantized_drow as qd

    phi = get_laser_phi(num_pts=num_pts)
    phi_j = jnp.asarray(phi, dtype=jnp.float32)
    is_flow = isinstance(model, FlowDrow)
    det_vars = (
        {"params": variables["params"]["dr_spaam"],
         "batch_stats": variables["batch_stats"]["dr_spaam"]}
        if is_flow else variables
    )
    w_bb = fd.backbone_weights({
        "params": det_vars["params"]["backbone"],
        "batch_stats": det_vars["batch_stats"]["backbone"],
    })
    w_hd = fd.head_weights({
        "params": det_vars["params"]["head"],
        "batch_stats": det_vars["batch_stats"]["head"],
    })

    # ---- calibration: run two f32 reference steps to observe cutouts and a
    # realistic (post-gate) template distribution
    ref_step = make_stream_step(model, cutout_kwargs, num_pts, with_nms=False,
                                donate_template=False)
    calib = jnp.asarray(calib_scans, dtype=jnp.float32)
    _san_max = float(cutout_kwargs.get("padding_val", 29.99))
    if sanitize_inputs:
        # a NaN/Inf beam in the calibration batch would poison every
        # abs-max scale — calibrate on what the runtime will see
        calib = _sanitize_scan(calib, _san_max)
    tmpl, _ = ref_step(variables, None, calib)
    tmpl, _ = ref_step(variables, tmpl, calib)
    cutouts_c = np_.asarray(_encode_single(calib, phi, cutout_kwargs))
    b_c = cutouts_c.shape[0]
    q_bb = qd.build_quantized_backbone(
        w_bb, cutouts_c.reshape(b_c * num_pts, -1)[:4096]
    )
    tmpl_np = np_.asarray(tmpl, dtype=np_.float32)
    d = tmpl_np.shape[-1]
    q_hd, heads = qd.build_quantized_head_convs(
        w_hd, tmpl_np.reshape(-1, d // 256, 256)[:4096]
    )

    gate_vars = cast_variables(variables, gate_dtype)

    def gate_apply(feats, template):
        if is_flow:
            fn = lambda m, a, b: m.dr_spaam.gate(a, b, train=False)
        else:
            fn = lambda m, a, b: m.gate(a, b, train=False)
        return model.apply(gate_vars, feats, template, method=fn)

    def flow_apply(sim, cur_scan):
        return model.apply(
            gate_vars, sim, cur_scan,
            method=lambda m, s, c: m._flow_head(s, c, train=False),
        )

    def step(template, scan):
        if sanitize_inputs:
            # hostile-input guard — same policy as make_serve_step_v3
            scan = _sanitize_scan(scan, _san_max)
        b = scan.shape[0]
        cutouts = _encode_single(scan, phi, cutout_kwargs)  # (B, P, C) f32
        xq = q_bb.quantize_input(
            cutouts.reshape(b * num_pts, -1)[..., None]
        )
        feats = q_bb(xq)  # (B*P, L4, 256) f32
        l4 = feats.shape[-2]
        feats = feats.reshape(b, num_pts, l4 * 256).astype(gate_dtype)
        if template is None:
            new_template = feats
            _, sim = gate_apply(feats, feats)
        else:
            new_template, sim = gate_apply(feats, template)
        tq = q_hd.quantize_input(
            new_template.astype(jnp.float32).reshape(b * num_pts, l4, 256)
        )
        cls, reg = qd.quantized_head_apply(q_hd, heads, tq)
        pred_cls = cls.reshape(b, num_pts, -1)
        pred_reg = reg.reshape(b, num_pts, 2)
        flow = None
        if is_flow:
            flow = flow_apply(sim, scan.astype(gate_dtype)).astype(jnp.float32)
        out = _detection_epilogue(scan, pred_cls, pred_reg, flow, phi_j,
                                  with_nms=with_nms,
                                  nms_min_dist=nms_min_dist)
        return new_template, out

    step_boot = jax.jit(lambda s: step(None, s))
    step_carry = jax.jit(step, donate_argnums=(0,))

    def dispatch(template, scan):
        if template is None:
            return step_boot(scan)
        return step_carry(template, scan)

    return dispatch


def make_serve_step(model, variables, cutout_kwargs, num_pts: int = 450,
                    nms_min_dist: float = 0.5, with_nms: bool = True,
                    nms_top_k: int | None = None,
                    compute_dtype=jnp.bfloat16, gate_mix: str = "pallas",
                    sanitize_inputs: bool = True,
                    interpret: bool = False):
    """Production serving step: the fastest measured composition of the
    per-scan pipeline (see BASELINE.md ablations).

    vs :func:`make_stream_step`: the spatial-attention gate runs in banded
    form (``infer/fast_gate.py``) carrying the template's pre-activation
    embedding — one 186 GFLOP dense mix and one full template re-read less
    per step. The carry is a dict ``{"template", "z"}``.

    ``gate_mix``: "pallas" (the fully fused ``fast_gate.gate_fused``
    kernel — banded attention + dense-band MXU mix + z carry in one
    program) or "xla" (band attention + shifted-FMA mix, same numerics).

    Returns ``step(carry, scan) -> (carry', outputs)`` with the (eval-mode)
    weights closed over; pass ``carry=None`` to bootstrap a stream.
    """
    from planar_optical_flow_tpu.infer import fast_gate as fg

    phi = get_laser_phi(num_pts=num_pts)
    phi_j = jnp.asarray(phi, dtype=jnp.float32)
    is_flow = isinstance(model, FlowDrow)
    det_vars = (
        {"params": variables["params"]["dr_spaam"],
         "batch_stats": variables["batch_stats"]["dr_spaam"]}
        if is_flow else variables
    )
    gate_params = fg.fold_gate_params(
        {"params": det_vars["params"]["gate"],
         "batch_stats": det_vars["batch_stats"]["gate"]},
        alpha=model.alpha, window_size=model.window_size,
        dtype=compute_dtype,
    )
    cdt = compute_dtype or jnp.float32
    cast_vars = cast_variables(variables, cdt) if compute_dtype else variables

    def backbone_apply(cutouts):
        """(B, P, C) -> (B, P, L4*256) flat features."""
        b, p, c = cutouts.shape
        if is_flow:
            fn = lambda m, a: m.dr_spaam.backbone(a, False)
        else:
            fn = lambda m, a: m.backbone(a, False)
        f = model.apply(cast_vars, cutouts.reshape(b * p, c, 1), method=fn)
        return f.reshape(b, p, f.shape[-2] * f.shape[-1])

    def head_apply(flat):
        b, p, d = flat.shape
        if is_flow:
            fn = lambda m, a: m.dr_spaam.head(a, False)
        else:
            fn = lambda m, a: m.head(a, False)
        cls, reg = model.apply(cast_vars, flat.reshape(b * p, d // 256, 256),
                               method=fn)
        return cls.reshape(b, p, -1), reg.reshape(b, p, 2)

    def flow_apply(sim, cur_scan):
        return model.apply(
            cast_vars, sim, cur_scan,
            method=lambda m, s, c: m._flow_head(s, c, train=False),
        )

    use_pallas = gate_mix == "pallas"
    _san_max = float(cutout_kwargs.get("padding_val", 29.99))

    def step(carry, scan):
        if sanitize_inputs:
            # hostile-input guard — same policy as make_serve_step_v3
            scan = _sanitize_scan(scan, _san_max)
        cutouts = _encode_single(scan, phi, cutout_kwargs)
        if compute_dtype is not None:
            cutouts = cutouts.astype(compute_dtype)
        feats = backbone_apply(cutouts)
        if carry is None:
            template, z, sim_band = fg.gate_bootstrap(gate_params, feats)
        else:
            template, z, sim_band = fg.gate_step(
                gate_params, feats, carry["template"], carry["z"],
                use_pallas=use_pallas, interpret=interpret,
            )
        pred_cls, pred_reg = head_apply(template)
        pred_cls = pred_cls.astype(jnp.float32)
        pred_reg = pred_reg.astype(jnp.float32)
        flow = None
        if is_flow:
            flow = flow_apply(
                sim_band, scan.astype(cdt) if compute_dtype else scan
            ).astype(jnp.float32)
        out = _detection_epilogue(scan, pred_cls, pred_reg, flow, phi_j,
                                  with_nms=with_nms,
                                  nms_min_dist=nms_min_dist,
                                  nms_top_k=nms_top_k)
        return {"template": template, "z": z}, out

    step_boot = jax.jit(lambda s: step(None, s))
    step_carry = jax.jit(step, donate_argnums=(0,))

    def dispatch(carry, scan):
        if carry is None:
            return step_boot(scan)
        return step_carry(carry, scan)

    return dispatch


def make_serve_step_v3(model, variables, cutout_kwargs, calib_scans=None,
                       num_pts: int = 450, nms_min_dist: float = 0.5,
                       with_nms: bool = True, nms_top_k: int | None = 64,
                       precision: str = "bf16",
                       conv_mode: str = "3mm", int8_conv_mode: str = "cat",
                       layout: str = "p2", pm_tile: int = 160,
                       tile: int = 64, mesh=None, calib=None,
                       gate_per_stream: bool = True,
                       p2_l1_mode: str = "mm",
                       fuse_gate_head: bool = False,
                       calib_percentile: float | None = None,
                       calib_steps: int = 2,
                       output_fields=None,
                       sanitize_inputs: bool = True,
                       interpret: bool = False):
    """Flat-layout fused serving step (fastest path, see BASELINE.md).

    Pipeline, ONE program per scan, every big tensor flat ``(N*, C)`` so no
    padded ``(B, 450, ...)`` relayout is ever materialized:

    raw scans -> cutout -> backbone layer-1 (XLA, fused with the cutout
    producer) -> fused backbone tail (pallas, VMEM-resident) -> embed matmul
    -> fused gate kernel (banded attention + dense-banded MXU mix + z carry
    + sim_band) -> fused head (pallas) -> sigmoid/flow/NMS.

    ``precision``: "bf16"; "int8" for int8 conv stacks (bf16 gate carry);
    or "int8c" for int8 end-to-end — conv stacks AND the template carry are
    int8, the gate mixes with an int8 MXU matmul, and the head consumes the
    int8 template directly (halves the gate's HBM traffic). "int8"/"int8c"
    require either ``calib_scans`` (B0, num_pts) f32 for on-the-spot scale
    calibration, or ``calib`` (an ``infer.calibration.ServeCalibration``,
    e.g. restored from a checkpoint directory). The calibration in effect
    is exposed as ``step.calibration`` for persisting.
    ``output_fields`` restricts the outputs dict to the named keys
    (unknown names raise, listing what this step produces); XLA then
    dead-code-eliminates whatever only fed the dropped fields — e.g.
    the AP evaluator requests ``("det_xys", "det_cls", "det_keep")``
    and pays for neither the instance assignment nor the flow head.
    ``calib_percentile`` clips activation calibration at that
    abs-percentile instead of the exact abs-max (outlier-robust — rare
    spikes otherwise waste int8 resolution on the bulk); ``calib_steps``
    is how many f32 reference steps feed the template-carry calibration
    (the template is an attention-gated running blend, so its range is
    only representative after a few steps). Both only matter when scales
    are computed here (``calib_scans``); a restored ``calib`` carries its
    scales verbatim.

    ``sanitize_inputs`` (default on): non-finite ranges (NaN/Inf from a
    faulty sensor) are mapped to the cutout padding value and every
    range is clipped to ``[0, padding_val]`` before entering the int8
    pipeline — garbage in, bounded garbage out. One VPU ``where``+
    ``clip`` fused into the cutout producer (measured ~free; see
    docs/SERVING.md). The reference got this implicitly from its numpy
    preprocessing (``src/utils/utils.py:259-334`` clipping).

    Returns ``step(carry, scan) -> (carry', outputs)``; carry is
    ``{"template": (N, D) bf16, "z": (N, 128)}``.
    """
    from planar_optical_flow_tpu.infer import fast_gate as fg
    from planar_optical_flow_tpu.ops.pallas import conv_stack as cs
    from planar_optical_flow_tpu.ops.pallas.fused_drow import _block_params

    phi = get_laser_phi(num_pts=num_pts)
    phi_j = jnp.asarray(phi, dtype=jnp.float32)
    _san_max = float(cutout_kwargs.get("padding_val", 29.99))
    is_flow = isinstance(model, FlowDrow)
    det_vars = (
        {"params": variables["params"]["dr_spaam"],
         "batch_stats": variables["batch_stats"]["dr_spaam"]}
        if is_flow else variables
    )
    bb_vars = {"params": det_vars["params"]["backbone"],
               "batch_stats": det_vars["batch_stats"]["backbone"]}
    hd_vars = {"params": det_vars["params"]["head"],
               "batch_stats": det_vars["batch_stats"]["head"]}
    layer1_w, bb_tail_w = cs.backbone_stack_weights(bb_vars)
    hd_conv_w, hd_head_w = cs.head_stack_weights(hd_vars)
    num_classes = det_vars["params"]["head"]["cls"]["kernel"].shape[-1]
    gate_params = fg.fold_gate_params(
        {"params": det_vars["params"]["gate"],
         "batch_stats": det_vars["batch_stats"]["gate"]},
        alpha=model.alpha, window_size=model.window_size,
        dtype=jnp.bfloat16,
    )
    ct_len = cutout_kwargs.get("num_cutout_pts", 48)
    l4 = ct_len // 4
    d_feat = l4 * 256
    # int8c + "pm": the conv stacks and gate run on POSITION-MAJOR rows
    # (row = position * tile + cutout within tiles of ``pm_tile`` cutouts)
    # so the k=3 taps are vreg-aligned slice-concats instead of int8
    # byte-shifts — ~2x faster backbone, ~1.2x head (probe_r2l). Cutouts
    # are padded to a tile multiple (450 -> 480 at pm_tile=160).
    # "p2" (default) = pm with the backbone's first stage lane-packing
    # position pairs (full MXU tiles + full vregs through the 64-ch
    # layers; probe_r3c) — same feats layout downstream. With
    # p2_l1_mode="mm" layer 1 runs as ONE selection-folded f32 matmul
    # (probe_r3g: 12.7 ms vs pm's 15.4 at B=128 with the per-stream
    # gate; crosses the 10k scans/s north star).
    if precision not in ("bf16", "int8", "int8c"):
        raise ValueError(f"unknown precision {precision!r}")
    if layout not in ("flat", "pm", "cell", "p2", "p2c"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout not in ("flat", "p2") and precision != "int8c":
        # the pm-family layouts only exist for the int8c kernels; an
        # explicit pm/cell/p2c with another precision would silently run
        # the cutout-major path and misattribute its numbers. "flat" IS
        # the honest name of the cutout-major path (any precision), and
        # "p2" is the signature default so it must keep working for
        # bf16/int8 (they run the cutout-major kernels).
        raise ValueError(
            f"layout={layout!r} requires precision='int8c' "
            f"(got {precision!r}); bf16/int8 use the cutout-major "
            "kernels (pass layout='flat' or the default, or switch "
            "precision)")
    pm = precision == "int8c" and layout in ("pm", "cell", "p2", "p2c")
    p2 = precision == "int8c" and layout in ("p2", "p2c")
    cell = precision == "int8c" and layout == "cell"
    if fuse_gate_head and not (pm and gate_per_stream and not cell):
        # the fused gate+head program only exists for the per-stream
        # int8c pm-family path; silently ignoring the flag would let an
        # A/B measure two identical arms
        raise ValueError(
            "fuse_gate_head=True requires precision='int8c', a pm-family "
            f"layout (not 'cell') and gate_per_stream=True (got "
            f"precision={precision!r}, layout={layout!r}, "
            f"gate_per_stream={gate_per_stream})")
    if pm:
        if cell:
            # one block per stream: tile == padded cutout count, so the
            # carry path runs the WHOLE cell (backbone+gate+head) as one
            # pallas program (ops/pallas/serve_cell.py)
            pm_tile = -(-num_pts // 32) * 32
        if pm_tile % 32:
            raise ValueError("pm_tile must be a multiple of 32")
        p_pad = -(-num_pts // pm_tile) * pm_tile
        t_blocks = p_pad // pm_tile
        int8_conv_mode = "cat"  # pm kernels are concat-tap only
    else:
        # sublane-aligned cutout count: Pallas blocks need the
        # second-to-last dim divisible by 8, and with p_pad % 8 == 0 every
        # flat (N*L4, 256) <-> (B, p_pad, D) reshape is a free bitcast (no
        # physical padding). The 6 dead rows (450 -> 456) are masked in the
        # gate and sliced off the outputs.
        p_pad = ((num_pts + 7) // 8) * 8

    # the pallas cutout kernel covers the serving config (fixed geometry,
    # stride 1); anything else falls back to the XLA matmul-sampling path
    pallas_cutout = (bool(cutout_kwargs.get("fixed"))
                     and cutout_kwargs.get("stride", 1) == 1)
    # "p2c": cutout + backbone in ONE kernel (falls back to the separate
    # cutout kernel + p2 backbone when the config isn't pallas-coverable)
    p2cut = p2 and layout == "p2c" and pallas_cutout

    def encode(scan, b):
        if pallas_cutout:
            from planar_optical_flow_tpu.ops.pallas.cutout_kernel import (
                cutout_fused,
            )

            scan_p = jnp.pad(scan, ((0, 0), (0, p_pad - num_pts)))
            return cutout_fused(
                scan_p, num_cutout_pts=ct_len,
                window_width=cutout_kwargs.get("window_width", 1.66),
                window_depth=cutout_kwargs.get("window_depth", 1.0),
                padding_val=cutout_kwargs.get("padding_val", 29.99),
                centered=cutout_kwargs.get("centered", True),
                area_mode=cutout_kwargs.get("area_mode", False),
                p_valid=num_pts, interpret=interpret,
            )  # (B * p_pad, C) f32
        cutouts = _encode_single(scan, phi, cutout_kwargs)  # (B, P, C)
        if p_pad != num_pts:
            cutouts = jnp.pad(
                cutouts, ((0, 0), (0, p_pad - num_pts), (0, 0))
            )
        return cutouts.reshape(b * p_pad, ct_len)

    use_int8 = precision in ("int8", "int8c")
    int8_carry = precision == "int8c"
    if use_int8:
        from planar_optical_flow_tpu.infer.calibration import (
            ServeCalibration,
        )

        if not pm and int8_conv_mode == "cat":
            # the cutout-major cat kernels realize taps via int8 byte
            # shifts whose sublane packing is platform-validated on v5e
            # only; known-answer self-check before first use (ADVICE r2)
            cs.check_byte_shift(interpret=interpret)

        bb_blocks = (_block_params(bb_vars, "block1", 3)
                     + _block_params(bb_vars, "block2", 3))
        hd_blocks = (_block_params(hd_vars, "block3", 3)
                     + _block_params(hd_vars, "block4", 2))
        # weights fingerprint (one small jitted scalar): ties a calibration
        # artifact to the weights it was computed from — a stale
        # calibration.json next to a retrained checkpoint would otherwise
        # silently quantize new weights with old scales. Computed only
        # when stored or validated (it costs one small remote compile).
        def _weights_checksum():
            return float(jax.jit(lambda t: sum(
                jnp.sum(jnp.square(leaf.astype(jnp.float32)))
                for leaf in jax.tree_util.tree_leaves(t)
            ))(det_vars["params"]))

        if calib is not None:
            if (calib.num_pts != num_pts
                    or calib.num_cutout_pts != ct_len):
                raise ValueError(
                    f"calibration geometry (num_pts={calib.num_pts}, "
                    f"num_cutout_pts={calib.num_cutout_pts}) does not "
                    f"match the serving config (num_pts={num_pts}, "
                    f"num_cutout_pts={ct_len}) — recalibrate for this "
                    "configuration")
            if calib.weights_checksum is not None:
                wsum = _weights_checksum()
                if not (abs(calib.weights_checksum - wsum)
                        <= 1e-3 * max(abs(wsum), 1.0)):
                    raise ValueError(
                        "calibration was computed for different weights "
                        f"(checksum {calib.weights_checksum:.6g} vs "
                        f"{wsum:.6g}) — the checkpoint was likely "
                        "retrained; recalibrate and re-save "
                        "calibration.json")
        if calib is None:
            if calib_scans is None:
                raise ValueError(
                    "int8 precision requires calib_scans or calib")
            calib_j = jnp.asarray(calib_scans, jnp.float32)
            if sanitize_inputs:
                # the LAZY self-calibrating runner feeds the first live
                # batch here — one NaN beam would make every abs-max
                # scale (and thus every later output) NaN, defeating the
                # in-step guard. Calibrate on what the runtime will
                # actually see: the sanitized scans.
                calib_j = _sanitize_scan(calib_j, _san_max)
            # calibrate on the SAME encode path the runtime uses
            cut_c = encode(calib_j, calib_j.shape[0])  # (B0 * p_pad, C)
            n0 = cut_c.shape[0]
            act1_c = np.asarray(cs.backbone_layer1(
                cut_c, layer1_w, compute_dtype=jnp.float32,
            ))
            bb_in_scale, bb_act_scales = cs.stack_act_scales(
                bb_blocks[1:], act1_c.reshape(n0, ct_len, 64)[:4096],
                pool_after={1, 4}, percentile=calib_percentile,
            )
            # head calibration on a realistic (post-gate) template: run
            # ``calib_steps`` f32 reference steps and calibrate on the
            # last two templates (the carry is a running blend whose
            # range settles over a few steps)
            ref_step = make_stream_step(model, cutout_kwargs, num_pts,
                                        with_nms=False,
                                        donate_template=False)
            tmpl, tmpls = None, []
            for _ in range(max(int(calib_steps), 1)):
                tmpl, _ = ref_step(variables, None if tmpl is None
                                   else tmpl, calib_j)
                tmpls.append(tmpl)
            # newest template first: the [:4096] row cap below must keep
            # the SETTLED carry range, topping up with the previous step
            tmpl_np = np.concatenate([
                np.asarray(t, np.float32).reshape(-1, l4, 256)
                for t in reversed(tmpls[-2:])
            ])
            hd_in_scale, hd_act_scales = cs.stack_act_scales(
                hd_blocks, tmpl_np[:4096], pool_after={2},
                percentile=calib_percentile,
            )
            calib = ServeCalibration(
                bb_in_scale=float(bb_in_scale),
                bb_act_scales=[float(s) for s in bb_act_scales],
                hd_in_scale=float(hd_in_scale),
                hd_act_scales=[float(s) for s in hd_act_scales],
                num_pts=num_pts, num_cutout_pts=ct_len,
                weights_checksum=_weights_checksum(),
            )
        # with an int8 carry the backbone's LAST layer also requants (its
        # epilogue scale is then in feats-scale units, not true f32)
        bb_q, bb_in_scale, feat_scale = cs.quantize_stack_int8(
            bb_blocks[1:], None, ct_len, pool_after={1, 4},
            in_scale=calib.bb_in_scale, act_scales=calib.bb_act_scales,
            dequant_last=not (precision == "int8c"),
            concat_taps=int8_conv_mode == "cat",
        )
        hd_q, hd_in_scale, _ = cs.quantize_stack_int8(
            hd_blocks, None, l4, pool_after={2},
            in_scale=calib.hd_in_scale, act_scales=calib.hd_act_scales,
            concat_taps=int8_conv_mode == "cat",
        )
        if int8_carry:
            feat_scale = float(feat_scale)
            tmpl_scale = float(hd_in_scale)

    gate_vars = cast_variables(variables, jnp.bfloat16)

    def flow_apply(sim, cur_scan):
        return model.apply(
            gate_vars, sim, cur_scan,
            method=lambda m, s, c: m._flow_head(s, c, train=False),
        )

    embed_w = (gate_params.w, gate_params.b)

    def backbone(scan):
        """-> (feats (N, D) bf16, zx (N, 128)) — the gate embed is fused
        into the backbone kernel's epilogue. N = B * p_pad."""
        b = scan.shape[0]
        if use_int8 and p2cut:
            # cutout + layer-1 + conv tail + gate embed: ONE program; the
            # (N, l) cutout tensor never exists in HBM
            scan_p = jnp.pad(scan, ((0, 0), (0, p_pad - num_pts)))
            return cs.fused_backbone_int8_p2cut(
                scan_p, cs.pack2_backbone_weights(bb_q),
                (layer1_w[0][:, 0, :], layer1_w[1].reshape(1, -1)),
                l=ct_len, tile=pm_tile, out_dtype=jnp.int8,
                embed_weights=(embed_w[0] * feat_scale, embed_w[1]),
                in_scale=float(bb_in_scale), num_pts=num_pts,
                window_width=cutout_kwargs.get("window_width", 1.66),
                window_depth=cutout_kwargs.get("window_depth", 1.0),
                padding_val=cutout_kwargs.get("padding_val", 29.99),
                centered=cutout_kwargs.get("centered", True),
                area_mode=cutout_kwargs.get("area_mode", False),
                interpret=interpret,
            )
        flat = encode(scan, b)
        if use_int8:
            if p2:
                # pack2 runs TRACED (inside the jitted step): eager weight
                # reshuffles would each remote-compile a tiny program
                return cs.fused_backbone_int8_p2(
                    flat, cs.pack2_backbone_weights(bb_q),
                    (layer1_w[0][:, 0, :], layer1_w[1].reshape(1, -1)),
                    l=ct_len, tile=pm_tile, out_dtype=jnp.int8,
                    l1_mode=p2_l1_mode,
                    embed_weights=(embed_w[0] * feat_scale, embed_w[1]),
                    in_scale=float(bb_in_scale),
                    interpret=interpret,
                )  # same pm feats layout, packed first stage
            if pm:
                # layer 1 runs INSIDE the pm kernel on raw cutout rows —
                # the (N*L, 64) act1 tensor and its pm transpose never
                # exist in HBM (XLA's layer-1 loop fusion was 5.1 ms of
                # the 20 ms step at B=128)
                return cs.fused_backbone_int8_pm(
                    flat, bb_q, l=ct_len, tile=pm_tile,
                    out_dtype=jnp.int8,
                    embed_weights=(embed_w[0] * feat_scale, embed_w[1]),
                    layer1_weights=(layer1_w[0][:, 0, :],
                                    layer1_w[1].reshape(1, -1)),
                    in_scale=float(bb_in_scale),
                    interpret=interpret,
                )  # feats (B*T*l4*tile, 256) int8 pm rows, zx (N, 128)
            # layer 1 emits int8 directly (requant folded into the same
            # producer — no separate quantize pass, 1/4 the HBM write)
            act1_q = cs.backbone_layer1(flat, layer1_w,
                                        out_scale=bb_in_scale)
            if int8_carry:
                # int8 feats; the embed weight absorbs the feats scale
                feats, zx = cs.fused_backbone_int8(
                    act1_q, bb_q, l=ct_len, tile=tile, out_dtype=jnp.int8,
                    embed_weights=(embed_w[0] * feat_scale, embed_w[1]),
                    conv_mode=int8_conv_mode, interpret=interpret,
                )
            else:
                feats, zx = cs.fused_backbone_int8(
                    act1_q, bb_q, l=ct_len, tile=tile,
                    out_dtype=jnp.bfloat16, conv_mode=int8_conv_mode,
                    embed_weights=embed_w, interpret=interpret,
                )  # (N*L4, 256) bf16
        else:
            act1 = cs.backbone_layer1(flat, layer1_w)  # (N*L, 64) bf16
            feats, zx = cs.fused_backbone_v2(
                act1, bb_tail_w, l=ct_len, tile=tile,
                compute_dtype=jnp.bfloat16, conv_mode=conv_mode,
                embed_weights=embed_w, interpret=interpret,
            )
            feats = feats.reshape(b * p_pad * l4, 256)
        # flat row-major merge: (N*L4, 256) -> (N, L4*256): free bitcast
        # because p_pad is sublane-aligned
        return feats.reshape(b * p_pad, d_feat), zx

    def head(template_flat):
        flat = template_flat.reshape(-1, 256)  # (N*L4, 256) row-major
        if pm:
            # pm template rows; cls/reg come back in (stream, cutout) order
            return cs.fused_head_int8_pm(
                flat, hd_q, hd_head_w, num_classes=num_classes, l4=l4,
                tile=pm_tile, interpret=interpret,
            )
        if int8_carry:
            # template already int8 at the head's input scale
            return cs.fused_head_int8(
                flat, hd_q, hd_head_w, num_classes=num_classes, l4=l4,
                tile=tile, conv_mode=int8_conv_mode, interpret=interpret,
            )
        if use_int8:
            tq = cs.quantize_int8(flat.astype(jnp.float32), hd_in_scale)
            return cs.fused_head_int8(
                tq, hd_q, hd_head_w, num_classes=num_classes, l4=l4,
                conv_mode=int8_conv_mode,
                tile=tile, interpret=interpret,
            )
        return cs.fused_head_v2(
            flat.astype(jnp.bfloat16), hd_conv_w, hd_head_w,
            num_classes=num_classes, l4=l4, tile=tile, conv_mode=conv_mode,
            interpret=interpret,
        )

    def step(carry, scan):
        if sanitize_inputs:
            # inside the jitted step, so shard_map / lax.scan replay /
            # AOT artifacts all inherit the guard
            scan = _sanitize_scan(scan, _san_max)
        b = scan.shape[0]
        if cell and carry is not None:
            # whole cell (backbone + gate + head) in ONE pallas program;
            # bootstrap (carry None) falls through to the pm kernels below
            # at the same tile == p_pad layout
            from planar_optical_flow_tpu.ops.pallas.serve_cell import (
                serve_cell_int8,
            )

            flat = encode(scan, b)
            template, z, sim, cls, reg = serve_cell_int8(
                flat, carry["z"], carry["template"],
                (layer1_w[0][:, 0, :], layer1_w[1].reshape(1, -1)),
                bb_q, (embed_w[0] * feat_scale, embed_w[1]), hd_q,
                hd_head_w, l=ct_len, ct=p_pad, alpha=gate_params.alpha,
                window_size=gate_params.window_size,
                in_scale=float(bb_in_scale), s_x=feat_scale,
                s_t=tmpl_scale, s_out=tmpl_scale, ct_valid=num_pts,
                num_classes=num_classes, interpret=interpret,
            )
            return _finish(carry, scan, b, template, z, sim, cls, reg)
        feats, zx = backbone(scan)                   # (N, D), (N, 128)
        if pm:
            gate_kw = dict(
                ct=p_pad, tile=pm_tile, l4=l4, ct_valid=num_pts,
                alpha=gate_params.alpha,
                window_size=gate_params.window_size, s_x=feat_scale,
                s_out=tmpl_scale, per_stream=gate_per_stream,
                interpret=interpret,
            )
            if carry is None:
                template = jnp.clip(
                    jnp.rint(feats.astype(jnp.float32)
                             * (feat_scale / tmpl_scale)),
                    -127, 127).astype(jnp.int8)
                z = zx
                _, _, sim = fg.gate_fused_int8_pm(
                    zx, zx, feats, feats, s_t=feat_scale, **gate_kw)
            elif fuse_gate_head and gate_per_stream:
                # gate + head in ONE program: the head reads the fresh
                # template out of VMEM instead of HBM (bootstrap above
                # keeps the two-program path — its template is NOT the
                # gate's mix output)
                template, z, sim, cls, reg = fg.gate_head_fused_int8_pm(
                    zx, carry["z"], feats, carry["template"],
                    hd_q, hd_head_w, ct=p_pad, tile=pm_tile, l4=l4,
                    ct_valid=num_pts, alpha=gate_params.alpha,
                    window_size=gate_params.window_size,
                    s_x=feat_scale, s_t=tmpl_scale, s_out=tmpl_scale,
                    num_classes=num_classes, interpret=interpret,
                )
                return _finish(carry, scan, b, template, z, sim, cls, reg)
            else:
                template, z, sim = fg.gate_fused_int8_pm(
                    zx, carry["z"], feats, carry["template"],
                    s_t=tmpl_scale, **gate_kw)
        elif int8_carry:
            if carry is None:
                # bootstrap: template = feats, rescaled to the carry scale
                template = jnp.clip(
                    jnp.rint(feats.astype(jnp.float32)
                             * (feat_scale / tmpl_scale)),
                    -127, 127).astype(jnp.int8)
                z = zx
                _, _, sim = fg.gate_fused_int8(
                    zx, zx, feats, feats, ct=p_pad, ct_valid=num_pts,
                    alpha=gate_params.alpha,
                    window_size=gate_params.window_size,
                    s_x=feat_scale, s_t=feat_scale, s_out=tmpl_scale,
                    interpret=interpret,
                )
            else:
                template, z, sim = fg.gate_fused_int8(
                    zx, carry["z"], feats, carry["template"], ct=p_pad,
                    ct_valid=num_pts, alpha=gate_params.alpha,
                    window_size=gate_params.window_size,
                    s_x=feat_scale, s_t=tmpl_scale, s_out=tmpl_scale,
                    interpret=interpret,
                )
        elif carry is None:
            template, z = feats, zx
            _, _, sim = fg.gate_fused_flat(
                zx, zx, feats, feats, ct=p_pad, ct_valid=num_pts,
                alpha=gate_params.alpha,
                window_size=gate_params.window_size, interpret=interpret,
            )
        else:
            template, z, sim = fg.gate_fused_flat(
                zx, carry["z"], feats, carry["template"], ct=p_pad,
                ct_valid=num_pts, alpha=gate_params.alpha,
                window_size=gate_params.window_size, interpret=interpret,
            )
        cls, reg = head(template)
        return _finish(carry, scan, b, template, z, sim, cls, reg)

    # output_fields: restrict the caller-facing outputs to these keys —
    # XLA dead-code-eliminates whatever only feeds dropped fields (e.g.
    # the NMS instance assignment when "instance_mask" isn't requested),
    # so an output-lean caller gets a leaner program, not just a smaller
    # dict. None = the full contract.
    _all_fields = serve_output_fields(is_flow, with_nms)
    if output_fields is not None:
        bad = set(output_fields) - set(_all_fields)
        if bad:
            raise ValueError(
                f"unknown output_fields {sorted(bad)}; this step produces "
                f"{list(_all_fields)} (is_flow={is_flow}, "
                f"with_nms={with_nms})")
        output_fields = tuple(output_fields)

    def _finish(carry, scan, b, template, z, sim, cls, reg):
        pred_cls = (cls.reshape(b, p_pad, -1)[:, :num_pts]
                    .astype(jnp.float32))
        pred_reg = (reg.reshape(b, p_pad, 2)[:, :num_pts]
                    .astype(jnp.float32))
        flow = None
        if is_flow:
            sim_b = (sim.reshape(b, p_pad, -1)[:, :num_pts]
                     .astype(jnp.bfloat16))
            flow = flow_apply(sim_b, scan.astype(jnp.bfloat16)).astype(
                jnp.float32)
        out = _detection_epilogue(scan, pred_cls, pred_reg, flow, phi_j,
                                  with_nms=with_nms,
                                  nms_min_dist=nms_min_dist,
                                  nms_top_k=nms_top_k)
        if output_fields is not None:
            out = {k: out[k] for k in output_fields}
        return {"template": template, "z": z}, out

    if mesh is not None:
        # multi-chip serving: streams are independent, so the whole step
        # shard_maps over the mesh's "data" axis with zero collectives —
        # every per-shard pallas kernel runs on its chip's slice. The
        # batch (and the carry rows) must be a multiple of the data-axis
        # size (checked in dispatch).
        from jax.sharding import PartitionSpec as _P

        spec = _P("data")
        step_boot = jax.jit(jax.shard_map(
            lambda s: step(None, s), mesh=mesh, in_specs=spec,
            out_specs=spec, check_vma=False))
        step_carry = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
            check_vma=False), donate_argnums=(0,))
    else:
        step_boot = jax.jit(lambda s: step(None, s))
        step_carry = jax.jit(step, donate_argnums=(0,))

    def dispatch(carry, scan):
        if mesh is not None and scan.shape[0] % mesh.shape["data"]:
            # shard_map splits the batch across the data axis; a
            # non-multiple batch would surface as an opaque shard_map error
            raise ValueError(
                f"batch {scan.shape[0]} must be a multiple of the mesh "
                f"data-axis size {mesh.shape['data']}")
        if carry is None:
            return step_boot(scan)
        return step_carry(carry, scan)

    dispatch.raw_step = step  # un-jitted cell for lax.scan composition
    dispatch.calibration = calib  # persistable int8 scales (None if float)
    return dispatch


def make_serve_sequence_processor(model, variables, cutout_kwargs,
                                  output_fields=("pred_cls", "pred_reg"),
                                  **serve_kwargs):
    """Offline replay on the serve-v3 pipeline: ``lax.scan`` over time
    inside ONE jitted program (vs one dispatch per scan), carry donated
    in-place.

    ``process(scans (T, B, P), carry=None) -> (carry', outputs stacked
    over T)``. ``output_fields`` restricts which step outputs are stacked
    (the stacked outputs dominate the scan body's HBM traffic); ``None``
    stacks everything. ``serve_kwargs`` forward to
    :func:`make_serve_step_v3` (precision, calib_scans, ...).
    """
    import functools as _ft

    dispatch = make_serve_step_v3(model, variables, cutout_kwargs,
                                  **serve_kwargs)
    raw = dispatch.raw_step
    fields = tuple(output_fields) if output_fields is not None else None

    def select(out):
        return out if fields is None else {k: out[k] for k in fields}

    def body(carry, scan):
        carry, out = raw(carry, scan)
        return carry, select(out)

    @jax.jit
    def process_boot(scans):
        carry, first = raw(None, scans[0])
        carry, outs = jax.lax.scan(body, carry, scans[1:])
        outs = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0),
            select(first), outs,
        )
        return carry, outs

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def process_carry(carry, scans):
        return jax.lax.scan(body, carry, scans)

    def process(scans, carry=None):
        if carry is None:
            return process_boot(scans)
        return process_carry(carry, scans)

    process.calibration = dispatch.calibration  # persistable int8 scales
    return process


def make_stream_step(model, cutout_kwargs, num_pts: int = 450,
                     nms_min_dist: float = 0.5, with_nms: bool = True,
                     donate_template: bool = True, compute_dtype=None,
                     sanitize_inputs: bool = True):
    """Build the jitted per-scan step.

    Returns ``step(variables, template, scan) -> (new_template, outputs)``
    where ``scan`` is ``(B, num_pts)`` and outputs is a dict of fixed-shape
    arrays: ``pred_cls`` (sigmoided), ``pred_reg``, ``pred_flow`` (global
    frame; FlowDrow only), and NMS results (``det_xys, det_cls, det_keep,
    instance_mask``) when ``with_nms``.

    The first call of a stream passes ``template=None`` (compiled as a
    separate bootstrap program).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): run the network in reduced
    precision — cutout index math and NMS stay f32; pass ``variables``
    through :func:`cast_variables` with the same dtype.
    """
    phi = get_laser_phi(num_pts=num_pts)
    phi_j = jnp.asarray(phi, dtype=jnp.float32)
    is_flow = isinstance(model, FlowDrow)
    _san_max = float(cutout_kwargs.get("padding_val", 29.99))

    def step(variables, template, scan):
        if sanitize_inputs:
            # hostile-input guard — same policy as make_serve_step_v3
            scan = _sanitize_scan(scan, _san_max)
        cutouts = _encode_single(scan, phi, cutout_kwargs)
        if compute_dtype is not None:
            cutouts = cutouts.astype(compute_dtype)
            scan = scan.astype(compute_dtype)
        if is_flow:
            pred_cls, pred_reg, pred_flow, new_template = model.apply(
                variables, cutouts, scan, template, method="stream_step"
            )
        else:
            pred_cls, pred_reg, new_template, _ = model.apply(
                variables, cutouts, template, method="stream_step"
            )
            pred_flow = None

        if compute_dtype is not None:
            pred_cls = pred_cls.astype(jnp.float32)
            pred_reg = pred_reg.astype(jnp.float32)
            scan = scan.astype(jnp.float32)
            if pred_flow is not None:
                pred_flow = pred_flow.astype(jnp.float32)
        out = _detection_epilogue(scan, pred_cls, pred_reg, pred_flow,
                                  phi_j, with_nms=with_nms,
                                  nms_min_dist=nms_min_dist)
        return new_template, out

    donate = (1,) if donate_template else ()
    step_boot = jax.jit(lambda v, s: step(v, None, s))
    step_carry = jax.jit(step, donate_argnums=donate)

    def dispatch(variables, template, scan):
        if template is None:
            return step_boot(variables, scan)
        return step_carry(variables, template, scan)

    return dispatch


def make_sequence_processor(model, cutout_kwargs, num_pts: int = 450,
                            nms_min_dist: float = 0.5, with_nms: bool = True,
                            compute_dtype=None, output_fields=None):
    """Offline batch processing: run a whole scan sequence through the
    streaming cell inside ONE jitted program (``lax.scan`` over time).

    ``process(variables, scans (T, B, P), template=None) ->
    (final_template, outputs stacked over T)``.

    ``output_fields``: iterable of output keys to stack over time (e.g.
    ``("det_xys", "det_keep")``); ``None`` stacks everything. Restricting
    the fields is the single biggest lever on throughput — the stacked
    outputs dominate the scan body's HBM traffic, and the carry is donated
    in-place by ``lax.scan``.
    """
    inner = make_stream_step(model, cutout_kwargs, num_pts, nms_min_dist,
                             with_nms, donate_template=False,
                             compute_dtype=compute_dtype)
    fields = tuple(output_fields) if output_fields is not None else None

    def select(out):
        if fields is None:
            return out
        return {k: out[k] for k in fields}

    def process(variables, scans, template=None):
        if template is None:
            template, first = inner(variables, None, scans[0])
            first = select(first)
            rest = scans[1:]
        else:
            first = None
            rest = scans

        def body(carry, scan):
            new_carry, out = inner(variables, carry, scan)
            return new_carry, select(out)

        template, outs = jax.lax.scan(body, template, rest)
        if first is not None:
            outs = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                first, outs,
            )
        return template, outs

    return jax.jit(process, static_argnames=())


class StreamingRunner:
    """Convenience wrapper holding variables + per-stream template state.

    ``engine``:
      * "module" (default) — the f32 flax module path, reference-exact
        (used by the parity tests);
      * "v3" — the fused bf16 serve-v3 pallas pipeline (~4x faster per
        scan on TPU, bf16 tolerance; interpret mode auto-enabled off-TPU);
      * "int8c" — the flagship int8 end-to-end pipeline (accuracy-gated
        via the AP tests). Calibration scales come from ``calib`` (a
        ``ServeCalibration`` or a path to one, e.g. a checkpoint dir);
        without one, the runner self-calibrates on the FIRST batch it
        sees (the step is built lazily), and the resulting scales are
        exposed as ``runner.calibration`` for persisting.

    ``calib_scans``: optional (B0, P) f32 scans to calibrate on eagerly
    instead of the first batch.
    """

    def __init__(self, model, variables, cutout_kwargs, num_pts: int = 450,
                 nms_min_dist: float = 0.5, with_nms: bool = True,
                 engine: str = "module", calib=None, calib_scans=None,
                 output_fields=None):
        if engine not in ("module", "v3", "int8c"):
            raise ValueError(f"unknown engine {engine!r}")
        self._engine = engine
        self._variables = variables
        self._template = None
        self._pending_reset = None
        self._step = self._step_v3 = None
        # v3 engines push the restriction into the program (XLA DCEs the
        # unrequested epilogues); the module path filters post-hoc so the
        # caller-facing contract is uniform across engines
        self._output_fields = (tuple(output_fields)
                               if output_fields is not None else None)
        self.calibration = None
        if engine == "module":
            if self._output_fields is not None:
                # same construction-time validation as the v3/int8c
                # engines (the per-step filter in _dispatch stays, but an
                # unknown name must not surface mid-stream)
                is_flow = isinstance(model, FlowDrow)
                known = serve_output_fields(is_flow, with_nms)
                bad = set(self._output_fields) - set(known)
                if bad:
                    raise ValueError(
                        f"unknown output_fields {sorted(bad)}; this step "
                        f"produces {list(known)} (is_flow={is_flow}, "
                        f"with_nms={with_nms})")
            self._step = make_stream_step(
                model, cutout_kwargs, num_pts, nms_min_dist, with_nms,
                donate_template=False,
            )
            return

        import jax

        if isinstance(calib, str):
            from planar_optical_flow_tpu.infer.calibration import (
                ServeCalibration,
            )

            calib = ServeCalibration.load(calib)
        self._build_v3 = lambda **kw: make_serve_step_v3(
            model, variables, cutout_kwargs, num_pts=num_pts,
            nms_min_dist=nms_min_dist, with_nms=with_nms,
            precision="bf16" if engine == "v3" else "int8c",
            output_fields=self._output_fields,
            interpret=jax.default_backend() == "cpu", **kw,
        )
        if engine == "v3":
            self._step_v3 = self._build_v3()
        elif calib is not None or calib_scans is not None:
            self._step_v3 = self._build_v3(calib=calib,
                                           calib_scans=calib_scans)
            self.calibration = self._step_v3.calibration
        # else: lazy — built on the first __call__ (self-calibrating)

    @classmethod
    def from_artifact(cls, path) -> "StreamingRunner":
        """Run an AOT serving artifact (``bin/export_serving.py``): the
        serving host needs neither the model code, the checkpoint, nor a
        calibration — the engine directory is the whole deployment unit.
        Batch size and scan width are baked into the artifact
        (``runner.meta``). ``path``: an engine directory, or an already
        loaded :class:`~planar_optical_flow_tpu.infer.export.ServingEngine`
        (avoids re-deserializing when the caller also uses the engine
        directly, e.g. ``bin/evaluate.py --artifact --ap --serve-flow``)."""
        from planar_optical_flow_tpu.infer.export import (
            ServingEngine, load_serving_engine,
        )

        runner = cls.__new__(cls)
        runner._engine = "artifact"
        runner._variables = None
        runner._template = None
        runner._pending_reset = None
        runner._step = None
        runner._step_v3 = (path if isinstance(path, ServingEngine)
                           else load_serving_engine(path))
        runner.calibration = None
        runner.meta = runner._step_v3.meta
        return runner

    def reset(self, streams=None):
        """Start streams over.

        ``streams=None`` resets the whole batch (the carry is dropped;
        the next call runs the bootstrap program). ``streams=[i, ...]``
        resets only those batch rows: on the next call the bootstrap and
        the carried step both run, and the named rows take the bootstrap
        result (carry AND outputs) while every other stream continues
        undisturbed — how robots join/leave a live serving batch.
        Per-stream resets cost one extra step execution on that call
        only. An empty ``streams`` list is a no-op."""
        if streams is None:
            self._template = None
            self._pending_reset = None
            return
        idx = np.atleast_1d(np.asarray(streams, dtype=np.int64))
        if idx.size == 0:
            return
        if idx.min() < 0:
            raise ValueError(
                f"reset stream indices must be >= 0, got {idx.tolist()}")
        prev = getattr(self, "_pending_reset", None)
        self._pending_reset = (
            idx if prev is None else np.union1d(prev, idx))

    def _dispatch(self, carry, scan):
        if self._step is not None:
            carry, out = self._step(self._variables, carry, scan)
            if self._output_fields is not None:
                # uniform contract across engines (the module step has no
                # in-program restriction — validate + filter here)
                bad = set(self._output_fields) - set(out)
                if bad:
                    raise ValueError(
                        f"unknown output_fields {sorted(bad)}; this step "
                        f"produces {sorted(out)}")
                out = {k: out[k] for k in self._output_fields}
        else:
            carry, out = self._step_v3(carry, scan)
        return carry, out

    def __call__(self, scan: np.ndarray) -> dict:
        """Process one ``(B, P)`` scan batch; returns numpy outputs."""
        scan = jnp.asarray(scan, dtype=jnp.float32)
        if self._step is None and self._step_v3 is None:
            # lazy int8c: calibrate on this batch
            self._step_v3 = self._build_v3(calib_scans=np.asarray(scan))
            self.calibration = self._step_v3.calibration
        pending = getattr(self, "_pending_reset", None)
        if pending is not None and self._template is not None:
            b = scan.shape[0]
            if pending.max() >= b:
                # drop the out-of-range indices so a corrected reset()
                # retry works — union1d must not re-accumulate them
                self._pending_reset = pending[pending < b]
                raise ValueError(
                    f"reset stream indices {pending.tolist()} out of "
                    f"range for batch {b} (invalid indices discarded; "
                    f"in-range ones stay pending)")
            mask = np.zeros(b, dtype=bool)
            mask[pending] = True
            # bootstrap does not touch the carry, so it can run before
            # the carried step donates it
            boot_carry, boot_out = self._dispatch(None, scan)
            self._template, out = self._dispatch(self._template, scan)
            self._template = merge_stream_carries(
                self._template, boot_carry, mask)
            out = _merge_stream_outputs(out, boot_out, mask)
            self._pending_reset = None
            return out
        self._pending_reset = None
        self._template, out = self._dispatch(self._template, scan)
        return out
