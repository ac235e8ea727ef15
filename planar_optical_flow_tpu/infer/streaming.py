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

from dataclasses import dataclass
from typing import Any

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
from planar_optical_flow_tpu.models.spatial_drow import SpatialDrow


@dataclass
class StreamingState:
    """Per-stream carry: the attention template features (or None before the
    first scan)."""

    template: Any = None


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


def make_stream_step(model, cutout_kwargs, num_pts: int = 450,
                     nms_min_dist: float = 0.5, with_nms: bool = True,
                     donate_template: bool = True, compute_dtype=None):
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

    def step(variables, template, scan):
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
        probs = jax.nn.sigmoid(pred_cls)
        out = {"pred_cls": probs, "pred_reg": pred_reg}
        if pred_flow is not None:
            out["pred_flow"] = canonical_to_global_flow(pred_flow, phi_j)
        if with_nms:
            conf = probs if probs.shape[-1] == 1 else probs[..., -1:]
            det_xys, det_cls, keep, inst = jax.vmap(
                lambda s, c, r: nms_predicted_center(
                    s, phi_j, c, r, min_dist=nms_min_dist
                )
            )(scan, conf, pred_reg)
            out.update(det_xys=det_xys, det_cls=det_cls, det_keep=keep,
                       instance_mask=inst)
        return new_template, out

    donate = (1,) if donate_template else ()
    step_boot = jax.jit(lambda v, s: step(v, None, s))
    step_carry = jax.jit(step, donate_argnums=donate)

    def dispatch(variables, template, scan):
        if template is None:
            return step_boot(variables, scan)
        return step_carry(variables, template, scan)

    return dispatch


class StreamingRunner:
    """Convenience wrapper holding variables + per-stream template state."""

    def __init__(self, model, variables, cutout_kwargs, num_pts: int = 450,
                 nms_min_dist: float = 0.5, with_nms: bool = True):
        self._step = make_stream_step(
            model, cutout_kwargs, num_pts, nms_min_dist, with_nms,
            donate_template=False,
        )
        self._variables = variables
        self._template = None

    def reset(self):
        self._template = None

    def __call__(self, scan: np.ndarray) -> dict:
        """Process one ``(B, P)`` scan batch; returns numpy outputs."""
        scan = jnp.asarray(scan, dtype=jnp.float32)
        self._template, out = self._step(self._variables, self._template, scan)
        return out
