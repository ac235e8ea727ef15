"""Step-shape regression guard for the flagship serving step.

``bench.py`` only runs on the driver's real chip at round end; a kernel
regression (a pallas stack silently falling back to XLA, the cutout
reverting to the gather path, the int8 carry widening to bf16, extra
outputs re-materializing the NMS tail) would otherwise ship green through
the fast suite. This test pins the *structure* of the traced step — the
jaxpr primitive fingerprint is backend-independent, so it runs on CPU and
guards the TPU program's shape.

If this test fails after an intentional serving-path change, update the
pinned counts here IN THE SAME COMMIT and re-run the real-chip bench
(``python bench.py`` self-gates at vs_baseline 1.0).
"""

from __future__ import annotations

from collections import Counter

import pytest
import numpy as np
import jax
import jax.numpy as jnp


def _primitive_counts(jaxpr, counts=None):
    """Recursive primitive histogram over a jaxpr and its sub-jaxprs
    (jit/scan/cond bodies, pallas kernel jaxprs)."""
    counts = Counter() if counts is None else counts
    for eqn in jaxpr.eqns:
        counts[eqn.primitive.name] += 1
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _primitive_counts(v.jaxpr, counts)
            elif isinstance(v, (list, tuple)):
                for u in v:
                    if hasattr(u, "jaxpr"):
                        _primitive_counts(u.jaxpr, counts)
    return counts


def _flagship_step(num_pts=64, batch=4):
    """The shipping serving configuration (bench.py flags: int8c, p2
    layout, l1_mode="mm", per-stream gate, top-64 NMS) at a reduced
    geometry — the program structure (kernel count, fallbacks, carry
    dtypes, output contract) is size-independent."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, num_pts, 1, 16)),
        jnp.zeros((1, num_pts)), train=False)
    rng = np.random.default_rng(0)
    calib = rng.uniform(0.5, 20.0, (batch, num_pts)).astype(np.float32)
    return make_serve_step_v3(
        model, variables, cutout_kwargs, calib_scans=calib,
        num_pts=num_pts, precision="int8c", tile=16, layout="p2",
        pm_tile=32, interpret=True)


def test_flagship_step_structure_pinned():
    step = _flagship_step()
    batch, num_pts = 4, 64
    scan = jnp.zeros((batch, num_pts))
    carry, out = step(None, scan)

    # int8 end-to-end carry: template int8 (halved gate HBM traffic),
    # z bf16 — a silent widening here is a real-perf regression
    assert carry["template"].dtype == jnp.int8
    assert carry["z"].dtype == jnp.bfloat16

    # the caller-facing output contract
    assert sorted(out) == ["det_cls", "det_keep", "det_xys",
                           "instance_mask", "pred_cls", "pred_flow",
                           "pred_reg"]
    assert out["pred_cls"].dtype == jnp.float32
    assert out["pred_flow"].shape == (batch, num_pts, 2)

    counts = _primitive_counts(
        jax.make_jaxpr(step.raw_step)(carry, scan))

    # Pinned structural invariants of the shipping program. Every count
    # below is load-bearing:
    #   pallas_call 4  = cutout kernel | p2 backbone (+fused gate embed)
    #                    | per-stream gate | head — a stack falling back
    #                    to XLA drops this
    #   conv_general_dilated 4 = the flow head's convs ONLY — the
    #                    backbone/head stacks must never appear here
    #   gather 5       = NMS/epilogue bookkeeping — the cutout reverting
    #                    from the pallas/matmul path to XLA gather
    #                    sampling multiplies this
    #   top_k 1, scan 1, scatter 1 = the top-64 serving NMS (one sort,
    #                    one greedy-suppression scan, one instance
    #                    scatter); a second scan/sort means the epilogue
    #                    re-grew a host-style loop
    structural = {k: counts.get(k, 0)
                  for k in ("pallas_call", "conv_general_dilated",
                            "gather", "top_k", "scan", "scatter")}
    assert structural == {
        "pallas_call": 4,
        "conv_general_dilated": 4,
        "gather": 5,
        "top_k": 1,
        "scan": 1,
        "scatter": 1,
    }, (
        "flagship serving-step structure changed: "
        f"{structural} — if intentional, update the pin in this test "
        "and re-run `python bench.py` on the real chip (it self-gates "
        "at 10k scans/s)")


def test_flagship_bootstrap_structure_pinned():
    """The bootstrap program must carry the same structural invariants
    (its template path differs from the carried step)."""
    step = _flagship_step()
    scan = jnp.zeros((4, 64))
    counts = _primitive_counts(jax.make_jaxpr(
        lambda s: step.raw_step(None, s))(scan))
    assert counts.get("pallas_call", 0) == 4
    assert counts.get("conv_general_dilated", 0) == 4
    assert counts.get("top_k", 0) == 1


@pytest.mark.slow
def test_output_fields_subset_and_validation():
    """output_fields must (a) return exactly the requested keys with
    values identical to the full-contract step, (b) reject unknown
    names with the available list."""
    import pytest

    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    num_pts, batch = 64, 4
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, num_pts, 1, 16)),
        jnp.zeros((1, num_pts)), train=False)
    rng = np.random.default_rng(0)
    calib = rng.uniform(0.5, 20.0, (batch, num_pts)).astype(np.float32)
    common = dict(calib_scans=calib, num_pts=num_pts, precision="int8c",
                  tile=16, layout="p2", pm_tile=32, interpret=True)

    full = make_serve_step_v3(model, variables, cutout_kwargs, **common)
    lean = make_serve_step_v3(
        model, variables, cutout_kwargs,
        output_fields=("det_xys", "det_cls", "det_keep"), **common)

    scan = jnp.asarray(rng.uniform(0.5, 20.0, (batch, num_pts)),
                       jnp.float32)
    cf, of = full(None, scan)
    cl, ol = lean(None, scan)
    assert sorted(ol) == ["det_cls", "det_keep", "det_xys"]
    for k in ol:
        np.testing.assert_array_equal(np.asarray(ol[k]),
                                      np.asarray(of[k]))
    # carried step too (the jitted program the loop actually runs)
    cf, of = full(cf, scan)
    cl, ol = lean(cl, scan)
    for k in ol:
        np.testing.assert_array_equal(np.asarray(ol[k]),
                                      np.asarray(of[k]))

    with pytest.raises(ValueError, match="unknown output_fields"):
        make_serve_step_v3(model, variables, cutout_kwargs,
                           output_fields=("det_xys", "nope"), **common)
