"""Parity: banded serving gate (infer/fast_gate.py) vs the flax module gate.

The fast gate must reproduce the module's (reference-parity) template
recursion and sim_band exactly in f32 — including the edge-clamped duplicate
band entries — across multiple streaming steps, carrying the pre-activation
embedding instead of re-embedding the template.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models.spatial_drow import SpatialAttentionGate
from planar_optical_flow_tpu.infer import fast_gate as fg


@pytest.fixture(scope="module")
def setup():
    b, ct, d = 2, 48, 64
    window = 11
    gate = SpatialAttentionGate(alpha=0.5, window_size=window)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(b, ct, d)), jnp.float32)
    variables = gate.init(jax.random.PRNGKey(0), x0, x0, train=False)
    # non-trivial BN stats so the fold actually matters
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    stats = variables["batch_stats"]["embed_bn"]
    stats["mean"] = jnp.asarray(rng.normal(size=stats["mean"].shape) * 0.1,
                                jnp.float32)
    stats["var"] = jnp.asarray(
        rng.uniform(0.5, 2.0, size=stats["var"].shape), jnp.float32)
    params = fg.fold_gate_params(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        alpha=0.5, window_size=window,
    )
    return gate, variables, params, (b, ct, d), rng


def _module_steps(gate, variables, xs):
    template = xs[0]
    outs = []
    for x in xs[1:]:
        template, sim = gate.apply(variables, x, template, train=False)
        outs.append((template, sim))
    return outs


def _fast_steps(params, xs, use_pallas, interpret=True):
    template, z, _ = fg.gate_bootstrap(params, xs[0])
    outs = []
    for x in xs[1:]:
        template, z, sim = fg.gate_step(
            params, x, template, z, use_pallas=use_pallas,
            interpret=interpret,
        )
        outs.append((template, sim))
    return outs, z


@pytest.mark.parametrize("use_pallas", [False, True])
def test_gate_parity_multistep(setup, use_pallas):
    gate, variables, params, (b, ct, d), rng = setup
    xs = [jnp.asarray(rng.normal(size=(b, ct, d)), jnp.float32)
          for _ in range(4)]
    ref = _module_steps(gate, variables, xs)
    got, z_final = _fast_steps(params, xs, use_pallas)
    for (t_ref, s_ref), (t_got, s_got) in zip(ref, got):
        np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref),
                                   rtol=2e-4, atol=2e-4)
    # the carried z must equal the (folded) embedding of the carried template
    z_direct = fg.embed(params, got[-1][0])
    np.testing.assert_allclose(np.asarray(z_final), np.asarray(z_direct),
                               rtol=2e-4, atol=2e-4)


def test_gate_bootstrap_matches_module(setup):
    gate, variables, params, (b, ct, d), rng = setup
    x = jnp.asarray(rng.normal(size=(b, ct, d)), jnp.float32)
    _, sim_ref = gate.apply(variables, x, x, train=False)
    template, z, sim = fg.gate_bootstrap(params, x)
    np.testing.assert_allclose(np.asarray(sim), np.asarray(sim_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(template), np.asarray(x))


def test_band_index_map_edges():
    m = fg._band_index_map(10, 5)
    # row 0: offsets clip(0 + [-2..2]) - 0 + 2 -> [2, 2, 2, 3, 4]
    np.testing.assert_array_equal(m[0], [2, 2, 2, 3, 4])
    np.testing.assert_array_equal(m[-1], [0, 1, 2, 2, 2])


@pytest.mark.parametrize("gate_mix", ["xla", "pallas"])
def test_serve_step_matches_stream_step(gate_mix):
    """End-to-end: make_serve_step (banded gate, z-carry) must reproduce
    make_stream_step (module gate) in f32 over several streaming steps."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_stream_step, make_serve_step,
    )

    num_pts = 64
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)

    # NMS keep decisions flip on ~1e-6 prob ties of the untrained net and
    # cascade into det_*; NMS parity has its own oracle tests — compare the
    # continuous pipeline outputs here.
    ref_step = make_stream_step(model, cutout_kwargs, num_pts=num_pts,
                                donate_template=False, with_nms=False)
    fast_step = make_serve_step(model, variables, cutout_kwargs,
                                num_pts=num_pts, compute_dtype=None,
                                with_nms=False, gate_mix=gate_mix,
                                interpret=True)

    rng = np.random.default_rng(1)
    tmpl, carry = None, None
    for i in range(3):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)), jnp.float32)
        tmpl, ref = ref_step(variables, tmpl, scan)
        carry, got = fast_step(carry, scan)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]),
                rtol=2e-4, atol=2e-4, err_msg=f"step {i} key {k}",
            )
        np.testing.assert_allclose(np.asarray(carry["template"]),
                                   np.asarray(tmpl), rtol=2e-4, atol=2e-4)


def test_serve_step_v3_matches_stream_step():
    """Flat fused pipeline (pallas conv kernels + fused gate) vs the module
    path, bf16 compute at loose tolerance over multiple steps.

    num_pts = 60 exercises the sublane padding path (60 -> 64 rows with
    dead-row masking in the gate)."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_stream_step, make_serve_step_v3,
    )

    num_pts = 60
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)

    ref_step = make_stream_step(model, cutout_kwargs, num_pts=num_pts,
                                donate_template=False, with_nms=False)
    v3 = make_serve_step_v3(model, variables, cutout_kwargs,
                            num_pts=num_pts, with_nms=False, tile=16,
                            interpret=True)

    rng = np.random.default_rng(1)
    tmpl, carry = None, None
    for i in range(3):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)), jnp.float32)
        tmpl, ref = ref_step(variables, tmpl, scan)
        carry, got = v3(carry, scan)
        for k in ref:
            a, b_ = np.asarray(got[k], np.float32), np.asarray(ref[k])
            # bf16 conv stacks + quantized-ish pipeline: loose tolerance,
            # strong correlation
            corr = np.corrcoef(a.ravel(), b_.ravel())[0, 1]
            assert corr > 0.99, (i, k, corr)
            assert np.abs(a - b_).max() < 0.15 * max(np.abs(b_).max(), 1.0), (i, k)


def test_serve_step_v3_int8():
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_stream_step, make_serve_step_v3,
    )

    num_pts = 64
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    rng = np.random.default_rng(1)
    calib = rng.uniform(0.5, 20.0, (2, num_pts)).astype(np.float32)

    ref_step = make_stream_step(model, cutout_kwargs, num_pts=num_pts,
                                donate_template=False, with_nms=False)
    v3 = make_serve_step_v3(model, variables, cutout_kwargs,
                            calib_scans=calib, num_pts=num_pts,
                            with_nms=False, precision="int8", tile=16,
                            interpret=True)
    tmpl, carry = None, None
    for i in range(3):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)), jnp.float32)
        tmpl, ref = ref_step(variables, tmpl, scan)
        carry, got = v3(carry, scan)
        for k in ("pred_cls", "pred_flow"):
            a, b_ = np.asarray(got[k], np.float32), np.asarray(ref[k])
            corr = np.corrcoef(a.ravel(), b_.ravel())[0, 1]
            # int8 noise on near-zero untrained logits; the real accuracy
            # gate is the trained-detector AP check (validate_int8_ap)
            assert corr > 0.96, (i, k, corr)


@pytest.mark.parametrize("layout", ["pm", "cell"])
def test_serve_step_v3_int8_carry(layout):
    """int8 end-to-end (int8c): template carried in int8 through the gate;
    outputs stay close to the f32 module path on trained-scale features.
    layout="cell" runs the whole carry step through the fused
    ops/pallas/serve_cell.py program (bit-identical math to "pm")."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_stream_step, make_serve_step_v3,
    )

    num_pts = 64
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    rng = np.random.default_rng(1)
    calib = rng.uniform(0.5, 20.0, (2, num_pts)).astype(np.float32)

    ref_step = make_stream_step(model, cutout_kwargs, num_pts=num_pts,
                                donate_template=False, with_nms=False)
    v3 = make_serve_step_v3(model, variables, cutout_kwargs,
                            calib_scans=calib, num_pts=num_pts,
                            with_nms=False, precision="int8c",
                            layout=layout, tile=16, interpret=True)
    tmpl, carry = None, None
    for i in range(3):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)), jnp.float32)
        tmpl, ref = ref_step(variables, tmpl, scan)
        carry, got = v3(carry, scan)
        assert carry["template"].dtype == jnp.int8
        for k in ("pred_cls", "pred_flow"):
            a, b_ = np.asarray(got[k], np.float32), np.asarray(ref[k])
            corr = np.corrcoef(a.ravel(), b_.ravel())[0, 1]
            assert corr > 0.95, (i, k, corr)


def test_serve_step_v3_config_guards():
    """layout='flat' is valid for every precision (it IS the cutout-major
    path); explicit pm-family layouts require int8c; fuse_gate_head on an
    ineligible config raises instead of silently building the unfused
    step (an A/B would otherwise measure two identical arms)."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    num_pts = 64
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)

    # the honest spelling of the bf16 path builds fine
    make_serve_step_v3(model, variables, cutout_kwargs, num_pts=num_pts,
                       precision="bf16", layout="flat", interpret=True)
    with pytest.raises(ValueError, match="requires precision='int8c'"):
        make_serve_step_v3(model, variables, cutout_kwargs, num_pts=num_pts,
                           precision="bf16", layout="pm", interpret=True)
    with pytest.raises(ValueError, match="fuse_gate_head"):
        make_serve_step_v3(model, variables, cutout_kwargs, num_pts=num_pts,
                           precision="bf16", fuse_gate_head=True,
                           interpret=True)
    with pytest.raises(ValueError, match="fuse_gate_head"):
        make_serve_step_v3(model, variables, cutout_kwargs,
                           calib_scans=np.zeros((2, num_pts), np.float32),
                           num_pts=num_pts, precision="int8c",
                           gate_per_stream=False, fuse_gate_head=True,
                           interpret=True)


@pytest.mark.slow
def test_serve_step_v3_fused_gate_head_matches_unfused():
    """fuse_gate_head=True (gate + head in ONE program, head reads the
    fresh template from VMEM) is bit-identical to the two-program path —
    same mix -> requant -> head-plan math on the same int8 inputs."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    num_pts = 64  # pm_tile=32 -> p_pad=64, t_blocks=2 exercises the
    # per-stream tile-block head loop
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    rng = np.random.default_rng(1)
    calib = rng.uniform(0.5, 20.0, (2, num_pts)).astype(np.float32)

    kw = dict(calib_scans=calib, num_pts=num_pts, with_nms=False,
              precision="int8c", layout="p2", pm_tile=32, interpret=True)
    v3a = make_serve_step_v3(model, variables, cutout_kwargs, **kw)
    v3b = make_serve_step_v3(model, variables, cutout_kwargs,
                             fuse_gate_head=True, **kw)
    carry_a = carry_b = None
    for i in range(3):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)), jnp.float32)
        carry_a, out_a = v3a(carry_a, scan)
        carry_b, out_b = v3b(carry_b, scan)
        np.testing.assert_array_equal(
            np.asarray(carry_a["template"]), np.asarray(carry_b["template"]),
            err_msg=f"step {i} template")
        for k in out_a:
            np.testing.assert_array_equal(
                np.asarray(out_a[k]), np.asarray(out_b[k]),
                err_msg=f"step {i} {k}")


@pytest.mark.parametrize("per_stream", [False, True])
def test_gate_int8_pm_matches_cm(per_stream):
    """Position-major int8 gate is bit-identical to the cutout-major int8
    gate (same math, template rows reordered)."""
    s_streams, ct, l4, zdim = 2, 32, 2, 128
    tile, window = ct, 5
    d = l4 * 256
    rng = np.random.default_rng(3)
    zx = jnp.asarray(rng.normal(size=(s_streams * ct, zdim)), jnp.float32)
    zt = jnp.asarray(rng.normal(size=(s_streams * ct, zdim)), jnp.float32)
    x_q = jnp.asarray(rng.integers(-127, 128, (s_streams * ct, d)), jnp.int8)
    t_q = jnp.asarray(rng.integers(-127, 128, (s_streams * ct, d)), jnp.int8)
    kw = dict(alpha=0.5, window_size=window, s_x=0.11, s_t=0.17, s_out=0.13,
              ct_valid=28, interpret=True)
    t_cm, z_cm, sim_cm = fg.gate_fused_int8(zx, zt, x_q, t_q, ct=ct, **kw)

    def to_pm(a):
        return (a.reshape(s_streams, ct, l4, 256).transpose(0, 2, 1, 3)
                .reshape(-1, 256))

    t_pm, z_pm, sim_pm = fg.gate_fused_int8_pm(
        zx, zt, to_pm(x_q), to_pm(t_q), ct=ct, tile=tile, l4=l4,
        per_stream=per_stream, **kw)
    t_pm_as_cm = (t_pm.reshape(s_streams, l4, ct, 256).transpose(0, 2, 1, 3)
                  .reshape(s_streams * ct, d))
    # the int8 requant may differ by 1 count on rint-boundary values (FMA
    # fusion differences between the two kernels' f32 epilogues); the carry
    # math itself is identical
    diff = np.abs(np.asarray(t_pm_as_cm, np.int32)
                  - np.asarray(t_cm, np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 5e-3, (diff > 0).mean()
    np.testing.assert_allclose(np.asarray(z_pm, np.float32),
                               np.asarray(z_cm, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(sim_pm), np.asarray(sim_cm),
                               rtol=1e-5, atol=1e-5)


def test_serve_sequence_processor_matches_steps():
    """lax.scan replay over serve-v3 == per-step dispatch (same kernels)."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_serve_step_v3, make_serve_sequence_processor,
    )

    num_pts = 64
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=16,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    rng = np.random.default_rng(5)
    kw = dict(num_pts=num_pts, with_nms=False, precision="bf16", tile=16,
              interpret=True)
    scans = jnp.asarray(rng.uniform(0.5, 20.0, (4, 2, num_pts)), jnp.float32)

    step = make_serve_step_v3(model, variables, cutout_kwargs, **kw)
    carry, outs_ref = None, []
    for t in range(scans.shape[0]):
        carry, out = step(carry, scans[t])
        outs_ref.append(out)

    process = make_serve_sequence_processor(
        model, variables, cutout_kwargs,
        output_fields=("pred_cls", "pred_flow"), **kw)
    end_carry, outs = process(scans)
    assert outs["pred_cls"].shape[0] == scans.shape[0]
    for t in range(scans.shape[0]):
        for k in ("pred_cls", "pred_flow"):
            np.testing.assert_allclose(
                np.asarray(outs[k][t], np.float32),
                np.asarray(outs_ref[t][k], np.float32), rtol=2e-2,
                atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(end_carry["template"], np.float32),
        np.asarray(carry["template"], np.float32))


@pytest.mark.slow
@pytest.mark.parametrize("name,ct,win,area,with_bf16", [
    ("dr_spaam", 56, 11, True, True),     # configs/dr_spaam.yaml
    ("obj_det", 48, 7, True, False),      # reference config_obj_det.yaml
    ("ct_bl_spatial", 24, 9, False, False),  # reference CT_bl_spatial.yaml
])
def test_serve_v3_reference_working_points(name, ct, win, area, with_bf16):
    """Serving-path parity sweep at the reference's ACTUAL config working
    points — 450 beams with the cutout/window geometries of
    ``config/dr_spaam.yaml`` (56 pts, window 11, area mode),
    ``config_obj_det.yaml`` (48 pts, window 7) and ``CT_bl_spatial.yaml``
    (24 pts, point mode) — vs the f32 module path. The fast parity tests
    pin small geometries (16-24 pts, window 5, 64 beams); this guards the
    kernel shape edges (tap alignment, band width, tile padding) at the
    sizes real deployments run. Flagship int8c for every point, bf16
    additionally at the headline dr_spaam point."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_stream_step, make_serve_step_v3,
    )

    num_pts = 450
    kw = dict(fixed=True, centered=True, window_width=1.0,
              window_depth=0.5, num_cutout_pts=ct, padding_val=29.99,
              area_mode=area, gather_mode="matmul")
    model = FlowDrow(window_size=win, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, ct))
    variables = model.init(jax.random.PRNGKey(0), x,
                           jnp.zeros((1, num_pts)), train=False)
    rng = np.random.default_rng(3)
    calib = rng.uniform(0.5, 20.0, (2, num_pts)).astype(np.float32)

    ref_step = make_stream_step(model, kw, num_pts=num_pts,
                                donate_template=False, with_nms=False)
    engines = {"int8c": make_serve_step_v3(
        model, variables, kw, calib_scans=calib, num_pts=num_pts,
        with_nms=False, precision="int8c", interpret=True)}
    if with_bf16:
        engines["bf16"] = make_serve_step_v3(
            model, variables, kw, num_pts=num_pts, with_nms=False,
            precision="bf16", interpret=True)

    tmpl, carries = None, {k: None for k in engines}
    for i in range(2):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)),
                           jnp.float32)
        tmpl, ref = ref_step(variables, tmpl, scan)
        for prec, step in engines.items():
            carries[prec], got = step(carries[prec], scan)
            for k in ("pred_cls", "pred_flow"):
                a = np.asarray(got[k], np.float32)
                b = np.asarray(ref[k], np.float32)
                corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
                floor = 0.99 if prec == "bf16" else 0.95
                assert corr > floor, (name, prec, i, k, corr)
            if prec == "bf16":
                a = np.asarray(got["pred_flow"], np.float32)
                b = np.asarray(ref["pred_flow"], np.float32)
                assert np.abs(a - b).max() < 0.15 * max(
                    np.abs(b).max(), 1.0), (name, i)


@pytest.mark.slow
def test_serve_step_v3_multiclass():
    """4-class DROW head (pedestrian_only=False, the reference's
    none/wc/wa/wp head) through the fused v3 pipeline vs the module
    path — the one head-width variant the serving kernels support but
    no other test drives. The epilogue uses the last (wp) channel as
    NMS confidence (streaming.py:_detection_epilogue)."""
    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import (
        make_stream_step, make_serve_step_v3,
    )

    num_pts = 64
    kw = dict(fixed=True, centered=True, window_width=1.0,
              window_depth=0.5, num_cutout_pts=16, padding_val=29.99,
              area_mode=True, gather_mode="matmul")
    model = FlowDrow(window_size=5, pedestrian_only=False)
    x = jnp.zeros((1, num_pts, 1, 16))
    variables = model.init(jax.random.PRNGKey(0), x,
                           jnp.zeros((1, num_pts)), train=False)
    rng = np.random.default_rng(5)
    calib = rng.uniform(0.5, 20.0, (2, num_pts)).astype(np.float32)

    ref_step = make_stream_step(model, kw, num_pts=num_pts,
                                donate_template=False)
    engines = {
        "bf16": make_serve_step_v3(model, variables, kw, num_pts=num_pts,
                                   precision="bf16", tile=16,
                                   interpret=True),
        "int8c": make_serve_step_v3(model, variables, kw, num_pts=num_pts,
                                    calib_scans=calib, precision="int8c",
                                    tile=16, interpret=True),
    }
    tmpl, carries = None, {k: None for k in engines}
    for i in range(2):
        scan = jnp.asarray(rng.uniform(0.5, 20.0, (2, num_pts)),
                           jnp.float32)
        tmpl, ref = ref_step(variables, tmpl, scan)
        assert ref["pred_cls"].shape == (2, num_pts, 4)
        for prec, step in engines.items():
            carries[prec], got = step(carries[prec], scan)
            assert got["pred_cls"].shape == (2, num_pts, 4)
            for k in ("pred_cls", "pred_flow"):
                a = np.asarray(got[k], np.float32)
                b = np.asarray(ref[k], np.float32)
                corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
                floor = 0.99 if prec == "bf16" else 0.95
                assert corr > floor, (prec, i, k, corr)
            # NMS outputs exist; det_cls carries the last (wp) channel's
            # confidence — (K, 1) like the module path, not all 4 logits
            assert got["det_cls"].shape == ref["det_cls"].shape
            assert got["det_cls"].shape[-1] == 1
            assert got["det_keep"].dtype == bool
