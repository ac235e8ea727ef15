"""Hostile-input hardening of the serving steps (round-4 verdict item 6):
NaN/Inf/out-of-range scan values are sanitized (non-finite -> padding,
clip to [0, padding_val]) before they can enter the int8 calibrated
pipeline — garbage in, bounded garbage out, and the template carry stays
finite for the streams that saw garbage. The reference got this
implicitly from its numpy preprocessing (src/utils/utils.py:259-334)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.infer import StreamingRunner
from planar_optical_flow_tpu.infer.streaming import (
    make_serve_step_v3,
    make_stream_step,
)

B, NUM_PTS = 4, 64

CUTOUT_KW = dict(fixed=True, centered=True, window_width=1.0,
                 window_depth=0.5, num_cutout_pts=16, padding_val=29.99,
                 area_mode=True, gather_mode="matmul")


def _small_model(num_pts=NUM_PTS, window=5):
    from planar_optical_flow_tpu.models import FlowDrow

    model = FlowDrow(window_size=window, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 16))
    cur = jnp.zeros((1, num_pts))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    return model, variables


def _garbage(rng):
    scan = rng.uniform(0.5, 25.0, (B, NUM_PTS)).astype(np.float32)
    scan[0, ::5] = np.nan
    scan[1, ::7] = np.inf
    scan[2, ::3] = -np.inf
    scan[3, ::2] = 1e12
    scan[0, 1::6] = -42.0
    return scan


def _tree_finite(tree):
    return all(
        bool(np.isfinite(np.asarray(leaf, dtype=np.float64)).all())
        for leaf in jax.tree_util.tree_leaves(tree)
        if np.issubdtype(np.asarray(leaf).dtype, np.floating)
    )


@pytest.mark.parametrize("engine", ["module", "v3", "int8c"])
def test_garbage_input_yields_finite_outputs(engine, rng):
    model, variables = _small_model()
    clean = rng.uniform(0.5, 25.0, (B, NUM_PTS)).astype(np.float32)
    kw = {"calib_scans": clean} if engine == "int8c" else {}
    runner = StreamingRunner(model, variables, CUTOUT_KW, num_pts=NUM_PTS,
                             engine=engine, **kw)
    runner(clean)                 # bootstrap on clean data
    out = runner(_garbage(rng))   # hostile step
    assert _tree_finite(out), "garbage scan produced non-finite outputs"
    # the carry must have stayed finite too: the NEXT clean step is sane
    out2 = runner(clean)
    assert _tree_finite(out2), "carry was poisoned by the garbage scan"


@pytest.mark.slow
def test_sanitize_identity_on_clean_data(rng):
    """On in-range data the sanitizer is bit-exact identity — the
    measured numbers (BASELINE.md) are unchanged."""
    model, variables = _small_model()
    clean = [rng.uniform(0.5, 25.0, (B, NUM_PTS)).astype(np.float32)
             for _ in range(3)]
    outs = {}
    for san in (True, False):
        step = make_serve_step_v3(
            model, variables, CUTOUT_KW, num_pts=NUM_PTS,
            precision="int8c", calib_scans=clean[0],
            sanitize_inputs=san, interpret=True,
        )
        carry = None
        seq = []
        for s in clean:
            carry, out = step(carry, s)
            seq.append(out)
        outs[san] = seq
    for a, b in zip(outs[True], outs[False]):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


def test_module_step_sanitize_identity(rng):
    model, variables = _small_model()
    clean = rng.uniform(0.5, 25.0, (B, NUM_PTS)).astype(np.float32)
    for san in (True, False):
        step = make_stream_step(model, CUTOUT_KW, num_pts=NUM_PTS,
                                donate_template=False,
                                sanitize_inputs=san)
        _, out = step(variables, None, jnp.asarray(clean))
        if san:
            ref = out
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(out[k]))


def test_lazy_int8c_calibration_survives_garbage_first_batch(rng):
    """The lazily self-calibrating int8c runner feeds its FIRST live
    batch into calibration — a NaN beam there must not poison the
    abs-max scales (round-5 review finding: the in-step guard alone
    left the calibration front door open)."""
    model, variables = _small_model()
    runner = StreamingRunner(model, variables, CUTOUT_KW, num_pts=NUM_PTS,
                             engine="int8c")  # no calib -> lazy
    out = runner(_garbage(rng))  # calibrates AND steps on garbage
    assert _tree_finite(out), "lazy calibration poisoned by garbage"
    assert np.isfinite(runner.calibration.bb_in_scale)
    assert all(np.isfinite(s) for s in runner.calibration.bb_act_scales)
    clean = rng.uniform(0.5, 25.0, (B, NUM_PTS)).astype(np.float32)
    assert _tree_finite(runner(clean))


def test_quantized_step_sanitizes_and_calibrates_on_garbage(rng):
    """The legacy XLA-int8 step builder shares the guard: garbage
    calibration scans and garbage live scans both stay bounded."""
    from planar_optical_flow_tpu.infer.streaming import (
        make_quantized_stream_step,
    )

    model, variables = _small_model()
    bad = _garbage(rng)
    step = make_quantized_stream_step(model, variables, CUTOUT_KW, bad,
                                      num_pts=NUM_PTS)
    tmpl, out = step(None, jnp.asarray(bad))
    assert _tree_finite(out)
    assert bool(np.isfinite(np.asarray(tmpl, np.float32)).all())


def test_serve_step_module_banded_sanitizes(rng):
    """make_serve_step (the banded-gate module serving step used by the
    batched AP evaluator's engine='module' path) shares the guard."""
    from planar_optical_flow_tpu.infer.streaming import make_serve_step

    model, variables = _small_model()
    step = make_serve_step(model, variables, CUTOUT_KW, num_pts=NUM_PTS,
                           interpret=True)
    carry, out = step(None, jnp.asarray(_garbage(rng)))
    assert _tree_finite(out)
    carry, out2 = step(carry, jnp.asarray(
        rng.uniform(0.5, 25.0, (B, NUM_PTS)).astype(np.float32)))
    assert _tree_finite(out2)
