"""Per-stream reset: individual streams joining/restarting inside a live
serving batch (``StreamingRunner.reset(streams=[...])`` /
``infer.merge_stream_carries``).

Semantics under test, per engine:

* reset rows behave exactly like a fresh stream that sees only the
  suffix of scans (bootstrap-oracle comparison),
* non-reset rows are bit-identical to an uninterrupted run (streams are
  independent; a neighbor's reset must not perturb them).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planar_optical_flow_tpu.infer import (
    StreamingRunner,
    merge_stream_carries,
)

B, NUM_PTS, T = 4, 64, 4
RESET_AT, RESET_STREAMS = 2, [2]

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


def _scans(rng):
    return [rng.uniform(0.5, 25.0, (B, NUM_PTS)).astype(np.float32)
            for _ in range(T)]


def _runner(engine, model, variables, calib):
    kw = {}
    if engine == "int8c":
        kw["calib_scans"] = calib
    return StreamingRunner(model, variables, CUTOUT_KW, num_pts=NUM_PTS,
                           engine=engine, **kw)


@pytest.mark.parametrize(
    "engine",
    ["module",
     # the int8c variant re-derives calibration + pallas kernels (~54 s
     # on a 1-CPU box); its carry semantics are identical by the
     # merge_stream_carries contract — slow tier keeps it exercised
     pytest.param("int8c", marks=pytest.mark.slow)])
def test_per_stream_reset(engine, rng):
    model, variables = _small_model()
    scans = _scans(rng)
    calib = scans[0]

    # run A: reset stream 2 before scans[RESET_AT]
    a = _runner(engine, model, variables, calib)
    outs_a = []
    for t, s in enumerate(scans):
        if t == RESET_AT:
            a.reset(streams=RESET_STREAMS)
        outs_a.append(a(s))

    # run B (continuation oracle, no reset): non-reset rows bit-identical
    b = _runner(engine, model, variables, calib)
    outs_b = [b(s) for s in scans]
    keep = np.setdiff1d(np.arange(B), RESET_STREAMS)
    for t in range(T):
        for key in outs_a[t]:
            np.testing.assert_array_equal(
                np.asarray(outs_a[t][key])[keep],
                np.asarray(outs_b[t][key])[keep],
                err_msg=f"t={t} key={key}: a neighbor's reset perturbed "
                        "an untouched stream")

    # run C (fresh oracle): a stream that only ever saw the suffix
    c = _runner(engine, model, variables, calib)
    outs_c = [c(s) for s in scans[RESET_AT:]]
    for dt, out_c in enumerate(outs_c):
        t = RESET_AT + dt
        for key in out_c:
            np.testing.assert_array_equal(
                np.asarray(outs_a[t][key])[RESET_STREAMS],
                np.asarray(out_c[key])[RESET_STREAMS],
                err_msg=f"t={t} key={key}: reset stream does not match "
                        "a fresh stream seeing the same suffix")


def test_full_reset_equals_boot(rng):
    model, variables = _small_model()
    scans = _scans(rng)
    r = _runner("module", model, variables, scans[0])
    first = r(scans[0])
    r(scans[1])
    r.reset()
    again = r(scans[0])
    for key in first:
        np.testing.assert_array_equal(np.asarray(first[key]),
                                      np.asarray(again[key]))


def test_merge_validation():
    ok = {"t": jnp.zeros((8, 3))}
    mask = np.array([True, False, False, False])
    merged = merge_stream_carries(ok, {"t": jnp.ones((8, 3))}, mask)
    np.testing.assert_array_equal(np.asarray(merged["t"][:2]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged["t"][2:]), 0.0)
    with pytest.raises(ValueError, match="mismatch"):
        merge_stream_carries(ok, {"t": jnp.ones((4, 3))}, mask)
    with pytest.raises(ValueError, match="multiple"):
        merge_stream_carries({"t": jnp.zeros((6, 3))},
                             {"t": jnp.ones((6, 3))}, mask)


def test_reset_index_out_of_range(rng):
    model, variables = _small_model()
    scans = _scans(rng)
    r = _runner("module", model, variables, scans[0])
    r(scans[0])
    r.reset(streams=[B])
    with pytest.raises(ValueError, match="out of range"):
        r(scans[1])
    # the bad index must not poison the runner: it is discarded on the
    # raise, so a corrected reset + call works (union1d must not
    # re-accumulate the stale index)
    r.reset(streams=[0])
    out = r(scans[1])
    assert "pred_cls" in out


def test_reset_empty_is_noop(rng):
    model, variables = _small_model()
    scans = _scans(rng)
    r = _runner("module", model, variables, scans[0])
    r(scans[0])
    baseline = _runner("module", model, variables, scans[0])
    baseline(scans[0])
    r.reset(streams=[])
    out = r(scans[1])
    ref = baseline(scans[1])
    for key in ref:
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]))


def test_reset_negative_index_raises():
    model, variables = _small_model()
    r = _runner("module", model, variables, None)
    with pytest.raises(ValueError, match=">= 0"):
        r.reset(streams=[-1])
