"""Serving soak: long-run stability of the flagship int8c step (real TPU).

Production serving runs the same compiled step for hours; this probe
drives the bench.py working point (B=128, int8c p2) for N windows of
W steps each, timing every window via the template data-dependency
chain + one scalar readback, and reports per-window ms/step. What it
guards: timing drift (e.g. allocator fragmentation, carry-donation
regressions that accumulate copies) and output sanity over a long
template recursion (the int8 carry must not saturate or go non-finite
after thousands of autoregressive updates).

Usage: PYTHONPATH=/root/repo python experiments/probe_soak.py
  [STEPS=2000] [WINDOW=200] total steps / timing-window size
"""
import json
import os
import time

import numpy as np


def main():
    import jax.numpy as jnp
    import jax

    from planar_optical_flow_tpu.models import FlowDrow
    from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

    steps = int(os.environ.get("STEPS", "2000"))
    window = int(os.environ.get("WINDOW", "200"))
    batch, num_pts = 128, 450
    cutout_kwargs = dict(fixed=True, centered=True, window_width=1.0,
                         window_depth=0.5, num_cutout_pts=56,
                         padding_val=29.99, area_mode=True,
                         gather_mode="matmul")
    model = FlowDrow(window_size=11, pedestrian_only=True)
    x = jnp.zeros((1, num_pts, 1, 56))
    variables = model.init(jax.random.PRNGKey(0), x,
                           jnp.zeros((1, num_pts)), train=False)
    rng = np.random.default_rng(0)
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, num_pts)),
                       jnp.float32)
    step = make_serve_step_v3(model, variables, cutout_kwargs,
                              calib_scans=np.asarray(scan[:8]),
                              num_pts=num_pts, precision="int8c",
                              tile=128, layout="p2")

    carry, out = step(None, scan)
    for _ in range(3):
        carry, out = step(carry, scan)
    float(out["pred_cls"][0, 0, 0])

    per_window = []
    for w in range(steps // window):
        t0 = time.perf_counter()
        for _ in range(window):
            carry, out = step(carry, scan)
        cls0 = float(out["pred_cls"][0, 0, 0])  # sync + sanity readback
        ms = (time.perf_counter() - t0) / window * 1000.0
        per_window.append(round(ms, 3))
        assert np.isfinite(cls0), (w, cls0)
    flow = np.asarray(out["pred_flow"], np.float32)
    assert np.isfinite(flow).all(), "non-finite flow after soak"

    first, last = per_window[0], per_window[-1]
    med = float(np.median(per_window))
    drift_pct = (last - first) / first * 100.0
    print(json.dumps({
        "steps": steps, "window": window, "ms_per_step_windows": per_window,
        "median_ms": round(med, 3), "drift_first_to_last_pct":
        round(drift_pct, 2),
    }))
    spread = (max(per_window) - min(per_window)) / med * 100.0
    assert spread < 10.0, f"window spread {spread:.1f}% > 10%"
    print(f"SOAK PASSED: {steps} steps, median {med:.2f} ms/step, "
          f"spread {spread:.1f}%")


if __name__ == "__main__":
    main()
