"""Serving soak: long-run stability of the flagship int8c step (real TPU).

Production serving runs the same compiled step for hours; this probe
drives the bench.py working point (B=128, int8c p2 — built by
``bench.flagship_step``, the single source of truth for the flagship
configuration) for N windows of W steps each, timing every window via
the template data-dependency chain + one scalar readback, and reports
per-window ms/step. What it guards: timing drift (e.g. allocator
fragmentation, carry-donation regressions that accumulate copies) and
output sanity over a long template recursion (the int8 carry must not
saturate or go non-finite after thousands of autoregressive updates).

Usage: PYTHONPATH=/root/repo python experiments/probe_soak.py
  [STEPS=2000] [WINDOW=200] total steps / timing-window size
  (WINDOW is clamped to STEPS; STEPS is rounded down to whole windows)
  [BATCH=128] stream count (384 = the round-5 headline batch)
"""
import json
import os
import time

import numpy as np

from bench import flagship_step


def main():
    steps = int(os.environ.get("STEPS", "2000"))
    window = min(int(os.environ.get("WINDOW", "200")), steps)
    if window < 1:
        raise SystemExit("STEPS/WINDOW must be >= 1")
    steps = (steps // window) * window  # whole windows only — report truth

    step, scan = flagship_step(batch=int(os.environ.get("BATCH", "128")))

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
