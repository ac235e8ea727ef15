"""Round-5: offline sequence processor at the new headline working point.

The lax.scan replay amortizes per-step dispatch/readback (round-3: 0.95x
step time at B=128 full contract -> 11,130 scans/s). Re-measure at the
round-5 configuration (B=384, serving-consumer output contract) to keep
the offline-throughput row of BASELINE.md current.

Run on the real chip: ``python experiments/probe_seq_proc_r5.py``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax.numpy as jnp

    from planar_optical_flow_tpu.infer.streaming import (
        make_serve_sequence_processor,
    )

    batch = 384
    t_window = 16
    windows = 3
    iters = 50 // t_window + 1  # ~48 steps per timing window

    model, variables = bench.flagship_model()
    rng = np.random.default_rng(0)
    calib = rng.uniform(0.5, 25.0, (8, bench.NUM_PTS)).astype(np.float32)
    proc = make_serve_sequence_processor(
        model, variables, bench.CUTOUT_KWARGS,
        output_fields=bench.SERVING_FIELDS,
        calib_scans=calib, num_pts=bench.NUM_PTS,
        precision="int8c", tile=128, layout="p2",
    )
    scans = jnp.asarray(
        rng.uniform(0.5, 25.0, (t_window, batch, bench.NUM_PTS)),
        jnp.float32)

    carry, outs = proc(scans)            # compile boot + carried window
    carry, outs = proc(scans, carry)
    float(np.asarray(outs["det_cls"]).ravel()[0])

    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, outs = proc(scans, carry)
        float(np.asarray(outs["det_cls"]).ravel()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    steps = iters * t_window
    sps = batch * steps / best
    print(f"sequence processor B={batch}, T={t_window}, serving "
          f"contract: {best / steps * 1000:.2f} ms/step, "
          f"{sps:,.0f} scans/s/chip (best of {windows} windows)")


if __name__ == "__main__":
    main()
