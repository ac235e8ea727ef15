"""Rotated-IoU kernel throughput on the TPU.

The reference's only in-repo performance number is its numba-CUDA rotated
IoU: "~5 ms in one example, 500x faster than the cpu version"
(``/root/reference/src/utils/rotate_iou.py:364-365``), launched once per
detection during eval. Our branch-free Sutherland-Hodgman XLA program
(``ops/rotated_iou.py``) evaluates ALL (N, K) pairs in one launch; this
probe times it at eval-realistic and stress sizes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/bench_rotated_iou.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu import ops


def boxes(rng, n):
    out = np.zeros((n, 5), np.float32)
    out[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    out[:, 2:4] = rng.uniform(0.3, 2.0, (n, 2))
    out[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return out


rng = np.random.default_rng(0)
for n, k in ((128, 8), (1000, 64), (1000, 1000), (4096, 4096)):
    a = jnp.asarray(boxes(rng, n))
    b = jnp.asarray(boxes(rng, k))
    fn = jax.jit(ops.rotated_iou)
    out = fn(a, b)
    float(out[0, 0])  # compile + sync

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a, b)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "pairs": n * k,
        "shape": [n, k],
        "ms_per_call": round(dt * 1000.0, 3),
        "giga_pairs_per_sec": round(n * k / dt / 1e9, 3),
    }), flush=True)
