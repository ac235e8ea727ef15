"""A/B the fused gate+head program (fuse_gate_head=True) against the
two-program path at the headline bench configuration (B=128, int8c, p2).

Expected win: the head's read of the fresh (S*T*l4*tile, 256) int8
template from HBM (~220 MB = ~0.27 ms at B=128, plus the launch gap of
one program) disappears — the fused kernel's head plan consumes the
template straight out of VMEM. Parity: bit-identical
(tests/test_fast_gate.py::test_serve_step_v3_fused_gate_head_matches_unfused).

Run: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/probe_gate_head_fuse.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import FlowDrow
from planar_optical_flow_tpu.infer.streaming import make_serve_step_v3

NUM_PTS = 450
CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=56, padding_val=29.99, area_mode=True,
           gather_mode="matmul")


def main():
    batch = int(os.environ.get("B", "128"))
    iters = 50
    model = FlowDrow(window_size=11, pedestrian_only=True)
    x = jnp.zeros((1, NUM_PTS, 1, 56))
    cur = jnp.zeros((1, NUM_PTS))
    variables = model.init(jax.random.PRNGKey(0), x, cur, train=False)
    rng = np.random.default_rng(0)
    scan = jnp.asarray(rng.uniform(0.5, 25.0, (batch, NUM_PTS)), jnp.float32)

    outs = {}
    for tag, fuse in (("two-program", False), ("fused gate+head", True)):
        step = make_serve_step_v3(
            model, variables, CUT, calib_scans=np.asarray(scan[:8]),
            num_pts=NUM_PTS, precision="int8c", tile=128, layout="p2",
            fuse_gate_head=fuse,
        )
        carry, out = step(None, scan)
        for _ in range(3):
            carry, out = step(carry, scan)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, out = step(carry, scan)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        outs[tag] = {k: np.asarray(v) for k, v in out.items()
                     if v is not None}
        print(f"{tag:18s} {ms:6.2f} ms/step  "
              f"{batch / ms * 1e3:8.1f} scans/s")

    a, b = outs["two-program"], outs["fused gate+head"]
    for k in a:
        same = np.array_equal(a[k], b[k])
        print(f"  on-device parity {k}: {'bit-identical' if same else 'DIFF'}")


if __name__ == "__main__":
    main()
