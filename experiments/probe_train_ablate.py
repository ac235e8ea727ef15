"""Where do the 109 ms of the DetectionTask (DR-SPAAM) train step go?

Component-level fwd+bwd ablation at the dr_spaam.yaml working point
(batch 8 x 11 scans x 450 cutouts x 56 pts): backbone alone, gate
(temporal attention recursion) alone, head alone, cutout encode alone —
each as its own jitted value_and_grad, f32 and bf16. Timing via the
data-dependency chain + one scalar readback (axon block_until_ready is
lazy).

Measured (TPU v5e, 2026-08-17): bf16 backbone fwd+bwd 42.8 ms, dense
gate 10-step 9.1 ms (banded_chunk=50: 11.5 — worse, as in serving),
head 3.8 ms, encode 7.8 ms -> component sum ~65 ms vs 109 ms full
step. f32: gate 12.5, head 5.2; the f32 backbone number (28 s) folded
a pathological ~9 min XLA f32-conv compile into the loop (the lazy
block_until_ready warmup bug this file now fixes). Conclusions: the
backbone conv stack dominates; bf16 helps components but something in
the composed step eats ~40 ms — see profile_train_det.py."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead
from planar_optical_flow_tpu.models.spatial_drow import SpatialAttentionGate

B, T, CT, L = 8, 11, 450, 56
D = 14 * 256  # flat backbone feature dim
rng = np.random.default_rng(0)


def bench(name, fn, args, n=20):
    out = fn(*args)
    # scalar readback, not block_until_ready: the axon relay's
    # block_until_ready is lazy, which would fold compile into the loop
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    # chain: re-run n times, read one scalar at the end
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def run(dtype):
    tag = dtype.__name__ if hasattr(dtype, "__name__") else str(dtype)
    print(f"--- {np.dtype(dtype).name} ---", flush=True)

    # backbone fwd+bwd on the full (B*CT*T, L, 1) training workload
    bb = DrowBackbone()
    x_bb = jnp.asarray(rng.normal(size=(B * CT * T, L, 1)), dtype)
    v_bb = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        bb.init(jax.random.PRNGKey(0), x_bb[:64], True),
    )

    def bb_loss(params, stats, x):
        out, mut = bb.apply({"params": params, "batch_stats": stats}, x,
                            True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    g_bb = jax.jit(jax.value_and_grad(bb_loss))
    bench("backbone fwd+bwd (88x450 cutouts)", g_bb,
          (v_bb["params"], v_bb["batch_stats"], x_bb))

    # gate: 10-step unrolled temporal recursion fwd+bwd
    gate = SpatialAttentionGate(alpha=0.5, window_size=11)
    feats = jnp.asarray(rng.normal(size=(B, CT, T, D)) * 0.1, dtype)
    v_g = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        gate.init(jax.random.PRNGKey(0), feats[:, :, 0], feats[:, :, 0],
                  True),
    )

    def gate_loss(params, stats, f):
        tpl = f[:, :, 0]
        sim = None
        for i in range(1, T):
            (tpl, sim), mut = gate.apply(
                {"params": params, "batch_stats": stats}, f[:, :, i], tpl,
                True, mutable=["batch_stats"])
        return jnp.sum(tpl.astype(jnp.float32)) + jnp.sum(
            sim.astype(jnp.float32))

    g_gate = jax.jit(jax.value_and_grad(gate_loss))
    bench("gate 10-step fwd+bwd (dense)", g_gate,
          (v_g["params"], v_g["batch_stats"], feats))

    # banded gate variant
    gate_b = SpatialAttentionGate(alpha=0.5, window_size=11, banded_chunk=50)
    v_gb = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        gate_b.init(jax.random.PRNGKey(0), feats[:, :, 0], feats[:, :, 0],
                    True),
    )

    def gate_b_loss(params, stats, f):
        tpl = f[:, :, 0]
        sim = None
        for i in range(1, T):
            (tpl, sim), mut = gate_b.apply(
                {"params": params, "batch_stats": stats}, f[:, :, i], tpl,
                True, mutable=["batch_stats"])
        return jnp.sum(tpl.astype(jnp.float32)) + jnp.sum(
            sim.astype(jnp.float32))

    g_gate_b = jax.jit(jax.value_and_grad(gate_b_loss))
    bench("gate 10-step fwd+bwd (banded_chunk=50)", g_gate_b,
          (v_gb["params"], v_gb["batch_stats"], feats))

    # head fwd+bwd on (B*CT, 14, 256)
    head = DrowHead(num_classes=1)
    x_h = jnp.asarray(rng.normal(size=(B * CT, 14, 256)), dtype)
    v_h = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        head.init(jax.random.PRNGKey(0), x_h[:64], True),
    )

    def head_loss(params, stats, x):
        (cls, reg), mut = head.apply({"params": params, "batch_stats": stats},
                                     x, True, mutable=["batch_stats"])
        return jnp.sum(cls.astype(jnp.float32)) + jnp.sum(
            reg.astype(jnp.float32))

    g_head = jax.jit(jax.value_and_grad(head_loss))
    bench("head fwd+bwd (3600 cutouts)", g_head,
          (v_h["params"], v_h["batch_stats"], x_h))


run(jnp.float32)
run(jnp.bfloat16)
