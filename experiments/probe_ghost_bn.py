"""Probe (VERDICT r3 #4): does ghost-batch BN unlock the detector
pretraining floor?

Context: the DetectionTask step (dr-spaam, B=8 x 11 scans x 450 pts,
bf16) sits at ~58 ms — ~45% of the conv MXU bound — and STATUS's
activation-bandwidth analysis points at BatchNorm: global-batch
statistics force a cross-batch reduction between conv layers, so every
layer's activations are materialized in HBM. Ghost BN (statistics over
fixed sub-batches, Hoffer et al. 2017) is a *numerics policy* change
that could license multi-layer fusion.

Two questions, measured separately:

1. XLA-level: does restructuring the BN reductions to per-ghost-group
   (vmap over G groups) change the step time at all? If XLA's schedule
   is limited by the conv HBM round-trips (convs materialize outputs
   regardless of BN), the answer is no and the fusion argument moves
   entirely to hand-written kernels.
2. Kernel-level: a hand-written multi-layer fused train pipeline needs
   BOTH (a) stats computable in-tile (ghost BN provides this) and (b) a
   hand-written backward that beats XLA autodiff.
   ``probe_pallas_convblock.py`` already measured (b) on this exact
   backbone: the hand fwd+bwd conv+BN pipeline lost 16.8 ms vs XLA's
   6.3 ms — ghost BN does not change the backward's structure (the
   bwd still needs the activations or a recompute; the stats reduction
   was never the bwd's cost). So (2) is decided by the existing
   negative unless (1) shows XLA leaving big time on the table.

Convergence side (required pairing): ghost-vs-global BN training parity
is pinned in ``tests/test_pipeline_parallel.py::
test_ghost_bn_training_converges_like_global_bn``.

MEASURED (TPU v5e, 1 chip, 2026-08-20):

    bf16 global BN        56.98 ms/step (140 samples/s)
    bf16 ghost BN G=2     73.83 ms/step (108 samples/s)
    bf16 ghost BN G=8     71.40 ms/step (112 samples/s)

Verdict: NEGATIVE on both fronts. (1) XLA gets ~25% SLOWER with
per-group stats — the vmapped groups shrink every conv's effective
batch (worse MXU tiling) and the stats restructuring buys no fusion,
because convs materialize their outputs regardless of where BN reduces.
(2) The kernel route stays closed: ghost BN makes in-tile stats
computable, but the binding cost of a hand-written fused train pipeline
was always the BACKWARD (probe_pallas_convblock: hand fwd+bwd 16.8 ms
vs XLA's 6.3 ms on this backbone), which ghost BN does not change. The
~58 ms bf16 detector-pretrain step therefore stands as the measured
stopping point; ghost BN remains in the tree only where it is a
*scheduling necessity* (pipeline-parallel training, where it is the
stated BN policy), not as a perf lever.

Run on the real chip: ``python experiments/probe_ghost_bn.py``.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import (create_train_state,
                                           make_optimizer, tasks)
from planar_optical_flow_tpu.ops import detection_loss

B, T, P, L = 8, 11, 450, 56
rng = np.random.default_rng(0)

CUT = dict(fixed=True, centered=True, window_width=1.0, window_depth=0.5,
           num_cutout_pts=L, padding_val=29.99, area_mode=True,
           gather_mode="matmul")
model = get_model({"type": "dr-spaam", "window_size": 11,
                   "pedestrian_only": True, "num_scans": T})
task = tasks.DetectionTask(cutout_kwargs=CUT, pedestrian_only=True)
batch = {
    "scans": jnp.asarray(rng.uniform(0.5, 25.0, (B, T, P)), jnp.float32),
    "target_cls": jnp.asarray(rng.integers(0, 2, (B, P, 1)), jnp.float32),
    "target_reg": jnp.asarray(rng.normal(size=(B, P, 2)) * 0.1,
                              jnp.float32),
}
tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=100)
x0 = jnp.zeros((1, P, T, L))


def fresh_state():
    # per-variant: the jitted step donates its state argument
    return create_train_state(model, (x0,), tx,
                              init_kwargs={"train": False})


def cast(tree, dt):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def make_step(ghost: int, dtype):
    """Train step with BN stats over ghost groups of size B // ghost
    (ghost=1 == the shipping global-batch step)."""

    def train_step(state, batch, key):
        def loss_fn(params):
            p = cast(params, dtype)
            stats = cast(state.batch_stats, dtype)
            enc = task._encode(batch["scans"]).astype(dtype)  # (B,P,S,L)

            def fwd(xg):
                out, upd = model.apply(
                    {"params": p, "batch_stats": stats}, xg, True,
                    mutable=["batch_stats"])
                return out[0], out[1], upd["batch_stats"]

            if ghost == 1:
                cls, reg, new_stats = fwd(enc)
            else:
                g = enc.reshape((ghost, B // ghost) + enc.shape[1:])
                cls, reg, new_stats = jax.vmap(fwd)(g)
                cls = cls.reshape((B,) + cls.shape[2:])
                reg = reg.reshape((B,) + reg.shape[2:])
                # running stats: mean of the per-group EMA results
                new_stats = jax.tree_util.tree_map(
                    lambda a: jnp.mean(a, axis=0), new_stats)
            c, r, _ = detection_loss(
                cls, reg, batch["target_cls"], batch["target_reg"],
                pedestrian_only=True)
            loss = (c + r).astype(jnp.float32)
            return loss, cast(new_stats, jnp.float32)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_stats), loss

    return jax.jit(train_step, donate_argnums=(0,))


def timed(step, iters=30):
    s, loss = step(fresh_state(), batch, jax.random.PRNGKey(0))
    for _ in range(3):
        s, loss = step(s, batch, jax.random.PRNGKey(0))
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, loss = step(s, batch, jax.random.PRNGKey(0))
    float(loss)
    return (time.perf_counter() - t0) / iters * 1000


for dtype_name, dtype in (("bf16", jnp.bfloat16),):
    for ghost in (1, 2, 8):
        ms = timed(make_step(ghost, dtype))
        tag = "global BN" if ghost == 1 else f"ghost BN G={ghost}"
        print(f"{dtype_name} {tag:14s} {ms:7.2f} ms/step "
              f"({B * 1000 / ms:5.0f} samples/s)", flush=True)
