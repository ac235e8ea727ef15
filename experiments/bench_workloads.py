"""Train-step and inference throughput for the two non-DR-SPAAM workloads:

* FlowUNet (reference ``Prototype``, ``src/depracted/model/prototype.py:34``)
  at the ``configs/prototype_flow.yaml`` working point (batch 8 scan pairs,
  450 pts) plus a saturating inference batch.
* BoundingBoxRegressor (reference ``src/model/box_regression.py:126``) at
  the ``configs/train_3d_box_regression.yaml`` working point (batch 256
  segments of 256 pts, input_dim 4, target_dim 5).

The reference publishes no numbers for either; these establish the repo's
own baselines (BASELINE.md). Run:
PYTHONPATH=/root/.axon_site:/root/repo python experiments/bench_workloads.py
"""
import json
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import create_train_state, make_optimizer, tasks
from planar_optical_flow_tpu.train.trainer import Trainer
from planar_optical_flow_tpu.utils.logger import RunLogger


def time_train(model, task, batch, example_inputs, compute_dtype=None,
               iters=30):
    tx = make_optimizer({"scheduler_kwargs": {}}, steps_per_epoch=100)
    state = create_train_state(model, example_inputs, tx,
                               init_kwargs={"train": False})
    with tempfile.TemporaryDirectory() as td:
        logger = RunLogger({"log_dir": td, "tag": "bench"})
        cfg = {"epoch": 1, "ckpt_interval": 1000}
        if compute_dtype:
            cfg["compute_dtype"] = compute_dtype
        tr = Trainer(logger, cfg, task, install_signal_handlers=False)
        tr._build_steps(state)
        key = jax.random.PRNGKey(0)
        state2, _ = tr._train_step(state, batch, key)
        for _ in range(3):
            state2, tb = tr._train_step(state2, batch, key)
        float(tb["loss"])  # hard sync (lazy block_until_ready backend)
        t0 = time.perf_counter()
        for _ in range(iters):
            state2, tb = tr._train_step(state2, batch, key)
        float(tb["loss"])
        return (time.perf_counter() - t0) / iters * 1000


def time_infer(apply_fn, variables, args, iters=50, dtype=None):
    if dtype is not None:
        from planar_optical_flow_tpu.infer.streaming import cast_variables
        variables = cast_variables(variables, dtype)
        args = tuple(a.astype(dtype) for a in args)
    fn = jax.jit(lambda v, *a: apply_fn(v, *a, train=False))
    out = fn(variables, *args)
    for _ in range(3):
        out = fn(variables, *args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, *args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1000


def bench_flow_unet():
    rng = np.random.default_rng(0)
    model = get_model({"type": "flow_unet"})
    B, P = 8, 450
    pair = rng.normal(size=(B, 2, P, 2)).astype(np.float32)
    batch = {
        "scan_pair": jnp.asarray(pair),
        "flow_target": jnp.asarray(
            rng.normal(size=(B, P, 2)).astype(np.float32) * 0.1),
    }
    x0 = jnp.zeros((1, P, 2))
    task = tasks.FlowUNetTask()
    for cd in (None, "bfloat16"):
        dt = time_train(model, task, batch, (x0, x0), compute_dtype=cd)
        print(json.dumps({
            "workload": "flow_unet_train", "batch": B,
            "compute_dtype": cd or "float32",
            "ms_per_step": round(dt, 2),
            "samples_per_sec": round(B * 1000 / dt, 1)}), flush=True)

    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
    for Bi in (8, 256, 1024):
        s1 = jnp.asarray(rng.normal(size=(Bi, P, 2)).astype(np.float32))
        s2 = jnp.asarray(rng.normal(size=(Bi, P, 2)).astype(np.float32))
        for dtype, name in ((None, "float32"), (jnp.bfloat16, "bfloat16")):
            dt = time_infer(model.apply, variables, (s1, s2), dtype=dtype)
            print(json.dumps({
                "workload": "flow_unet_infer", "batch": Bi, "dtype": name,
                "ms_per_call": round(dt, 2),
                "scan_pairs_per_sec": round(Bi * 1000 / dt, 1)}), flush=True)


def bench_box_regression():
    rng = np.random.default_rng(0)
    model = get_model({"type": "box_reg", "input_dim": 4, "target_dim": 5,
                       "dropout": 0.3})
    B, N = 256, 256
    batch = {
        "input": jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32)),
        "target": jnp.asarray(rng.normal(size=(B, 5)).astype(np.float32)),
    }
    x0 = jnp.zeros((1, N, 4))
    task = tasks.BoxRegressionTask(is_3d=True)
    for cd in (None, "bfloat16"):
        dt = time_train(model, task, batch, (x0,), compute_dtype=cd)
        print(json.dumps({
            "workload": "box_reg_train", "batch": B,
            "compute_dtype": cd or "float32",
            "ms_per_step": round(dt, 2),
            "samples_per_sec": round(B * 1000 / dt, 1)}), flush=True)

    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    for Bi in (256, 4096):
        x = jnp.asarray(rng.normal(size=(Bi, N, 4)).astype(np.float32))
        for dtype, name in ((None, "float32"), (jnp.bfloat16, "bfloat16")):
            dt = time_infer(model.apply, variables, (x,), dtype=dtype)
            print(json.dumps({
                "workload": "box_reg_infer", "batch": Bi, "dtype": name,
                "ms_per_call": round(dt, 2),
                "segments_per_sec": round(Bi * 1000 / dt, 1)}), flush=True)


if __name__ == "__main__":
    bench_flow_unet()
    bench_box_regression()
