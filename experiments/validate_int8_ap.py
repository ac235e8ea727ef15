"""Accuracy gate for the v3 serving paths on a TRAINED detector (real TPU).

Trains a quick DR-SPAAM on synthetic DROW data (same recipe as bin/demo.py
stage 1), then scores detection AP through three streaming paths:
f32 module (reference parity), v3 bf16, v3 int8. The int8 path must stay
within epsilon of the f32 AP — this is the serving-accuracy gate behind
making int8 the default bench path.

Usage: PYTHONPATH=/root/repo python experiments/validate_int8_ap.py
"""
import json
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from planar_optical_flow_tpu.data import (
    write_synthetic_drow_split, DrowDetectionDataset, BatchLoader,
)
from planar_optical_flow_tpu.models import get_model
from planar_optical_flow_tpu.train import (
    create_train_state, make_optimizer, tasks,
)
from planar_optical_flow_tpu.eval import (
    DetectionEvalFrames, detection_ap,
)
from planar_optical_flow_tpu.infer.streaming import (
    make_stream_step, make_serve_step_v3,
)

CUTOUT_KW = dict(fixed=True, centered=True, window_width=1.0,
                 window_depth=0.5, num_cutout_pts=56, padding_val=29.99,
                 area_mode=True, gather_mode="matmul")


def ap_from_step(step, takes_variables, variables, frames, conf=0.3,
                 radius=0.5, batch_streams=16):
    t_total = len(frames)
    b = min(batch_streams, t_total)
    t_chunk = (t_total + b - 1) // b
    pad = b * t_chunk - t_total
    scans = np.concatenate(
        [frames.scans, np.full((pad, frames.scans.shape[1]), 29.99,
                               np.float32)]
    ).reshape(b, t_chunk, -1)
    carry = None
    triples = []
    for t in range(t_chunk):
        scan = jnp.asarray(scans[:, t])
        if takes_variables:
            carry, out = step(variables, carry, scan)
        else:
            carry, out = step(carry, scan)
        keep = np.asarray(out["det_keep"])
        xys = np.asarray(out["det_xys"])
        cconf = np.asarray(out["det_cls"])[..., 0]
        for s in range(b):
            i = s * t_chunk + t
            if i >= t_total:
                continue
            k = keep[s]
            sel = cconf[s][k] >= conf
            triples.append((i, xys[s][k][sel], cconf[s][k][sel],
                            frames.gt[i]))
    triples.sort(key=lambda f: f[0])
    triples = [(x, c, g) for _, x, c, g in triples]
    pr, rc, _ = detection_ap.precision_recall_curve(triples, radius)
    return detection_ap.average_precision(pr, rc)


def train_small_detector(seed=7, epochs=None):
    """Train a quick DR-SPAAM on synthetic DROW data (the bin/demo.py
    stage-1 recipe — also used by ``probe_calib_quality.py``). Returns
    ``(model, variables, frames)`` with frames a ``DetectionEvalFrames``
    over the training sequences."""
    d = tempfile.mkdtemp()
    write_synthetic_drow_split(d, "train", num_sequences=2, num_frames=120,
                               num_people=3, seed=seed)
    ds = DrowDetectionDataset(d, "train", num_scans=2, pedestrian_only=True)
    loader = BatchLoader(ds, batch_size=8, seed=0)

    model = get_model({"type": "dr-spaam", "window_size": 11,
                       "pedestrian_only": True})
    task = tasks.DetectionTask(cutout_kwargs=CUTOUT_KW, pedestrian_only=True)
    tx = make_optimizer(
        {"scheduler_kwargs": {"epoch0": 0, "lr0": 1e-3, "epoch1": 20,
                              "lr1": 1e-3}},
        steps_per_epoch=len(loader),
    )
    x = jnp.zeros((8, 450, 3, 56))
    state = create_train_state(model, (x,), tx, init_kwargs={"train": False})

    @jax.jit
    def train_step(state, batch, rng_key):
        def loss_fn(params):
            loss, tb, _, stats = task.loss(
                state.apply_fn,
                {"params": params, "batch_stats": state.batch_stats},
                batch, True, rng_key,
            )
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, stats), loss

    key = jax.random.PRNGKey(0)
    if epochs is None:
        epochs = int(os.environ.get("EPOCHS", "3"))
    for epoch in range(epochs):
        last = None
        for batch in loader:
            key, sk = jax.random.split(key)
            state, loss = train_step(state, batch, sk)
            last = float(loss)
        print(f"epoch {epoch}: loss {last:.4f}", flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    frames = DetectionEvalFrames.from_dataset(ds)
    return model, variables, frames


def main():
    model, variables, frames = train_small_detector()

    ref = make_stream_step(model, CUTOUT_KW, with_nms=True,
                           donate_template=False)
    ap_f32 = ap_from_step(ref, True, variables, frames)
    print(json.dumps({"path": "f32 module", "ap": round(ap_f32, 4)}),
          flush=True)

    calib = frames.scans[:8]
    # bf16 at tile=64: the f32-intermediate bf16 kernel is over the scoped
    # VMEM limit at tile=128; the int8 kernels fit
    for prec, tile in (("bf16", 64), ("int8", 128), ("int8c", 128)):
        step = make_serve_step_v3(model, variables, CUTOUT_KW,
                                  calib_scans=calib, precision=prec,
                                  tile=tile)
        ap = ap_from_step(step, False, variables, frames)
        print(json.dumps({"path": f"v3 {prec}", "ap": round(ap, 4)}),
              flush=True)
        if prec.startswith("int8"):
            assert ap > ap_f32 - 0.02, (prec, ap, ap_f32)
    print("ACCURACY GATE PASSED")


if __name__ == "__main__":
    main()
