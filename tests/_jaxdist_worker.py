"""Subprocess worker for the 2-process ``jax.distributed`` test.

Each process owns ONE virtual CPU device; ``initialize_distributed``
wires the Gloo-backed coordination service, after which the global mesh
spans both processes and the data-parallel gradient psum crosses the
process boundary. The worker trains the flow U-Net for one epoch through
the real product path — ``BatchLoader(process_index=...)`` per-process
batch slicing, ``Trainer`` with a mesh, ``shard_batch`` global-array
assembly — and prints the per-step loss series as JSON (process 0).

Invoked by ``tests/test_multiprocess.py``; runnable standalone:
``python tests/_jaxdist_worker.py <pid> <nproc> <port> <data_root>
[devices_per_process] [mesh_kind]`` — ``devices_per_process`` (default
1) gives every process that many virtual CPU devices, and ``mesh_kind``
"hybrid" builds the ICI x DCN mesh ``{dcn: nproc, data:
devices_per_process}`` (dp across the process boundary = DCN, dp within
each process's devices = ICI) instead of the flat all-``data`` mesh.
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, root = sys.argv[3], sys.argv[4]
    devper = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    mesh_kind = sys.argv[6] if len(sys.argv) > 6 else "flat"

    if pid < 0:
        # single-process comparator: same global device count and
        # data-parallel extent, no coordination service (pid sentinel -1)
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={nproc * devper}")
        import jax

        jax.config.update("jax_platforms", "cpu")
        print("LOSSES " + json.dumps(
            train(root, 0, 1, log_tag="single")), flush=True)
        return

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devper}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from planar_optical_flow_tpu.parallel import initialize_distributed

    initialize_distributed(coordinator=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * devper
    assert len(jax.local_devices()) == devper

    losses = train(root, pid, nproc, mesh_kind=mesh_kind)
    if pid == 0:
        print("LOSSES " + json.dumps(losses), flush=True)


def train(root, pid, nproc, log_tag=None, mesh_kind="flat"):
    """One epoch of mesh-sharded flow U-Net training on the synthetic
    split under ``root``; returns the TRAIN_loss series. Shared with the
    single-process comparison run (nproc=1, full batches)."""
    import jax

    from planar_optical_flow_tpu.data import (BatchLoader,
                                              FlowScanPairDataset)
    from planar_optical_flow_tpu.models import get_model
    from planar_optical_flow_tpu.train import (Trainer, create_train_state,
                                               make_optimizer, tasks)
    from planar_optical_flow_tpu.parallel import (make_mesh,
                                                  make_mesh_from_config)
    from planar_optical_flow_tpu.utils import RunLogger

    ds = FlowScanPairDataset(root, "train")
    loader = BatchLoader(ds, batch_size=8, seed=0,
                         process_index=pid, process_count=nproc)
    model = get_model({"type": "flow_unet", "linear_head": True})
    tx = make_optimizer({"scheduler_kwargs": {}},
                        steps_per_epoch=len(loader))
    import numpy as np

    sample = ds[0]
    x = (np.asarray(sample["scan_pair"][0])[None],
         np.asarray(sample["scan_pair"][1])[None])
    state = create_train_state(model, x, tx,
                               init_kwargs={"train": False})

    logger = RunLogger({"log_dir": os.path.join(root, f"logs_p{pid}"),
                        "tag": log_tag or f"dist{nproc}"})
    recorded = []
    orig_add = logger.add_scalar

    def capture(key, value, step=None):
        if key == "TRAIN_loss":
            recorded.append(float(value))
        return orig_add(key, value, step)

    logger.add_scalar = capture
    trainer = Trainer(
        logger,
        {"epoch": 1, "ckpt_interval": 0, "eval_interval": 0,
         "grad_norm_clip": 1.0, "log_norms": False},
        tasks.FlowUNetTask(),
        mesh=(make_mesh_from_config(
            {"dcn": nproc, "data": len(jax.local_devices())})
            if mesh_kind == "hybrid" else make_mesh()),
        install_signal_handlers=False,
    )
    state, rc = trainer.train(state, loader)
    assert rc == 0
    return recorded


if __name__ == "__main__":
    main()
