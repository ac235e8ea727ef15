"""Orbax checkpointing with the reference's semantics: periodic epoch
checkpoints plus a process-agnostic SIGTERM checkpoint for preemption-safe
resume (reference ``src/pipeline/logger.py:158-206``,
``src/utils/train_utils.py:8-37``)."""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _state_payload(state):
    return {
        "step": np.asarray(state.step),
        "epoch": np.asarray(state.epoch),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }


def save_checkpoint(path: str, state) -> str:
    """Save a TrainState to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _state_payload(state), force=True)
    return path


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState template (shapes/dtypes from the
    template; counters from the checkpoint)."""
    ckptr = ocp.PyTreeCheckpointer()
    template = _state_payload(state)
    payload = ckptr.restore(os.path.abspath(path), item=template)
    return state.replace(
        step=int(payload["step"]),
        epoch=int(payload["epoch"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
    )


def restore_variables(path: str, state):
    """Restore params/batch_stats/counters into ``state``, keeping its
    opt_state. For inference-side consumers (``bin/infer.py``) whose
    template optimizer (e.g. ``optax.identity``) does not match the
    trainer's optimizer tree saved in the checkpoint — a full
    :func:`restore_checkpoint` would fail on the opt_state structure."""
    payload = load_checkpoint_tree(os.path.abspath(path))
    return state.replace(
        step=int(payload["step"]),
        epoch=int(payload["epoch"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
    )


def load_checkpoint_tree(path: str) -> dict:
    """Restore the raw checkpoint pytree (params/batch_stats/... as plain
    dicts) without needing a matching TrainState template — for weight
    grafting and inspection."""
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Most recent ``ckpt_e{N}`` directory under ``ckpt_dir``."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_e = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"ckpt_e(\d+)", name)
        if m and int(m.group(1)) > best_e:
            best, best_e = os.path.join(ckpt_dir, name), int(m.group(1))
    return best
