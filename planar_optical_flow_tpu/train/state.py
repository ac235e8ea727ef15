"""Functional train state: one PyTree holding params, batch stats, optimizer
state and counters — the unit that is jitted over, checkpointed, and sharded.

Replaces the reference's implicit (model.state_dict, optimizer.state_dict,
epoch, step) checkpoint tuple (``src/pipeline/logger.py:171-177``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import flax
from flax import struct
import optax


@struct.dataclass
class TrainState:
    step: int
    epoch: int
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None
                else self.batch_stats
            ),
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, example_inputs, tx, rng=None,
                       init_kwargs=None) -> TrainState:
    """Initialize model variables and optimizer state.

    ``example_inputs`` is a tuple of positional args for ``model.init``.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, *example_inputs, **(init_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState(
        step=0,
        epoch=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def load_pretrained_subtree(state: TrainState, sub_name: str,
                            pretrained_params, pretrained_stats=None):
    """Graft pre-trained parameters into a named submodule of the state
    (the FlowDROW frozen-backbone workflow, cf. reference
    ``dr_spaam.py:294-298``)."""
    params = flax.core.unfreeze(state.params)
    params[sub_name] = pretrained_params
    batch_stats = state.batch_stats
    if pretrained_stats is not None and batch_stats is not None:
        batch_stats = flax.core.unfreeze(batch_stats)
        batch_stats[sub_name] = pretrained_stats
    return state.replace(params=params, batch_stats=batch_stats)
