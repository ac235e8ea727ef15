"""Training layer: functional train state, optax optimizers with the
reference's LR schedules, a preemption-safe trainer loop, and orbax
checkpointing."""

from planar_optical_flow_tpu.train.optim import (  # noqa: F401
    exp_decay_schedule,
    make_optimizer,
)
from planar_optical_flow_tpu.train.state import TrainState, create_train_state  # noqa: F401
from planar_optical_flow_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
)
from planar_optical_flow_tpu.train.trainer import Trainer  # noqa: F401
from planar_optical_flow_tpu.train import tasks  # noqa: F401
