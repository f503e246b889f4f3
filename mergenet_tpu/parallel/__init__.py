from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   data_axis_for_batch)
from .train import (TrainState, make_optimizer, multistep_lr,
                    build_train_step, build_train_step_compact,
                    build_eval_step, create_train_state)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "data_axis_for_batch",
    "TrainState", "make_optimizer", "multistep_lr",
    "build_train_step", "build_train_step_compact", "build_eval_step",
    "create_train_state",
]
