from .checkpoint import Checkpointer, CheckpointMismatchError
from .engine import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_preprocess,
    make_train_step,
    test_model,
    train_model,
    validate_model,
)
from .metrics import confusion_matrices, per_fret_accuracy, row_normalize
from .schedules import (
    CosineAnnealingWarmRestarts,
    ReduceLROnPlateau,
    make_scheduler,
)

__all__ = [
    "Checkpointer",
    "CheckpointMismatchError",
    "CosineAnnealingWarmRestarts",
    "ReduceLROnPlateau",
    "TrainState",
    "confusion_matrices",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_preprocess",
    "make_scheduler",
    "make_train_step",
    "per_fret_accuracy",
    "row_normalize",
    "test_model",
    "train_model",
    "validate_model",
]
