from fast_neural_style_transfer_tpu.train.schedule import (
    LossWeightSchedule,
    cosine_lr_schedule,
)
from fast_neural_style_transfer_tpu.train.state import TrainState, create_train_state
from fast_neural_style_transfer_tpu.train.step import make_train_step
from fast_neural_style_transfer_tpu.train.loop import TrainConfig, train_style_transfer
from fast_neural_style_transfer_tpu.train.adain import (
    AdaINTrainConfig,
    make_adain_train_step,
    train_adain,
)

__all__ = [
    "LossWeightSchedule",
    "cosine_lr_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "TrainConfig",
    "train_style_transfer",
    "AdaINTrainConfig",
    "make_adain_train_step",
    "train_adain",
]
