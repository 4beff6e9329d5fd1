from .config import TrainConfig
from .train_step import (TrainState, create_train_state, make_epoch_runner,
                         make_train_step, build_luts)
from .train_loop import train
