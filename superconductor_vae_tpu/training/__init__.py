from .config import TrainConfig
from .train_step import TrainState, create_train_state, make_train_step, build_luts
from .train_loop import train
