from .state import TrainState, create_train_state, TrainConfig
from .steps import make_train_step, make_eval_step
from .ema import ema_init, ema_update
