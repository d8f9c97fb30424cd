from cobevt_tpu.train.state import TrainState, create_train_state
from cobevt_tpu.train.optim import (
    make_optimizer,
    cosine_warmup_schedule,
    onecycle_schedule,
)
from cobevt_tpu.train.step import make_train_step, make_eval_step, place_state
