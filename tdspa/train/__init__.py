from tdspa.train.losses import compute_loss_2d, compute_loss_3d
from tdspa.train.schedule import create_learning_rate_schedule
from tdspa.train.state import TrainState, create_model_state, create_optimizer
from tdspa.train.step import (
    make_eval_step,
    make_grad_accum_step,
    make_train_step,
)
