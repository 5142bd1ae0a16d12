from pulpo_tpu.train.step import TrainState, create_train_state, make_train_step, make_eval_step  # noqa: F401
from pulpo_tpu.train.loop import Trainer  # noqa: F401
