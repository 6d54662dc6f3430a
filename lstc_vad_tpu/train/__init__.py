from .optim import adagrad_torch, make_optimizer  # noqa: F401
from .state import TrainState, create_train_state  # noqa: F401
from .steps import make_ltn_train_step, make_stn_train_step  # noqa: F401
