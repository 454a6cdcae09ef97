from .optim import make_optimizer  # noqa: F401
from .step import TrainState, make_train_step  # noqa: F401
