from tpugan.train.state import TrainState  # noqa: F401
from tpugan.train.optim import adam_torch, rmsprop_torch, linear_decay_schedule  # noqa: F401
