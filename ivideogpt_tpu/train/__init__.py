from ivideogpt_tpu.train.optim import (  # noqa: F401
    make_lr_schedule,
    make_optimizer,
    TrainState,
)
