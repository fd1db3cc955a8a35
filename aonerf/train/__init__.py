"""Training: LR schedules, losses, jitted steps, loop."""

from aonerf.train.lr import log_lerp_lr  # noqa: F401
from aonerf.train.losses import (  # noqa: F401
    code_regularization,
    opacity_loss_bce,
    opacity_loss_mse,
    opacity_loss_autorf,
)
from aonerf.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_adam,
    make_vanilla_train_step,
    make_autodecoder_train_step,
    make_autodecoder_device_train_step,
    sample_ray_batch,
    sample_multi_batch,
)
