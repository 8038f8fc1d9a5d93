from banet_tpu.train.losses import (  # noqa: F401
    loss_rotation,
    loss_translation,
    loss_translation_angular,
    loss_flow,
    loss_depth_l1,
    total_loss,
)
from banet_tpu.train.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    synthetic_batch,
)
