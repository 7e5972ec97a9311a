from .schedule import CosineWarmupSchedule  # noqa: F401
from .optim import build_optimizer, decay_mask_fn  # noqa: F401
from .state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_predict_step,
    make_train_step,
)
