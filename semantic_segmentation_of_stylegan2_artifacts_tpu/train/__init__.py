from .schedule import CosineWarmupSchedule  # noqa: F401
from .optim import build_optimizer, decay_mask_fn, encoder_path  # noqa: F401
from .state import TrainState, create_train_state, train_step, eval_step  # noqa: F401
