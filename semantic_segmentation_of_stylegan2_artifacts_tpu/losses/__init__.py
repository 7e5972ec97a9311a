from .losses import (  # noqa: F401
    DynamicLoss,
    bce_with_logits,
    dynamic_loss,
    focal_tversky_loss,
    symmetric_unified_focal_loss,
    tversky_index,
    tversky_loss,
)
