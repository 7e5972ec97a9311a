"""Learning-rate schedule replicating timm's ``CosineLRScheduler`` usage.

The reference constructs (reference ``trainer.py:154-169``):

    lr_epoch  = max(60, max_epoch)
    CosineLRScheduler(t_initial=lr_epoch - warmup_epochs, lr_min, warmup_lr_init,
                      warmup_t=warmup_epochs, cycle_limit=1, t_in_epochs=True,
                      warmup_prefix=WARMUP_PREFIX)

and steps it per epoch with ``lr_scheduler.step(epoch_num + 1)``
(``trainer.py:412``) — so epoch ``e`` trains at the scheduler's value for
``t = e``.  Semantics reproduced exactly, including the ``max(60, epochs)``
t_initial quirk and ``warmup_prefix`` handling:

* ``t < warmup_t``:   ``lr = warmup_lr + t * (base_lr - warmup_lr)/warmup_t``
* else, with prefix:  ``tt = t - warmup_t``; without: ``tt = t``;
  ``tt < t_initial``: ``lr = min_lr + 0.5*(base_lr-min_lr)*(1+cos(pi*tt/t_initial))``
  ``tt >= t_initial`` (cycle_limit=1): ``lr = min_lr``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class CosineWarmupSchedule:
    base_lr: float
    min_lr: float
    warmup_lr: float
    warmup_t: int
    t_initial: int
    warmup_prefix: bool = True

    @classmethod
    def from_config(cls, config, base_lr=None) -> "CosineWarmupSchedule":
        max_epoch = config.TRAIN.MAX_EPOCHS
        warmup = config.TRAIN.WARMUP_EPOCHS
        lr_epoch = max(60, max_epoch)  # reference trainer.py:155-158
        return cls(
            base_lr=base_lr if base_lr is not None else config.TRAIN.BASE_LR,
            min_lr=config.TRAIN.MIN_LR,
            warmup_lr=config.TRAIN.WARMUP_LR,
            warmup_t=warmup,
            t_initial=lr_epoch - warmup,
            warmup_prefix=bool(config.TRAIN.LR_SCHEDULER.WARMUP_PREFIX),
        )

    def lr_at_epoch(self, epoch: int) -> float:
        t = epoch
        if self.warmup_t > 0 and t < self.warmup_t:
            step = (self.base_lr - self.warmup_lr) / self.warmup_t
            return self.warmup_lr + t * step
        tt = t - self.warmup_t if self.warmup_prefix else t
        if self.t_initial <= 0:
            return self.min_lr
        if tt >= self.t_initial:
            return self.min_lr
        return self.min_lr + 0.5 * (self.base_lr - self.min_lr) * (
            1.0 + math.cos(math.pi * tt / self.t_initial)
        )
