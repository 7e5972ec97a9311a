"""Learning-rate range test (weight-decay / LR search aid).

The reference carries the scaffolding for this (the ``lr_range_test.csv``
schema in ``scripts/csv_handler.py:8-12``, the commented sweep in
``trainer.py:303-306`` and the plot in ``trainer.py:429-446``); here it is
a working capability: run ``n_steps`` training steps with the LR swept
log-uniformly from ``min_lr`` to ``max_lr``, recording train loss (and
periodic val loss) per step, then render the EWM-smoothed plot.
"""

from __future__ import annotations

import math
import os
import jax.numpy as jnp

from ..metrics.csv_logger import CSVHandler
from .inference import validation_loss


def lr_range_test(
    state,
    train_step,
    batches,
    log_save_path: str,
    min_lr: float = 1e-7,
    max_lr: float = 1e-2,
    n_steps: int = 100,
    eval_step=None,
    val_loader=None,
    val_every: int = 20,
    plot: bool = True,
):
    """Sweep the LR over a stream of batches; returns (lrs, losses)."""
    os.makedirs(log_save_path, exist_ok=True)
    csv_handler = CSVHandler(log_save_path)
    lrs, losses = [], []
    val_loss = float("nan")
    it = iter(batches)
    ratio = math.log(max_lr / min_lr)
    for step in range(n_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(batches)
            batch = next(it)
        lr = min_lr * math.exp(ratio * step / max(1, n_steps - 1))
        state, loss = train_step(
            state, jnp.asarray(batch["image"]), jnp.asarray(batch["label"]),
            jnp.asarray(lr, jnp.float32),
        )
        loss_f = float(loss)
        if eval_step is not None and val_loader is not None and (
            step % val_every == val_every - 1
        ):
            val_loss = validation_loss(eval_step, state.params, val_loader,
                                       bool_break=True, n_batches=5)
        csv_handler.csv_writer.writerow([step, lr, loss_f, val_loss])
        lrs.append(lr)
        losses.append(loss_f)
    csv_handler.close_files()
    if plot:
        try:
            from ..viz.plots import plot_lr_range

            plot_lr_range(os.path.join(log_save_path, "lr_range_test.csv"),
                          log_save_path)
        except Exception:
            pass
    return lrs, losses
