"""Train state + jitted train/eval steps (donated buffers, bf16 policy).

The reference's eager per-batch loop (``trainer.py:295-336``: H2D copy ->
fp16 autocast forward -> DynamicLoss -> GradScaler backward -> AdamW) maps
to one jitted, donated ``train_step``: uint8 batches are normalized on
device, the forward runs under the model's bf16 compute policy (no loss
scaling needed — bf16 has fp32 range), the loss/grad/update all fuse into
a single XLA program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..losses import dynamic_loss
from .optim import set_learning_rate


class TrainState(train_state.TrainState):
    """Adds the dropout PRNG base key to flax's TrainState."""

    dropout_rng: jax.Array = None


def create_train_state(
    model,
    config,
    rng: jax.Array,
    sample_input: jax.Array,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    from .optim import build_optimizer

    params_rng, dropout_rng = jax.random.split(rng)
    # jit the init: eager init dispatches thousands of tiny ops (crippling
    # over a remote-TPU tunnel); compiled it is one program.
    init_fn = jax.jit(lambda r, x: model.init({"params": r}, x, True))
    variables = init_fn(params_rng, sample_input)
    if tx is None:
        tx = build_optimizer(config, variables["params"])
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        dropout_rng=dropout_rng,
    )


def normalize_images(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC -> [0,1] float on device (reference normalizes on host,
    ``dataset.py:61``; moved on-device to shrink H2D traffic 4x)."""
    return images_u8.astype(dtype) / jnp.asarray(255.0, dtype)


def encode_labels(label_u8: jax.Array, num_classes: int) -> jax.Array:
    """uint8 label maps -> loss targets.

    ``num_classes == 1``: binary float map (B, H, W) (reference contract,
    values {0,1} or {0,255} normalized downstream).
    ``num_classes > 1``: labels hold integer class ids 0..C (0 =
    background); one-hot encode classes 1..C -> (B, H, W, C) multi-label
    targets on device.
    """
    if num_classes <= 1:
        return label_u8.astype(jnp.float32)
    return jax.nn.one_hot(label_u8.astype(jnp.int32), num_classes + 1,
                          dtype=jnp.float32)[..., 1:]


def _loss_for(num_classes: int):
    if num_classes <= 1:
        return dynamic_loss
    from .. import losses as _losses  # avoid cycle at import time
    from ..losses.multiclass import dynamic_loss_multiclass

    return dynamic_loss_multiclass


def make_train_step(
    model,
    loss_alpha: float,
    loss_beta: float,
    loss_mix: float,
    donate: bool = True,
    accumulation_steps: int = 1,
    num_classes: int = 1,
) -> Callable:
    """Build the jitted train step: (state, image_u8, label_u8, lr) -> ...

    lr rides in as a scalar operand (no recompilation per epoch); the
    dropout key folds in the step counter so every batch draws fresh
    stochastic-depth/dropout noise deterministically.

    ``accumulation_steps > 1`` splits the batch into micro-batches and
    averages gradients via ``lax.scan`` before one optimizer update —
    the reference's ``TRAIN.ACCUMULATION_STEPS`` knob, which its trainer
    never wired up (SURVEY §2.9), made functional.

    ``num_classes > 1`` switches to the multi-label Dynamic loss with
    integer class-id label maps (see :func:`encode_labels`).
    """
    loss_impl = _loss_for(num_classes)

    def grads_of(params, images, labels, rng):
        def loss_fn(params):
            logits = model.apply(
                {"params": params}, images, False, rngs={"dropout": rng}
            )
            return loss_impl(logits, labels, loss_alpha, loss_beta,
                             loss_mix)

        return jax.value_and_grad(loss_fn)(params)

    def step_fn(state: TrainState, image_u8, label_u8, lr):
        images = normalize_images(image_u8, model.dtype)
        labels = encode_labels(label_u8, num_classes)
        rng = jax.random.fold_in(state.dropout_rng, state.step)

        if accumulation_steps <= 1:
            loss, grads = grads_of(state.params, images, labels, rng)
        else:
            b = images.shape[0]
            if b % accumulation_steps:
                raise ValueError(
                    f"batch {b} not divisible by accumulation_steps "
                    f"{accumulation_steps}"
                )
            mb = b // accumulation_steps
            images_s = images.reshape(accumulation_steps, mb, *images.shape[1:])
            labels_s = labels.reshape(accumulation_steps, mb, *labels.shape[1:])

            def scan_body(carry, xs):
                loss_acc, grad_acc = carry
                img, lbl, i = xs
                loss_i, grads_i = grads_of(
                    state.params, img, lbl, jax.random.fold_in(rng, i)
                )
                return (
                    loss_acc + loss_i,
                    jax.tree.map(jnp.add, grad_acc, grads_i),
                ), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                scan_body, (jnp.zeros((), jnp.float32), zero_grads),
                (images_s, labels_s, jnp.arange(accumulation_steps)),
            )
            loss = loss_sum / accumulation_steps
            grads = jax.tree.map(lambda g: g / accumulation_steps, grad_sum)

        opt_state = set_learning_rate(state.opt_state, lr)
        updates, new_opt_state = state.tx.update(
            grads, opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, loss

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model, loss_alpha: float, loss_beta: float, loss_mix: float,
    num_classes: int = 1, per_sample: bool = False,
) -> Callable:
    """Jitted eval: (params, image_u8, label_u8) -> (probs fp32, loss).

    probs: (B, H, W) sigmoid over the single logit channel, or
    (B, H, W, C) per-class sigmoids when ``num_classes > 1``.
    ``per_sample=True`` returns a (B,) loss vector instead of the batch
    mean (used by the batched validation pass for exact per-case losses).
    """
    loss_impl = _loss_for(num_classes)
    if per_sample and num_classes <= 1:
        from ..losses.losses import dynamic_loss_per_sample

        loss_impl = dynamic_loss_per_sample
    elif per_sample:
        from ..losses.multiclass import dynamic_loss_multiclass_per_sample

        loss_impl = dynamic_loss_multiclass_per_sample

    def step_fn(params, image_u8, label_u8):
        images = normalize_images(image_u8, model.dtype)
        labels = encode_labels(label_u8, num_classes)
        logits = model.apply({"params": params}, images, True)
        loss = loss_impl(logits, labels, loss_alpha, loss_beta, loss_mix)
        if num_classes <= 1:
            probs = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
        else:
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return probs, loss

    return jax.jit(step_fn)


def make_predict_step(model, num_classes: int = 1) -> Callable:
    """Jitted label-free inference: (params, image_u8) -> probs fp32.

    ``num_classes > 1`` keeps all class channels: ``(B, H, W, C)``
    per-class sigmoids (multi-label semantics, ``losses/multiclass.py``).
    """

    def step_fn(params, image_u8):
        images = normalize_images(image_u8, model.dtype)
        logits = model.apply({"params": params}, images, True)
        if num_classes <= 1:
            return jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    return jax.jit(step_fn)

