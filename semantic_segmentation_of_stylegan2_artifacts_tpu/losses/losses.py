"""Segmentation losses as fused, batch-vectorized XLA reductions.

Replicates the reference loss surface (reference ``loss/DynamicLoss.py``,
``loss/TverskyLoss.py`` and the deleted ``SymmetricUnifiedFocalLoss``
capability) without the per-sample Python loop: the Dynamic loss's
"Tversky only when the mask is non-empty" conditionality
(``DynamicLoss.py:100-106``) becomes a ``jnp.where`` over per-sample
reductions, so the whole batch is one fused kernel under ``jit``.

Shapes: logits ``(B, H, W)`` or ``(B, H, W, 1)``; targets likewise
(float {0,1} or uint8 {0,255} — normalized exactly like the reference:
``target > 127.5`` when max > 1, ``DynamicLoss.py:87-89``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten_per_sample(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


def _normalize_target(target: jax.Array) -> jax.Array:
    target = target.astype(jnp.float32)
    # reference: if max > 1, treat as 0..255 mask
    return jnp.where(jnp.max(target) > 1.0, (target > 127.5).astype(jnp.float32),
                     target)


def bce_with_logits(
    logits: jax.Array, targets: jax.Array, axis=None
) -> jax.Array:
    """Numerically-stable mean binary cross-entropy with logits.

    Matches ``torch.nn.BCEWithLogitsLoss`` (mean reduction):
    ``max(x,0) - x*y + log(1+exp(-|x|))``.
    """
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss, axis=axis)


def tversky_index(
    probs: jax.Array,
    targets: jax.Array,
    alpha: float,
    beta: float,
    smooth: float = 1e-6,
    axis=None,
) -> jax.Array:
    """``TI = (TP+s) / (TP + a*FP + b*FN + s)`` over the given axes."""
    p = probs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    tp = jnp.sum(p * t, axis=axis)
    fp = jnp.sum(p * (1.0 - t), axis=axis)
    fn = jnp.sum((1.0 - p) * t, axis=axis)
    return (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)


def tversky_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.7,
    beta: float = 0.3,
    smooth: float = 1e-6,
    axis=None,
) -> jax.Array:
    """``1 - TI`` on sigmoid probabilities (reference ``DynamicLoss.py:22-52``)."""
    return 1.0 - tversky_index(jax.nn.sigmoid(logits), targets, alpha, beta,
                               smooth, axis)


def focal_tversky_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.7,
    beta: float = 0.3,
    gamma: float = 1.1,
    smooth: float = 1e-6,
    axis=None,
) -> jax.Array:
    """``(1 - TI)**gamma`` (reference ``DynamicLoss.py:54-70``; unused by
    the reference trainer but part of the loss surface)."""
    return tversky_loss(logits, targets, alpha, beta, smooth, axis) ** gamma


def dynamic_loss_per_sample(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.4,
    beta: float = 0.6,
    tversky_bce_mix: float = 0.5,
    smooth: float = 1e-6,
) -> jax.Array:
    """Per-sample Dynamic losses, shape ``(B,)`` (no batch mean)."""
    if logits.ndim == 4 and logits.shape[-1] == 1:
        logits = logits[..., 0]
    if targets.ndim == 4 and targets.shape[-1] == 1:
        targets = targets[..., 0]
    targets = _normalize_target(targets)
    lf = _flatten_per_sample(logits)
    tf = _flatten_per_sample(targets)

    bce = bce_with_logits(lf, tf, axis=1)  # (B,)
    ti = tversky_index(jax.nn.sigmoid(lf.astype(jnp.float32)), tf, alpha, beta,
                       smooth, axis=1)
    tv = 1.0 - ti
    has_fg = jnp.sum(tf, axis=1) != 0.0
    mixed = (1.0 - tversky_bce_mix) * bce + tversky_bce_mix * tv
    return jnp.where(has_fg, mixed, bce)


def dynamic_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.4,
    beta: float = 0.6,
    tversky_bce_mix: float = 0.5,
    smooth: float = 1e-6,
) -> jax.Array:
    """The reference's DynamicLoss, batch-vectorized.

    Per sample i:
      * ``bce_i`` = mean BCE-with-logits
      * if ``sum(target_i) != 0``:
          ``loss_i = (1-mix)*bce_i + mix*(1 - TI_i)``
        else ``loss_i = bce_i``
    Returns the batch mean (reference ``DynamicLoss.py:82-111``).
    """
    return jnp.mean(
        dynamic_loss_per_sample(logits, targets, alpha, beta,
                                tversky_bce_mix, smooth)
    )


def symmetric_unified_focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    delta: float = 0.6,
    gamma: float = 0.5,
    weight: float = 0.5,
    smooth: float = 1e-6,
) -> jax.Array:
    """Symmetric Unified Focal loss (Yeung et al. 2021).

    The reference shipped this as a deleted module surviving only as
    ``loss/__pycache__/SymmetricUnifiedFocalLoss*.pyc`` with config knobs
    ``UF_LOSS_DELTA/GAMMA/WEIGTH`` (reference ``config.py:99-101``); the
    capability is reproduced from the published formulation:
    ``weight * L_msFL + (1-weight) * L_msFTL`` where both components are
    symmetric in foreground/background.
    """
    if logits.ndim == 4 and logits.shape[-1] == 1:
        logits = logits[..., 0]
    if targets.ndim == 4 and targets.shape[-1] == 1:
        targets = targets[..., 0]
    t = _normalize_target(targets)
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)

    # symmetric (modified) focal loss — per-pixel, then mean
    ce_fg = -t * jnp.log(p)
    ce_bg = -(1.0 - t) * jnp.log(1.0 - p)
    fl = delta * (1.0 - p) ** gamma * ce_fg + (1.0 - delta) * p**gamma * ce_bg
    fl = jnp.mean(fl)

    # symmetric focal Tversky loss — per-sample foreground/background TIs
    pf = _flatten_per_sample(p)
    tf2 = _flatten_per_sample(t)
    ti_fg = tversky_index(pf, tf2, 1.0 - delta, delta, smooth, axis=1)
    ti_bg = tversky_index(1.0 - pf, 1.0 - tf2, 1.0 - delta, delta, smooth, axis=1)
    ftl = jnp.mean((1.0 - ti_fg) ** (1.0 - gamma) + (1.0 - ti_bg) ** (1.0 - gamma))

    return weight * fl + (1.0 - weight) * ftl


class DynamicLoss:
    """Callable config-bound wrapper (API parity with the reference class)."""

    def __init__(
        self,
        roi_thresh: float = 0.04,
        alpha: float = 0.4,
        beta: float = 0.6,
        tversky_bce_mix: float = 0.5,
    ):
        self.roi_thresh = roi_thresh  # kept for signature parity; unused there too
        self.alpha = alpha
        self.beta = beta
        self.tversky_bce_mix = tversky_bce_mix

    def __call__(self, logits: jax.Array, targets: jax.Array) -> jax.Array:
        return dynamic_loss(
            logits, targets, self.alpha, self.beta, self.tversky_bce_mix
        )

    @classmethod
    def from_config(cls, config) -> "DynamicLoss":
        return cls(
            alpha=config.TRAIN.TVERSKY_LOSS_ALPHA,
            beta=config.TRAIN.TVERSKY_LOSS_BETA,
            tversky_bce_mix=config.TRAIN.LOSS_TVERSKY_BCE_MIX,
        )
