"""Multi-class (multi-label) extensions of the segmentation losses/metrics.

The reference task is binary (one artifact class); this extends the same
Dynamic BCE+Tversky semantics to ``NUM_CLASSES > 1`` by treating each
class channel as an independent binary problem (multi-label), which is
the natural generalization of the reference's per-sample conditionality:
Tversky applies to (sample, class) pairs whose mask is non-empty
(BASELINE.json workload #5: "multi-class artifact seg").

Shapes: logits ``(B, H, W, C)``, targets ``(B, H, W, C)`` in {0,1} (or
{0,255}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import _normalize_target, bce_with_logits, tversky_index


def dynamic_loss_multiclass(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.4,
    beta: float = 0.6,
    tversky_bce_mix: float = 0.5,
    smooth: float = 1e-6,
) -> jax.Array:
    """Per-(sample, class) Dynamic loss, averaged over classes then batch."""
    if logits.ndim != 4 or targets.ndim != 4:
        raise ValueError(
            f"expected (B,H,W,C) logits/targets, got {logits.shape} / "
            f"{targets.shape}"
        )
    b, h, w, c = logits.shape
    targets = _normalize_target(targets)
    # (B, C, H*W): fold classes next to batch
    lf = logits.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    tf = targets.transpose(0, 3, 1, 2).reshape(b, c, h * w)

    bce = bce_with_logits(lf, tf, axis=2)  # (B, C)
    ti = tversky_index(jax.nn.sigmoid(lf.astype(jnp.float32)), tf, alpha,
                       beta, smooth, axis=2)
    tv = 1.0 - ti
    has_fg = jnp.sum(tf, axis=2) != 0.0
    mixed = (1.0 - tversky_bce_mix) * bce + tversky_bce_mix * tv
    per = jnp.where(has_fg, mixed, bce)  # (B, C)
    return jnp.mean(per)


def dynamic_loss_multiclass_per_sample(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.4,
    beta: float = 0.6,
    tversky_bce_mix: float = 0.5,
    smooth: float = 1e-6,
) -> jax.Array:
    """Class-averaged Dynamic loss per sample: ``(B,)``.

    Used by the batched validation pass so padded trailing batches
    (``EvalLoader(pad_to_batch=True)``) can drop the repeated tail before
    aggregation — a batch-mean scalar would double-weight the padding.
    """
    if logits.ndim != 4 or targets.ndim != 4:
        raise ValueError(
            f"expected (B,H,W,C) logits/targets, got {logits.shape} / "
            f"{targets.shape}"
        )
    b, h, w, c = logits.shape
    targets = _normalize_target(targets)
    lf = logits.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    tf = targets.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    bce = bce_with_logits(lf, tf, axis=2)
    ti = tversky_index(jax.nn.sigmoid(lf.astype(jnp.float32)), tf, alpha,
                       beta, smooth, axis=2)
    tv = 1.0 - ti
    has_fg = jnp.sum(tf, axis=2) != 0.0
    mixed = (1.0 - tversky_bce_mix) * bce + tversky_bce_mix * tv
    per = jnp.where(has_fg, mixed, bce)  # (B, C)
    return jnp.mean(per, axis=1)


def per_class_dice(
    probs: jax.Array, labels: jax.Array, sig_threshold: float = 0.5,
    smooth: float = 1e-8,
) -> jax.Array:
    """Soft dice per class for one case: probs/labels ``(H, W, C)`` ->
    ``(C,)``."""
    p = probs.astype(jnp.float32).reshape(-1, probs.shape[-1])
    g = (labels > 0).astype(jnp.float32).reshape(-1, labels.shape[-1])
    inter = jnp.sum(p * g, axis=0)
    return (2.0 * inter + smooth) / (
        jnp.sum(p * p, axis=0) + jnp.sum(g * g, axis=0) + smooth
    )


def macro_dice(probs: jax.Array, labels: jax.Array,
               sig_threshold: float = 0.5) -> jax.Array:
    """Mean soft dice over classes (macro average) for one case."""
    return jnp.mean(per_class_dice(probs, labels, sig_threshold))
