"""Validation metrics as jitted device reductions + host aggregation.

Replicates the metric contract of the reference
(reference ``scripts/validation_functions.py:37-309``):

* per case (batch-1): sigmoid probs; ``pred_bin = p > sig_threshold``;
  ``gt = label > 0``,
* real images (empty GT): binary + soft confusion matrices, accuracy,
  ``FPR = fp / (fp + tn)``,
* fake images: binary dice/recall/precision/jaccard (medpy definitions,
  computed from the confusion counts), F1 (with the reference's 1e-8
  smoothing), accuracy, soft dice ``(2Σpg+ε)/(Σp²+Σg²+ε)`` and soft IoU,
* aggregation to means over real / fake / all and
  ``Score = mean_soft_dice − 10·mean_FPR``.

TPU-first: the per-case reductions run fused on device in one jit; only
eight scalars cross to the host per case.  A val split with no real
images makes ``Score`` undefined in the reference (NameError at
``validation_functions.py:180``); here that raises a clear ValueError.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CaseMetrics:
    """Host-side scalars for one validation case."""

    case_name: str
    is_real: bool
    val_loss: float
    tp: float
    fp: float
    fn: float
    tn: float
    soft_tp: float
    soft_fp: float
    soft_fn: float
    soft_tn: float
    accuracy: float
    fpr: float
    bin_dice: float
    bin_recall: float
    bin_precision: float
    bin_iou: float
    bin_f1: float
    soft_dice: float
    soft_iou: float


def case_metrics(
    probs: jax.Array, label: jax.Array, sig_threshold: float
) -> Dict[str, jax.Array]:
    """Fused per-case reductions. ``probs``/``label``: (H, W) float.

    Returns all scalars for both the real and the fake branch; the host
    selects by ``is_real``.
    """
    p = probs.astype(jnp.float32)
    gt = (label > 0).astype(jnp.float32)
    pb = (p > sig_threshold).astype(jnp.float32)

    tp = jnp.sum(pb * gt)
    fp = jnp.sum(pb * (1.0 - gt))
    fn = jnp.sum((1.0 - pb) * gt)
    tn = jnp.sum((1.0 - pb) * (1.0 - gt))

    soft_tp = jnp.sum(p * gt)
    soft_fp = jnp.sum(p * (1.0 - gt))
    soft_fn = jnp.sum((1.0 - p) * gt)
    soft_tn = jnp.sum((1.0 - p) * (1.0 - gt))

    total = tp + fp + fn + tn
    accuracy = (tp + tn) / total
    fpr = fp / jnp.maximum(fp + tn, 1e-38)

    # medpy.binary definitions on binary masks (0-guarded like medpy)
    bin_dice = jnp.where(2 * tp + fp + fn > 0, 2 * tp / (2 * tp + fp + fn), 0.0)
    bin_recall = jnp.where(tp + fn > 0, tp / (tp + fn), 0.0)
    bin_precision = jnp.where(tp + fp > 0, tp / (tp + fp), 0.0)
    bin_iou = jnp.where(tp + fp + fn > 0, tp / (tp + fp + fn), 0.0)
    smooth = 1e-8
    bin_f1 = 2 * bin_precision * bin_recall / (bin_precision + bin_recall + smooth)

    intersection = soft_tp
    sum_p2 = jnp.sum(p * p)
    sum_g2 = jnp.sum(gt * gt)
    sum_p = jnp.sum(p)
    sum_g = jnp.sum(gt)
    soft_dice = (2.0 * intersection + smooth) / (sum_p2 + sum_g2 + smooth)
    soft_iou = (intersection + smooth) / (sum_p + sum_g - intersection + smooth)

    return dict(
        tp=tp, fp=fp, fn=fn, tn=tn,
        soft_tp=soft_tp, soft_fp=soft_fp, soft_fn=soft_fn, soft_tn=soft_tn,
        accuracy=accuracy, fpr=fpr,
        bin_dice=bin_dice, bin_recall=bin_recall, bin_precision=bin_precision,
        bin_iou=bin_iou, bin_f1=bin_f1,
        soft_dice=soft_dice, soft_iou=soft_iou,
        is_real=jnp.sum(gt) == 0,
    )


compute_case_metrics_jit = jax.jit(case_metrics, static_argnames=("sig_threshold",))


def to_case_metrics(
    case_name: str, device_metrics: Dict[str, jax.Array], val_loss: float
) -> CaseMetrics:
    m = {k: float(v) for k, v in device_metrics.items()}
    return CaseMetrics(
        case_name=case_name,
        is_real=bool(m["is_real"]),
        val_loss=float(val_loss),
        tp=m["tp"], fp=m["fp"], fn=m["fn"], tn=m["tn"],
        soft_tp=m["soft_tp"], soft_fp=m["soft_fp"],
        soft_fn=m["soft_fn"], soft_tn=m["soft_tn"],
        accuracy=m["accuracy"], fpr=m["fpr"],
        bin_dice=m["bin_dice"], bin_recall=m["bin_recall"],
        bin_precision=m["bin_precision"], bin_iou=m["bin_iou"],
        bin_f1=m["bin_f1"], soft_dice=m["soft_dice"], soft_iou=m["soft_iou"],
    )


@dataclasses.dataclass
class EpochSummary:
    """Aggregated means for one validation epoch (the CSV row contents)."""

    epoch: int
    mean_soft_dice: float
    mean_fpr: float
    score: float
    mean_accuracy: float
    mean_val_loss: float
    mean_train_loss: float
    mean_conf_bin: List[float]
    mean_conf_soft: List[float]
    # real split
    n_real: int
    mean_accuracy_real: float = float("nan")
    mean_val_loss_real: float = float("nan")
    mean_conf_bin_real: Optional[List[float]] = None
    mean_conf_soft_real: Optional[List[float]] = None
    # fake split
    n_fake: int = 0
    mean_accuracy_fake: float = float("nan")
    mean_val_loss_fake: float = float("nan")
    mean_conf_bin_fake: Optional[List[float]] = None
    mean_conf_soft_fake: Optional[List[float]] = None
    mean_bin_accuracy: float = float("nan")
    mean_bin_recall: float = float("nan")
    mean_bin_precision: float = float("nan")
    mean_bin_iou: float = float("nan")
    mean_bin_dice: float = float("nan")
    mean_bin_f1: float = float("nan")
    mean_soft_iou: float = float("nan")


class MetricsAggregator:
    """Collects :class:`CaseMetrics` and produces the epoch summary.

    Aggregation semantics match ``validation_functions.py:150-211``:
    fake-only means for the dice family; real-only FPR; combined
    accuracy/val-loss/confusions; ``Score = soft_dice − 10·FPR``.
    """

    def __init__(self):
        self.cases: List[CaseMetrics] = []

    def add(self, case: CaseMetrics) -> None:
        self.cases.append(case)

    def summarize(self, epoch: int, mean_train_loss: float = float("nan")
                  ) -> EpochSummary:
        if not self.cases:
            raise ValueError("Expected at least one validation case")
        real = [c for c in self.cases if c.is_real]
        fake = [c for c in self.cases if not c.is_real]
        if not fake:
            raise ValueError("No valid fake metrics to aggregate.")
        if not real:
            # reference crashes with NameError here
            # (validation_functions.py:162,180); made explicit:
            raise ValueError(
                "Validation split contains no real images: mean_FPR and "
                "Score are undefined (reference contract requires real "
                "images in val/test splits)."
            )

        def mean(xs):
            return float(np.mean(xs)) if len(xs) else float("nan")

        def conf(cs, soft=False):
            if soft:
                rows = [[c.soft_tp, c.soft_fp, c.soft_fn, c.soft_tn] for c in cs]
            else:
                rows = [[c.tp, c.fp, c.fn, c.tn] for c in cs]
            return [float(x) for x in np.mean(np.array(rows, dtype=float),
                                              axis=0)]

        mean_fpr = mean([c.fpr for c in real])
        mean_soft_dice = mean([c.soft_dice for c in fake])
        score = mean_soft_dice - 10.0 * mean_fpr

        return EpochSummary(
            epoch=epoch,
            mean_soft_dice=mean_soft_dice,
            mean_fpr=mean_fpr,
            score=score,
            mean_accuracy=mean([c.accuracy for c in self.cases]),
            mean_val_loss=mean([c.val_loss for c in self.cases]),
            mean_train_loss=mean_train_loss,
            mean_conf_bin=conf(self.cases),
            mean_conf_soft=conf(self.cases, soft=True),
            n_real=len(real),
            mean_accuracy_real=mean([c.accuracy for c in real]),
            mean_val_loss_real=mean([c.val_loss for c in real]),
            mean_conf_bin_real=conf(real),
            mean_conf_soft_real=conf(real, soft=True),
            n_fake=len(fake),
            mean_accuracy_fake=mean([c.accuracy for c in fake]),
            mean_val_loss_fake=mean([c.val_loss for c in fake]),
            mean_conf_bin_fake=conf(fake),
            mean_conf_soft_fake=conf(fake, soft=True),
            mean_bin_accuracy=mean([c.accuracy for c in fake]),
            mean_bin_recall=mean([c.bin_recall for c in fake]),
            mean_bin_precision=mean([c.bin_precision for c in fake]),
            mean_bin_iou=mean([c.bin_iou for c in fake]),
            mean_bin_dice=mean([c.bin_dice for c in fake]),
            mean_bin_f1=mean([c.bin_f1 for c in fake]),
            mean_soft_iou=mean([c.soft_iou for c in fake]),
        )


def case_metrics_multiclass(
    probs: jax.Array, label: jax.Array, sig_threshold: float
) -> Dict[str, jax.Array]:
    """Macro-averaged per-case metrics for multi-class (multi-label) eval.

    ``probs``: (H, W, C) per-class sigmoids; ``label``: (H, W) integer
    class ids (0 = background).  Per-class binary metrics are computed
    with the same formulas as :func:`case_metrics`; the dice family is
    macro-averaged over classes *present in the ground truth* (absent
    classes would read dice 0 and poison the mean), while FPR/accuracy
    average over all classes.  ``is_real`` = no foreground of any class.
    """
    c = probs.shape[-1]
    lab = label.astype(jnp.int32)
    per = [case_metrics(probs[..., k], (lab == (k + 1)).astype(jnp.float32),
                        sig_threshold) for k in range(c)]

    def stack(key):
        return jnp.stack([p[key] for p in per])

    present = jnp.stack([jnp.logical_not(p["is_real"]) for p in per])
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)

    def macro_fg(key):
        vals = stack(key)
        return jnp.sum(jnp.where(present, vals, 0.0)) / n_present

    out = {k: jnp.mean(stack(k)) for k in
           ("tp", "fp", "fn", "tn", "soft_tp", "soft_fp", "soft_fn",
            "soft_tn", "accuracy", "fpr")}
    for k in ("bin_dice", "bin_recall", "bin_precision", "bin_iou",
              "bin_f1", "soft_dice", "soft_iou"):
        out[k] = macro_fg(k)
    out["is_real"] = jnp.logical_not(jnp.any(present))
    return out


compute_case_metrics_multiclass_jit = jax.jit(
    case_metrics_multiclass, static_argnames=("sig_threshold",)
)


# Batched per-case metrics: one dispatch per batch instead of per case.
compute_case_metrics_batch_jit = jax.jit(
    jax.vmap(case_metrics, in_axes=(0, 0, None)),
    static_argnames=("sig_threshold",),
)
